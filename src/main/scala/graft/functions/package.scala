package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

package object functions {
  /** Float outputs are scaled to BIGINT (`round(x·10^digits)`) so the
    * driver's DuckDB hash-compare is exact across engines. Mirror in SQL:
    * `CAST(round(x * 10^digits, 0) AS BIGINT)`. */
  def scaled(c: Column, digits: Int): Column = {
    val factor = math.pow(10, digits)
    round(c * lit(factor)).cast(LongType)
  }

  /** Deterministic 60-bit positive hash shared with the DuckDB oracle:
    * Spark `conv(substr(md5(s),1,15),16,10)` == DuckDB
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)
}
