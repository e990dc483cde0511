package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

package object functions {
  /** Float outputs are scaled to BIGINT (`floor(x·10^digits + 0.5)`) so the
    * driver's DuckDB hash-compare is exact across engines. Mirror in SQL:
    * `CAST(floor(x * 10^digits + 0.5) AS BIGINT)`.
    *
    * floor(x+0.5), NOT round(): Spark round() is BigDecimal HALF_UP on the
    * double's shortest decimal form while DuckDB round() is C-library
    * rounding on the raw double — the two can disagree on values landing
    * near .5, and DuckDB's behavior has shifted across versions. floor over
    * an IEEE product is the same exact operation in every engine. */
  def scaled(c: Column, digits: Int): Column = {
    val factor = math.pow(10, digits)
    floor(c * lit(factor) + lit(0.5)).cast(LongType)
  }

  /** Deterministic 60-bit positive hash shared with the DuckDB oracle:
    * Spark `conv(substr(md5(s),1,15),16,10)` == DuckDB
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** The same 60-bit hash as a Spark-SQL text fragment (for selectExpr
    * sites); the DuckDB mirror is `queries.DuckDialect.hash`. */
  def md5Hash60Sql(v: String): String =
    s"CAST(conv(substring(md5($v), 1, 15), 16, 10) AS BIGINT)"

  // Integer-exact vector arithmetic fragments — the single source of truth
  // for the quantized training/search paths (KMeans.fitInt, Pq.*Int,
  // embedding_drift, specs). One scale/rounding/tie convention, spelled
  // once: a change here reaches every engine-vs-oracle pair at once.

  /** Spark-SQL fragment: quantize a float vector column to scaled-BIGINT
    * components — `scaled()` applied element-wise (`floor(x·10⁴ + 0.5)`).
    * DuckDB mirror: `queries.DuckDialect.quantizeVec`. */
  def quantizeVecSql(v: String): String =
    s"transform($v, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT))"

  /** Spark-SQL fragment: element-wise integer floor-mean of a `VecSumLong`
    * result. Spark `div` truncates toward zero; subtracting the pmod
    * remainder first yields exact floor division on negative sums too
    * (matching DuckDB `//`). */
  def floorMeanVecSql(sum: String, cnt: String): String =
    s"transform($sum, v -> (v - ((v % $cnt + $cnt) % $cnt)) div $cnt)"

  /** Spark-SQL fragment: exact integer squared L2 between two BIGINT
    * vectors (fixed left-to-right term order — engine-reproducible). */
  def sqDistLongSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
}
