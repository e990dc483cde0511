package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2.C42 — Z-order (Morton) layout: multi-dimensional data skipping.
  *
  * A table sorted by ONE column gives parquet min/max pruning on that
  * column only — every file spans the full range of every other column. A
  * 100 TB fact table queried by 2-D boxes (user × day, lat × lon, …) wants
  * BOTH dimensions clustered. Bit-interleaving the two keys into one
  * Morton code and range-partitioning + sorting by it gives every file a
  * tight z-range, which is a tight box in BOTH source dimensions — so a
  * box predicate prunes most files via the ordinary per-column min/max
  * stats, no special reader support needed. This is the layout trick
  * behind Delta/Iceberg OPTIMIZE ZORDER, expressed with stock Spark
  * (repartitionByRange + sortWithinPartitions).
  *
  * The z-value is pure integer bit math over the low `bits` of each
  * dimension — a shared Scala generator emits the identical formula in
  * both dialects, so the code is oracle-verifiable bit-for-bit.
  */
object ZOrder {

  /** Spark SQL: interleave the low `bits` of `u` (even positions) and `d`
    * (odd positions) into a Morton code. */
  def zvalExpr(u: String, d: String, bits: Int): String =
    (0 until bits).map { b =>
      s"(shiftleft(shiftright($u, $b) & 1, ${2 * b}) + " +
        s"shiftleft(shiftright($d, $b) & 1, ${2 * b + 1}))"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** DuckDB dialect of the same formula (shift operators). */
  def duckZvalExpr(u: String, d: String, bits: Int): String =
    (0 until bits).map { b =>
      s"(((($u >> $b) & 1) << ${2 * b}) + (((($d >> $b) & 1)) << ${2 * b + 1}))"
    }.mkString("CAST(", " + ", " AS BIGINT)")

  /** Write `df` z-clustered: range-partitioned into `nFiles` tight
    * z-ranges, sorted inside each so row groups are tight too. */
  def writeZOrdered(df: DataFrame, zCol: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max of the two source dimensions — the stats a box
    * predicate prunes against (what a lakehouse keeps in its manifest). */
  def fileStats(layout: DataFrame, u: String, d: String): DataFrame =
    layout.groupBy(input_file_name().as("file"))
      .agg(min(u).as("u_lo"), max(u).as("u_hi"),
        min(d).as("d_lo"), max(d).as("d_hi"))
}
