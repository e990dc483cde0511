package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared deterministic HyperLogLog (p=8) fragments — ONE source of truth
  * for the batch query (`approx_distinct_hll`), the streaming sketch
  * (`streaming.SketchStream`), and (textually) the DuckDB oracle.
  *
  * The sketch row format is (group…, bucket, rho): bucket-level max-rho
  * rows ARE the sketch — mergeable by plain `max` (associative), storable,
  * and ≤ `NumBuckets` rows per group no matter the input size. The
  * estimator is the raw alpha·m²/Z form on integer bit-shift power sums;
  * ln-based small-range correction is deliberately omitted (libm variance
  * breaks cross-engine bit-exactness — see AnalyticsQueries). */
object Hll {
  val NumBuckets = 256
  val MaxRho = 53
  /** alpha_256 = 0.7213/(1+1.079/256), ×10⁶. */
  val AlphaScaled = 718268L

  /** Project (groupCols…, bucket, rho) from a hashable SQL expression.
    * Narrow — adds no shuffle; rho = leading-zero rank of the 52-bit word
    * above the 8 bucket bits of the shared 60-bit md5 hash. */
  def bucketRho(df: DataFrame, valueExpr: String, groupCols: Seq[String]): DataFrame =
    df.selectExpr(groupCols :+ s"${Dedup.hashExpr(valueExpr)} AS _h": _*)
      .selectExpr(groupCols :+ s"_h % $NumBuckets AS bucket" :+ s"_h div $NumBuckets AS _w": _*)
      .selectExpr(groupCols :+ "bucket" :+
        s"CASE WHEN _w = 0 THEN $MaxRho ELSE $MaxRho - length(bin(_w)) END AS rho": _*)

  /** First aggregation stage: per-(group, bucket) max rho — the mergeable
    * sketch rows. Partial-aggregates map-side (max is associative). */
  def sketchAgg(rows: DataFrame, groupCols: Seq[String]): DataFrame =
    rows.groupBy((groupCols :+ "bucket").map(col): _*).agg(max("rho").as("rho"))

  /** Second stage: fold sketch rows into the integer power sum and the
    * estimate. Missing buckets contribute 2^MaxRho (rho = 0). */
  def estimate(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(expr(s"CAST(sum(shiftleft(CAST(1 AS BIGINT), $MaxRho - rho))" +
        s" + ($NumBuckets - count(*)) * shiftleft(CAST(1 AS BIGINT), $MaxRho) AS BIGINT)")
        .as("zsum"))
      .withColumn("est", expr(
        s"CAST(floor((($AlphaScaled.0D / 1000000.0D) * 65536.0D * 9007199254740992.0D)" +
          " / CAST(zsum AS DOUBLE)) AS BIGINT)"))
}
