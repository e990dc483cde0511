package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Hll

/** Streaming distinct-count sketch — the continuous form of SURVEY §2 C24.
  *
  * Exact streaming `count(DISTINCT)` needs one state row per distinct key
  * — unbounded at 100 TB ingest. The sketch form keeps ≤ 256 bucket rows
  * of state per (window, group) REGARDLESS of stream volume, because the
  * per-bucket `max(rho)` is associative: every micro-batch merges into the
  * same bounded state, and the same merge makes streaming results equal
  * batch results over identical input (asserted in the spec).
  *
  * Shape: watermark → narrow bucket/rho projection (operators.Hll — the
  * SAME fragments the batch query and DuckDB oracle use) → one windowed
  * aggregation. The bucket-level rows are the queryable sketch; folding to
  * the scalar estimate happens downstream (`estimates`, typically in the
  * sink or a batch reader) so the streaming stage stays single-agg. */
object SketchStream {

  /** (window_start, event_type, bucket, rho): watermark-bounded bucket-level
    * sketch over hourly windows. */
  def sketchStream(events: DataFrame, watermarkDelay: String): DataFrame =
    Hll.bucketRho(
        events.withWatermark("ts", watermarkDelay)
          .select(col("ts"), col("event_type"), col("event_id")),
        "concat('hll', CAST(event_id AS STRING))", Seq("ts", "event_type"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("bucket"))
      .agg(max("rho").as("rho"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("bucket"), col("rho"))

  /** Fold sketch rows (streamed or stored) into per-(window, type) distinct
    * estimates. */
  def estimates(sketch: DataFrame): DataFrame =
    Hll.estimate(sketch, Seq("window_start", "event_type"))
      .select("window_start", "event_type", "est")
}
