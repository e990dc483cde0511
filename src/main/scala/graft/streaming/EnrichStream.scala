package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment — the streaming join shape a 100 TB pipeline
  * actually runs: an unbounded event stream joined against a bounded
  * dimension (user segments, document metadata, model routing tables).
  *
  * A stream-static INNER/LEFT join is STATELESS in Structured Streaming:
  * no watermark-bounded join state, no stream-side shuffle for the join —
  * each micro-batch broadcast-hash-joins the (small) static side. That is
  * the exact contract of the batch `broadcast(dim)` joins used across the
  * query surface, so enrichment semantics stay identical between backfill
  * (batch) and live (stream) runs over the same input — asserted by the
  * spec, the same parity contract as DedupStream and SketchStream.
  *
  * Downstream, the enriched attribute feeds a watermarked windowed count:
  * state is one row per (window, segment), bounded regardless of volume.
  */
object EnrichStream {

  /** Left-enrich events with the static `dim` (keyed `user_id`); missing
    * dimension rows surface as segment 'unknown' instead of silently
    * dropping events (backfill-parity: batch reruns must see them too). */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .withColumn("segment", coalesce(col("segment"), lit("unknown")))

  /** (window_start, segment, n): hourly event counts per enriched segment,
    * watermark-bounded — works identically on a stream or a batch frame. */
  def segmentCounts(events: DataFrame, dim: DataFrame, watermarkDelay: String): DataFrame =
    enriched(events.withWatermark("ts", watermarkDelay), dim)
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("segment"), col("n"))
}
