package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the continuous-ingest form of SURVEY §2 B1.
  *
  * A 100 TB training corpus is not ingested once; it arrives as a stream,
  * and exact dedup must happen before anything expensive (decode, embed,
  * quality-score) touches a duplicate. The Spark-first shape is
  * `dropDuplicatesWithinWatermark` keyed by the content hash:
  *
  *  - state is keyed by md5(content) — the same key batch `Dedup.exact`
  *    groups on, so batch backfill and streaming ingest agree;
  *  - the watermark BOUNDS state: a key is guaranteed deduped only against
  *    copies arriving within the watermark window, and its state is
  *    dropped once the watermark passes — at scale this is the difference
  *    between bounded executor memory and unbounded growth;
  *  - re-emission of a very-late duplicate (outside the window) is the
  *    documented contract, handled downstream by the batch dedup pass
  *    (streaming = fast path, periodic batch = exactness backstop —
  *    the standard lambda shape for dedup at this scale).
  */
object DedupStream {

  /** Content-hash dedup over a watermarked stream. `tsCol` drives the
    * watermark; only the first-arriving copy of each `textCol` hash within
    * the watermark window is emitted, with its content hash attached. */
  def dedupWithinWatermark(docs: DataFrame, watermarkDelay: String,
                           textCol: String = "text",
                           tsCol: String = "ts"): DataFrame =
    docs
      .withColumn("h", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("h")

  /** Batch mirror of the same transform (no watermark semantics in batch —
    * plain exact dedup keeping one row per hash), for backfill parity. */
  def dedupBatch(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("h", md5(col(textCol)))
      .dropDuplicates("h")
}
