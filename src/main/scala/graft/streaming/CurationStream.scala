package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.TextScoring

/** Streaming curation — the continuous-ingest form of the batch
  * `curation_pipeline` (SURVEY §2 B21): a 100 TB corpus arrives as a
  * stream, and the cheap per-document gates (language-ID, integer quality
  * score) plus content-hash dedup must run BEFORE anything expensive
  * (decode, embed, index) touches a rejected or duplicate document.
  *
  * Composition contract:
  *  - the gates are STATELESS narrow filters — the same `TextScoring`
  *    fragments the batch pipeline and the DuckDB oracle compile from, so
  *    live ingest and batch backfill accept byte-identical document sets;
  *  - dedup is `dropDuplicatesWithinWatermark` on md5(text) — state keyed
  *    exactly like batch `Dedup.exact`, BOUNDED by the watermark (the
  *    very-late-duplicate re-emission contract and its batch backstop are
  *    documented at DedupStream);
  *  - the final per-source quota (B17) stays batch-only by design: a
  *    deterministic quota over an unbounded stream is not well-defined
  *    until a snapshot is taken.
  */
object CurationStream {

  /** The stateless gate stages — language-ID predicts 'en' AND the
    * all-integer quality score clears `minQuality`. Works identically on
    * a streaming or batch frame (pure narrow projection + filter). */
  def gated(docs: DataFrame, minQuality: Long): DataFrame = {
    import TextScoring._
    docs
      .selectExpr("doc_id", "source", "n_chars", "text", "ts",
        s"${Dedup.TokExpr} AS tk")
      .selectExpr(Seq("doc_id", "source", "n_chars", "text", "ts") ++
        sLangScores ++ sQualityInputs: _*)
      .filter(expr(s"($LangPred) = 'en'"))
      .selectExpr("doc_id", "source", "text", "ts",
        s"${qualityExpr("div")} AS quality")
      .filter(col("quality") >= minQuality)
  }

  /** Gates + watermarked content-hash dedup over a stream: emits the
    * first-arriving copy of each surviving document. */
  def curated(docs: DataFrame, watermarkDelay: String, minQuality: Long): DataFrame =
    gated(docs, minQuality)
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("h")
      .select("source", "doc_id", "quality")

  /** Batch backfill mirror: identical gates, dedup keeps the smallest
    * doc_id per content hash (deterministic keeper — equals the stream's
    * first-arriving copy whenever arrival order follows doc_id). */
  def curatedBatch(docs: DataFrame, minQuality: Long): DataFrame = {
    val w = Window.partitionBy("h")
    gated(docs, minQuality)
      .withColumn("h", md5(col("text")))
      .withColumn("keeper", min("doc_id").over(w))
      .filter(col("doc_id") === col("keeper"))
      .select("source", "doc_id", "quality")
  }
}
