package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming pipeline over the events schema — SURVEY §2 C7.
  *
  * The same declarative transform serves batch (`events_window` query) and
  * stream: watermarked tumbling-window counts/sums per event type. State is
  * bounded by the watermark; at scale the shuffle is keyed by
  * (window, event_type) — low cardinality, no skew.
  */
object EventsStream {

  /** Shared transform: works on a batch DataFrame or a streaming one. */
  def windowedAgg(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
  }

  /** File-source stream over a directory of parquet events. */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema(spark.read.parquet(path).schema)
      .parquet(path)

  /** End-to-end: stream → watermark → windowed agg, ready for writeStream. */
  def pipeline(spark: SparkSession, path: String): DataFrame =
    windowedAgg(readEvents(spark, path), watermark = Some("2 hours"))
}
