package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state carried between micro-batches. */
case class SessionAgg(startMs: Long, lastMs: Long, n: Long)

/** A closed (gap-expired) session. */
case class ClosedSession(user_id: Long, n_events: Long, sess_start: Timestamp, sess_end: Timestamp)

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

  /** File-source stream over a directory of parquet events. Applies the
    * same TIMESTAMP(NANOS) → micros conversion as the batch loader
    * (graft.Tables) so `ts` is a timestamp on both paths. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val batchSchema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(batchSchema).parquet(path)
    batchSchema.fields.foldLeft(raw) {
      case (d, f) if graft.Tables.NanoTimestampCols(f.name) && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
      case (d, _) => d
    }
  }

  /** End-to-end: stream → watermark → windowed agg, ready for writeStream. */
  def pipeline(spark: SparkSession, path: String): DataFrame =
    windowedAgg(readEvents(spark, path), watermark = Some("2 hours"))

  /** Stateful streaming sessionization: per-user custom state via
    * `flatMapGroupsWithState` with event-time timeout. A session closes
    * when the watermark passes last-event + gap; state is bounded by open
    * sessions only (the streaming mirror of the batch `events_sessionize`
    * query). Shuffle keyed by user_id — clickstream's natural key. */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapSeconds: Long, watermarkDelay: String = "1 minute"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def close(user: Long, s: SessionAgg): ClosedSession =
      ClosedSession(user, s.n, new Timestamp(s.startMs), new Timestamp(s.lastMs))

    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAgg, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val done = close(user, state.get)
            state.remove()
            Iterator.single(done)
          } else {
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= close(user, s)
                  cur = Some(SessionAgg(t, t, 1))
                case None =>
                  cur = Some(SessionAgg(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
