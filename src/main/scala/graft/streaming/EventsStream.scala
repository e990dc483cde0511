package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open-session state carried between micro-batches. */
case class SessionAgg(startUs: Long, lastUs: Long, n: Long)

/** A closed (gap-expired) session. */
case class ClosedSession(user_id: Long, n_events: Long, sess_start: Timestamp, sess_end: Timestamp)

/** Structured Streaming pipeline over the events schema — SURVEY §2 C7.
  *
  * The same declarative transform serves batch (`events_window` query) and
  * stream: watermarked tumbling-window counts/sums per event type. State is
  * bounded by the watermark; at scale the shuffle is keyed by
  * (window, event_type) — low cardinality, no skew.
  */
object EventsStream extends Serializable {

  /** Shared transform: works on a batch DataFrame or a streaming one. */
  def windowedAgg(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
  }

  /** `windowedAgg` with an order-insensitive sum: per-row floor-cents longs
    * instead of a double accumulator, so streaming state merges across any
    * micro-batch split bit-equal to the batch plan — the form the driver
    * oracle compares (fp sums are order-dependent; integer sums are not). */
  def windowedAggExact(events: DataFrame, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100).cast("long")).as("sum_cents"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_cents"))
  }

  /** File-source stream over a directory of parquet events. Applies the
    * same TIMESTAMP(NANOS) → micros conversion as the batch loader
    * (graft.Tables) so `ts` is a timestamp on both paths. */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val batchSchema = spark.read.parquet(path).schema
    graft.Tables.convertNanoCols(
      spark.readStream.schema(batchSchema).parquet(path), batchSchema)
  }

  /** End-to-end: stream → watermark → windowed agg, ready for writeStream. */
  def pipeline(spark: SparkSession, path: String): DataFrame =
    windowedAgg(readEvents(spark, path), watermark = Some("2 hours"))

  // java.sql.Timestamp round-trips sub-millisecond precision only through
  // its nanos field — convert explicitly so streaming keeps the micros the
  // batch path (Tables' TIMESTAMP(NANOS) div 1000) preserves.
  private[streaming] def tsToMicros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000L
  private[streaming] def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Stateful streaming sessionization: per-user custom state via
    * `flatMapGroupsWithState` with event-time timeout. A session closes
    * when the watermark passes last-event + gap; state is bounded by open
    * sessions only (the streaming mirror of the batch `events_sessionize`
    * query). Shuffle keyed by user_id — clickstream's natural key.
    * Late-but-valid events (past the watermark, before the open session)
    * merge backward when within the gap; farther-out ones form their own
    * session. */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
                       gapSeconds: Long, watermarkDelay: String = "1 minute"): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    def close(user: Long, s: SessionAgg): ClosedSession =
      ClosedSession(user, s.n, microsToTs(s.startUs), microsToTs(s.lastUs))

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
            // sorted within the batch; a late-but-valid event (>= watermark)
            // can still precede the open session — the merge below extends
            // startUs backward so counts and bounds stay consistent
            rows.map(r => tsToMicros(r._2)).toSeq.sorted.foreach { t =>
              cur match {
                case Some(s) if t >= s.startUs - gapUs && t - s.lastUs <= gapUs =>
                  cur = Some(SessionAgg(math.min(s.startUs, t), math.max(s.lastUs, t), s.n + 1))
                case Some(s) if t < s.startUs - gapUs =>
                  // too-late event far BEFORE the open session: emit it as
                  // its own closed singleton; the open session stays open
                  // (closing the later session here would split/overlap it)
                  closed ::= ClosedSession(user, 1, microsToTs(t), microsToTs(t))
                case Some(s) =>
                  closed ::= close(user, s)
                  cur = Some(SessionAgg(t, t, 1))
                case None =>
                  cur = Some(SessionAgg(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L) // timeout API is ms
            }
            closed.reverseIterator
          }
      }
  }
}
