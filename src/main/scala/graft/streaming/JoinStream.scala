package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2.C39 — stream-stream interval join: each click joined to the same
  * user's purchases within the following hour (attribution with two LIVE
  * sides — the stream form of the batch as-of/funnel family, where one
  * side can no longer be a static table).
  *
  * State contract: both sides carry watermarks and the join predicate has
  * an explicit event-time bound (`p_ts ∈ [c_ts, c_ts + 1 h]`), which is
  * what lets Spark evict: a buffered click can be dropped once the
  * purchase-side watermark passes `c_ts + 1 h`, a buffered purchase once
  * the click-side watermark passes `p_ts`. Without the time bound the join
  * state grows forever — the scale failure mode this module exists to
  * avoid. INNER join emission is micro-batch-deterministic: a match emits
  * in whichever batch completes the pair, so the emitted SET is
  * independent of how arrivals split across batches.
  */
object JoinStream {

  /** Clicks ⋈ purchases per user within `windowExpr` (a SQL interval, e.g.
    * "interval 1 hour") after the click. Both inputs are streaming frames
    * over the events schema (user_id, event_id, ts, event_type). */
  def clickPurchase(clicks: DataFrame, purchases: DataFrame, delay: String,
                    windowExpr: String = "interval 1 hour"): DataFrame =
    joined(clicks, purchases, delay, windowExpr, "inner")

  /** LEFT OUTER form: clicks that never see a purchase inside their hour
    * ALSO emit (null purchase) — but only once the watermark proves no
    * purchase can still arrive (wm > c_ts + window). This is the streaming
    * semantics that makes "conversion AND abandonment" computable from one
    * query: emission of the unmatched row is delayed by exactly the
    * watermark, never guessed. Inner matches still emit immediately, so
    * the emitted SET is {all matches} ∪ {unmatched clicks whose window
    * the final watermark closed} — deterministic under AvailableNow (the
    * trailing no-data batch advances the watermark to max event time −
    * delay and flushes the closed unmatched state). */
  def clickPurchaseOuter(clicks: DataFrame, purchases: DataFrame, delay: String,
                         windowExpr: String = "interval 1 hour"): DataFrame =
    joined(clicks, purchases, delay, windowExpr, "left_outer")

  private def joined(clicks: DataFrame, purchases: DataFrame, delay: String,
                     windowExpr: String, joinType: String): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    c.join(p, expr(
        s"user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + $windowExpr"),
        joinType)
      .select(col("user_id"), col("c_id"), col("p_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }
}
