package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.EnrichStream

case class EnEv(event_id: Long, ts: Timestamp, user_id: Long)

/** C31: stream-static enrichment — stateless broadcast join per
  * micro-batch, batch/stream parity, unknown-dimension safety. */
class EnrichStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long) =
    EnEv(id, Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00"), user)

  // users 0..9; dimension covers only 0..6 → 7..9 must land in 'unknown'
  private val dim = (0L to 6L).map(u => (u, if (u % 2 == 0) "paid" else "free"))
    .toDF("user_id", "segment")
  private val batch1 = (0L until 120L).map(i => ev(i, (i % 60).toInt, i % 10))
  private val batch2 = (120L until 200L).map(i => ev(i, (i % 60).toInt, i % 10))

  test("streamed segment counts equal the batch run over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EnEv]
    val sq = EnrichStream.segmentCounts(stream.toDF(), dim, "2 hours")
      .writeStream.format("memory").queryName("enrich_counts")
      .outputMode("complete").start()
    try {
      stream.addData(batch1)
      sq.processAllAvailable()
      stream.addData(batch2)
      sq.processAllAvailable()
      val streamed = spark.table("enrich_counts")
        .as[(Timestamp, String, Long)].collect().toSet

      val batch = EnrichStream.segmentCounts((batch1 ++ batch2).toDF(), dim, "2 hours")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(streamed == batch, "stream and batch enrichment must agree")

      // dimension misses surface as 'unknown', never dropped
      val bySeg = streamed.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      assert(bySeg("unknown") == (batch1 ++ batch2).count(_.user_id >= 7))
      assert(bySeg.values.sum == (batch1 ++ batch2).size)
    } finally sq.stop()
  }

  test("the stream-static join plans stateless (no streaming join state)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[EnEv]
    val sq = EnrichStream.enriched(stream.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_raw").start()
    try {
      stream.addData(batch1)
      sq.processAllAvailable()
      val plan = sq.lastProgress.sources.length
      // a stateful operator would report state rows; enrichment must not
      assert(sq.lastProgress.stateOperators.isEmpty ||
        sq.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static enrichment must keep zero join state")
      assert(plan == 1)
      assert(spark.table("enrich_raw").count() == batch1.size)
    } finally sq.stop()
  }
}
