package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{Dedup, KMeans, Salting}
import graft.streaming.{DedupStream, EventsStream}

case class Doc(doc_id: Long, ts: Timestamp, text: String)

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans recovers well-separated clusters") {
    val emb = Seq(
      (1L, Array(10f, 0f)), (2L, Array(11f, 0f)), (3L, Array(10.5f, 0.5f)),
      (4L, Array(0f, 10f)), (5L, Array(0f, 11f)), (6L, Array(0.5f, 10.5f))
    ).toDF("vec_id", "embedding")
    val cent = KMeans.fit(spark, emb, k = 2, iters = 5)
    val assigned = KMeans.assign(emb, cent)
      .as[(Long, Int)].collect().toMap
    assert(assigned(1L) == assigned(2L) && assigned(2L) == assigned(3L))
    assert(assigned(4L) == assigned(5L) && assigned(5L) == assigned(6L))
    assert(assigned(1L) != assigned(4L))
  }

  test("kmeans assignment tie-breaks to lower cluster id deterministically") {
    val emb = Seq((1L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val cent = Seq((0, Array(1f, 0f)), (1, Array(-1f, 0f))).toDF("cluster", "cent")
    assert(KMeans.assign(emb, cent).as[(Long, Int)].head()._2 == 0)
  }

  test("salted join matches direct join, with and without the kept salt") {
    val big = (1 to 500).map(i => (if (i % 3 == 0) "hot" else s"k${i % 20}", i.toLong))
      .toDF("key", "v")
    val dim = Seq(("hot", 100L), ("k1", 1L), ("k2", 2L)).toDF("key", "w")
    val direct = big.join(dim, "key").groupBy("key")
      .agg(count(lit(1)).as("n"), sum(expr("v * w")).as("t"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Salting.saltedJoin(big, dim, "key", salts = 8).groupBy("key")
      .agg(count(lit(1)).as("n"), sum(expr("v * w")).as("t"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == direct)
    // keepSalt exposes _salt for a follow-on two-phase aggregation
    val twoPhase = Salting.saltedJoin(big, dim, "key", salts = 8, keepSalt = true)
      .groupBy(col("key"), col("_salt")).agg(count(lit(1)).as("pc"))
      .groupBy("key").agg(sum("pc").as("n"))
      .as[(String, Long)].collect().toSet
    assert(twoPhase == direct.map(r => (r._1, r._2)))
  }

  test("salted aggregation matches direct groupBy") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toDouble))
      .toDF("key", "v")
    val salted = Salting.saltedCounts(df, col("key"), salts = 8, Some(col("v")))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val direct = df.groupBy("key").agg(count(lit(1)), sum("v"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(salted == direct)
  }

  test("count-only salted aggregation returns just (k, n)") {
    val df = (1 to 100).map(i => if (i % 2 == 0) "hot" else s"k$i").toDF("key")
    val salted = Salting.saltedCounts(df, col("key"), salts = 4)
    assert(salted.columns.toSeq == Seq("k", "n"))
    val m = salted.as[(String, Long)].collect().toMap
    assert(m("hot") == 50L)
  }

  test("streaming dedup emits only the first copy within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    def doc(id: Long, hhmm: String, text: String) =
      Doc(id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), text)

    val stream = MemoryStream[Doc]
    val out = DedupStream.dedupWithinWatermark(stream.toDF(), "10 minutes")
    val sq = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // same content twice in one batch, once in the next (still in window)
      stream.addData(doc(1, "10:00", "aaa"), doc(2, "10:01", "aaa"), doc(3, "10:01", "bbb"))
      sq.processAllAvailable()
      stream.addData(doc(4, "10:02", "aaa"))
      sq.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"got $ids")

      // far past the watermark the state is dropped: the duplicate is
      // re-admitted (the documented bounded-state contract; the periodic
      // batch pass is the exactness backstop)
      stream.addData(doc(5, "12:00", "ccc"))
      sq.processAllAvailable()
      stream.addData(doc(6, "12:01", "aaa"))
      sq.processAllAvailable()
      val later = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(later.contains(6L), s"got $later")
    } finally sq.stop()
  }

  test("streaming and batch dedup agree on the surviving hashes") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val got = DedupStream.dedupBatch(df).select("h").as[String].collect().toSet
    val exact = Dedup.exact(df).select("h").as[String].collect().toSet
    assert(got == exact)
  }

  test("streaming sessionization closes sessions past the gap via event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, user: Long, hhmm: String) =
      Ev(id, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), user, "click", 1.0)

    val stream = MemoryStream[Ev]
    val out = EventsStream.sessionizeStream(spark, stream.toDF(), gapSeconds = 1800)
    val sq = out.writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // user 1: two events 5 min apart => one session
      stream.addData(ev(1, 1L, "10:00"), ev(2, 1L, "10:05"))
      sq.processAllAvailable()
      // a much later event pushes the watermark past 10:05 + 30min
      stream.addData(ev(3, 2L, "12:00"))
      sq.processAllAvailable()
      // one more batch so the timeout fires after watermark advancement
      stream.addData(ev(4, 2L, "12:01"))
      sq.processAllAvailable()

      val sessions = spark.table("sess_out").as[(Long, Long, Timestamp, Timestamp)].collect()
      val u1 = sessions.filter(_._1 == 1L)
      assert(u1.length == 1)
      assert(u1.head._2 == 2L)
      assert(u1.head._3 == Timestamp.valueOf("2024-01-01 10:00:00"))
      assert(u1.head._4 == Timestamp.valueOf("2024-01-01 10:05:00"))
    } finally sq.stop()
  }
}
