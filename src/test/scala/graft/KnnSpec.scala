package graft

import org.apache.spark.sql.functions._
import graft.operators.Knn

class KnnSpec extends SparkSpec {
  import spark.implicits._

  // unit vectors on a circle: cosine to (1,0) decreases with angle
  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  private lazy val corpus = Seq(
    (1L, vec(10)), (2L, vec(20)), (3L, vec(45)), (4L, vec(90)), (5L, vec(180))
  ).toDF("vec_id", "embedding")

  private lazy val query = Seq(Tuple1(vec(0))).toDF("q_vec")

  test("topK cosine returns nearest-by-angle, ordered") {
    val r = Knn.topK(corpus, query, 3, Knn.Cosine).select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(1L, 2L, 3L))
  }

  test("topK l2 ascending") {
    val r = Knn.topK(corpus, query, 2, Knn.L2).select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(1L, 2L))
  }

  test("tie-break on id is deterministic") {
    val dup = Seq((7L, vec(10)), (6L, vec(10)), (5L, vec(90))).toDF("vec_id", "embedding")
    val r = Knn.topK(dup, query, 2, Knn.Cosine).select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(6L, 7L))
  }

  test("postfilter can return fewer than k (reference recall collapse)") {
    val meta = Seq((1L, "en"), (2L, "de"), (3L, "de"), (4L, "de"), (5L, "de")).toDF("doc_id", "lang")
    val r = Knn.postfilterKnn(corpus, meta, col("lang") === "en", query,
      k = 3, largeK = 5, Knn.Cosine)
    assert(r.count() == 1)
  }

  test("prefilter searches only survivors") {
    val meta = Seq((1L, "de"), (2L, "de"), (3L, "en"), (4L, "en"), (5L, "en")).toDF("doc_id", "lang")
    val r = Knn.prefilterKnn(corpus, meta, col("lang") === "en", query, 2, Knn.Cosine)
      .select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(3L, 4L))
  }

  test("batchKnn ranks per query and excludes self") {
    val queries = corpus.limit(2).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val r = Knn.batchKnn(corpus, queries, 2, Knn.Cosine)
    val byQ = r.select("q_id", "vec_id", "rank").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    assert(byQ(1L) == Seq(2L, 3L))
    assert(byQ(2L) == Seq(1L, 3L))
    assert(!byQ(1L).contains(1L))
  }
}
