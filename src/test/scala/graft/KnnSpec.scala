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

  test("hard_negatives mines only cross-language neighbors, nearest-first") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.queries.SearchQueries.defs("hard_negatives")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val lang = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    // every mined negative really is a DIFFERENT language than its anchor
    rows.foreach { case (q, v, _, _) =>
      assert(lang(v) != lang(q), s"negative $v shares lang ${lang(v)} with anchor $q")
    }
    // per anchor: ranks are 1..k and scores arrive best-first
    rows.groupBy(_._1).foreach { case (_, hits) =>
      val sorted = hits.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    }
    // the mined set per anchor == a per-anchor pre-filtered exact top-5
    val e = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val byAnchor = rows.groupBy(_._1)
    byAnchor.keys.foreach { qid =>
      val cand = e.filter(col("vec_id") =!= qid)
        .join(Tables(spark, sfDir, "documents")
            .filter(col("lang") =!= lang(qid)).select("doc_id"),
          col("vec_id") === col("doc_id"))
        .select("vec_id", "embedding")
      val expected = Knn.topK(cand,
          e.filter(col("vec_id") === qid).select(col("embedding").as("q_vec")),
          5, Knn.Cosine)
        .select("vec_id", "score").as[(Long, Long)].collect().toSeq
      assert(byAnchor(qid).sortBy(_._3).map(h => (h._2, h._4)).toSeq == expected)
    }
  }
}
