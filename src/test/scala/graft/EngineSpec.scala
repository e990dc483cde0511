package graft

import org.apache.spark.sql.functions._

class EngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, Array(1.0f, 0.1f), 0), (2L, Array(1.0f, -0.1f), 0), (3L, Array(0.9f, 0.0f), 0),
    (4L, Array(0.1f, 1.0f), 1), (5L, Array(-0.1f, 1.0f), 1), (6L, Array(0.0f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  private lazy val meta = Seq(
    (1L, "en", 100), (2L, "de", 100), (3L, "en", 500),
    (4L, "en", 100), (5L, "en", 100), (6L, "de", 100)
  ).toDF("doc_id", "lang", "n_chars")

  private lazy val query = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
  private lazy val engine = HybridSearchEngine(corpus, meta)

  test("preFilterSearch honors the reference query language") {
    val r = engine.preFilterSearch(
      Map("lang" -> ("exact", "en"), "n_chars" -> ("leq", 200)), query, 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(1L, 4L)) // 3 filtered by n_chars, 2 by lang
  }

  test("postFilterSearch can lose recall under selective filters") {
    // top-2 by cosine: 3 (exactly collinear) then 1 (tie with 2, id-break);
    // with largeK=2, en-filter keeps both — but 4L (en, would make top-3
    // of a prefilter) is unreachable: the post-filter recall ceiling
    val r = engine.postFilterSearch(Map("lang" -> ("exact", "en")), query, 3, largeK = 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(r == Seq(3L, 1L))
  }

  test("acornSearch probes nearest cluster with filter pushed down") {
    val r = engine.acornSearch(Map("lang" -> ("exact", "en")), query, 5, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(r == Set(1L, 3L)) // cluster 0 only; 2L fails lang
  }

  test("acornSearchAdaptive widens past a filtered-out nearest cluster") {
    // de docs: 2L in cluster 0, 6L in cluster 1. The nearest cluster (0)
    // holds only one → probe-1 yields 1 < k=2 results, forcing a widening.
    val r = engine.acornSearchAdaptive(Map("lang" -> ("exact", "de")), query, 2)
      .select("vec_id").as[Long].collect().toSet
    assert(r == Set(2L, 6L))
  }

  test("acornSearchBatch returns per-query ranks matching single-query acorn") {
    val qs = corpus.filter(col("vec_id").isin(1L, 4L))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val r = engine.acornSearchBatch(Map("lang" -> ("exact", "en")), qs, 2, nProbe = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // q=1 probes cluster 0 (en: 1,3; self excluded → 3); q=4 probes
    // cluster 1 (en: 4,5; self excluded → 5)
    assert(r == Set((1L, 3L), (4L, 5L)))
  }

  test("exactSearch is the ground truth") {
    // (0.9, 0) is exactly collinear with the query → cosine 1.0
    val r = engine.exactSearch(query, 1).select("vec_id").as[Long].head()
    assert(r == 3L)
  }

  test("SQL functions registered via GraftExtensions.register") {
    GraftExtensions.register(spark)
    corpus.createOrReplaceTempView("emb_sql_test")
    val r = spark.sql(
      """SELECT vec_id, vec_cosine(embedding, array(1.0F, 0.0F)) AS c,
        |       vec_l2(embedding, array(1.0F, 0.0F)) AS d,
        |       vec_dot(embedding, array(1.0F, 0.0F)) AS p
        |FROM emb_sql_test ORDER BY c DESC, vec_id LIMIT 1""".stripMargin).collect().head
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9) // cosine
    assert(math.abs(r.getDouble(2) - 0.1) < 1e-6) // l2
    assert(math.abs(r.getDouble(3) - 0.9) < 1e-6) // dot
  }

  test("recall_probe_sweep: recall is monotone in nProbe and exact at full probe") {
    val rows = queries.HybridQueries.defs("recall_probe_sweep")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    val byQ = rows.groupBy(_._2)
    byQ.values.foreach { qRows =>
      val curve = qRows.sortBy(_._1).map(_._3)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"recall not monotone in nProbe: ${qRows.sortBy(_._1).toSeq}")
    }
    // probing 8 of 10 seeded clusters must recover most of the exact set
    assert(rows.filter(_._1 == 8L).map(_._3).sum >= rows.filter(_._1 == 1L).map(_._3).sum)
  }
}
