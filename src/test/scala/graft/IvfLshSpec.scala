package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Knn, Lsh}

class IvfLshSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (1,0) and (0,1)
  private lazy val emb = Seq(
    (1L, Array(1.0f, 0.1f), 0), (2L, Array(1.0f, -0.1f), 0), (3L, Array(0.9f, 0.0f), 0),
    (4L, Array(0.1f, 1.0f), 1), (5L, Array(-0.1f, 1.0f), 1), (6L, Array(0.0f, 0.9f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("centroids average per cluster, ordered by dim") {
    val c = Ivf.centroids(emb).orderBy("label")
      .select("cent").as[Array[Float]].collect()
    assert(math.abs(c(0)(0) - (1.0f + 1.0f + 0.9f) / 3) < 1e-6)
    assert(math.abs(c(1)(1) - (1.0f + 1.0f + 0.9f) / 3) < 1e-6)
  }

  test("probe picks the cluster nearest the query") {
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    val p = Ivf.probe(Ivf.centroids(emb), q, 1).as[Int].collect()
    assert(p.toSeq == Seq(0))
  }

  test("hybridKnn searches only probed clusters with the filter applied") {
    val meta = Seq((1L, 50), (2L, 500), (3L, 50), (4L, 50), (5L, 50), (6L, 50))
      .toDF("doc_id", "n_chars")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    val r = Ivf.hybridKnn(emb, meta, col("n_chars") < 100, q, k = 5, nProbe = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(r == Set(1L, 3L)) // cluster 0 only, id 2 filtered out
  }

  test("adaptiveHybridKnn widens probes until k filter-passing results") {
    // filter excludes ALL of cluster 0 (nearest) => must widen to cluster 1
    val meta = Seq((1L, 500), (2L, 500), (3L, 500), (4L, 50), (5L, 50), (6L, 50))
      .toDF("doc_id", "n_chars")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    val r = Ivf.adaptiveHybridKnn(emb, meta, col("n_chars") < 100, q, k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(r.subsetOf(Set(4L, 5L, 6L)) && r.size == 2)
  }

  test("hybridBatchKnn equals per-query hybridKnn") {
    val meta = Seq((1L, 50), (2L, 500), (3L, 50), (4L, 50), (5L, 50), (6L, 50))
      .toDF("doc_id", "n_chars")
    val qs = emb.filter(col("vec_id").isin(1L, 4L))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batch = Ivf.hybridBatchKnn(emb, meta, col("n_chars") < 100, qs, k = 3, nProbe = 1)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = Seq(1L, 4L).flatMap { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_vec"))
      Ivf.hybridKnn(emb.filter(col("vec_id") =!= qid), meta, col("n_chars") < 100,
        q, k = 3, nProbe = 1)
        .select("vec_id").as[Long].collect().map(qid -> _)
    }.toSet
    assert(batch == single)
  }

  test("hybridBatchKnn honors the search metric; probeBatch ≡ probe per query") {
    // r8 deferred item c: the inline batch probe hardcoded cosine, so an
    // L2 batch probed with the wrong ranking; rebased on the shared
    // probeBatch, the batch must reproduce per-query hybridKnn under L2
    val meta = Seq((1L, 50), (2L, 500), (3L, 50), (4L, 50), (5L, 50), (6L, 50))
      .toDF("doc_id", "n_chars")
    val qs = emb.filter(col("vec_id").isin(1L, 4L))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val batch = Ivf.hybridBatchKnn(emb, meta, col("n_chars") < 100, qs, k = 3,
      nProbe = 1, metric = Knn.L2)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val single = Seq(1L, 4L).flatMap { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_vec"))
      Ivf.hybridKnn(emb.filter(col("vec_id") =!= qid), meta, col("n_chars") < 100,
        q, k = 3, nProbe = 1, metric = Knn.L2)
        .select("vec_id").as[Long].collect().map(qid -> _)
    }.toSet
    assert(batch == single)
    // probe-order identity: the probeBatch slice equals probe, per query
    // and metric (the single-sourced ordering contract)
    val cent = Ivf.centroids(emb)
    for (m <- Seq(Knn.Cosine, Knn.L2)) {
      val pb = Ivf.probeBatch(cent, qs, nProbe = 2, metric = m)
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for (qid <- Seq(1L, 4L)) {
        val q = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_vec"))
        val p1 = Ivf.probe(cent, q, nProbe = 2, metric = m)
          .as[Long].collect().toSet
        assert(pb(qid) == p1, s"metric $m q$qid: batch ${pb(qid)} vs single $p1")
      }
    }
  }

  test("probeBatch refuses a non-numeric clusterCol (silent-null guard)") {
    // the k-heap carries cluster ids as BIGINT; a string label would cast
    // to null and every probe pair would silently vanish (r9 ADVICE)
    val cent = Seq(("a", Seq(0.0f, 1.0f)), ("b", Seq(1.0f, 0.0f)))
      .toDF("label", "cent")
    val qs = emb.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val ex = intercept[IllegalArgumentException] {
      Ivf.probeBatch(cent, qs, nProbe = 1)
    }
    assert(ex.getMessage.contains("non-numeric") &&
      ex.getMessage.contains("string"), ex.getMessage)
  }

  test("lsh bucket is deterministic and md5 matches the column hash") {
    // Scala-side md5Hash60 must agree with the SQL-side conv(md5) column
    val s = "plane_0_0"
    val colVal = Seq(Tuple1(s)).toDF("s")
      .select(graft.functions.md5Hash60(col("s"))).head().getLong(0)
    assert(Lsh.md5Hash60(s) == colVal)
  }

  test("lsh annSearch returns in-bucket neighbors") {
    val corpus = emb.select("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.05f))).toDF("q_vec")
    val r = Lsh.annSearch(corpus, q, 3, numPlanes = 2, dims = 2)
    // query's bucket contains at least its own cluster's vectors
    assert(r.count() >= 1)
    val top = r.select("vec_id").as[Long].head()
    assert(Set(1L, 2L, 3L).contains(top))
  }

  test("lsh multi-probe candidates are a superset of the single-bucket candidates") {
    val corpus = emb.select("vec_id", "embedding")
    val q = Seq(Tuple1(Array(1.0f, 0.05f))).toDF("q_vec")
    val single = Lsh.annSearch(corpus, q, 10, numPlanes = 2, dims = 2)
      .select("vec_id").as[Long].collect().toSet
    val multi = Lsh.multiProbeSearch(corpus, q, 10, numPlanes = 2, dims = 2, maxFlips = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(single.subsetOf(multi))
    // with 2 planes, 1 flip probes 3 of 4 buckets: recall can only grow
    assert(multi.size >= single.size)
    // maxFlips = numPlanes probes ALL buckets → exact brute-force top-k
    val all = Lsh.multiProbeSearch(corpus, q, 10, numPlanes = 2, dims = 2, maxFlips = 2)
      .select("vec_id").as[Long].collect().toSet
    val exact = graft.operators.Knn.topK(corpus, q, 10, graft.operators.Knn.Cosine)
      .select("vec_id").as[Long].collect().toSet
    assert(all == exact)
  }

  test("ivf_split_hot: sub-clusters exactly partition each hot cluster") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.queries.HybridQueries.defs("ivf_split_hot")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val byLabel = rows.groupBy(_._1)
    assert(byLabel.size == 3, "exactly the top-3 clusters split")
    val sizes = Tables(spark, sfDir, "embeddings").groupBy("label").count()
      .as[(Int, Long)].collect().toMap
    byLabel.foreach { case (label, subs) =>
      assert(subs.map(_._3).sum == sizes(label.toInt),
        "sub-cluster populations must sum to the original cluster size")
      assert(subs.map(_._2).toSet.subsetOf(Set(0L, 1L)))
    }
    // the split clusters really are the 3 largest (ties by label)
    val expectHot = sizes.toSeq.sortBy { case (l, n) => (-n, l) }.take(3)
      .map(_._1.toLong).toSet
    assert(byLabel.keySet == expectHot)
  }

  test("recall_multiprobe: 1-flip probing never loses recall vs single-bucket") {
    val rows = graft.queries.HybridQueries.defs("recall_multiprobe")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 5)
    rows.foreach { case (_, single, multi) =>
      assert(multi >= single, "multi-probe candidates are a superset")
      assert(multi <= 10 && single >= 0)
    }
  }

  test("autoKnn routes by selectivity: boundary per-milles pick the right strategy") {
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    // 20-row metadata table → each matching row is exactly 50 per-mille
    def meta(matching: Int) = (1L to 20L)
      .map(i => (i, if (i <= matching) "hit" else "miss")).toDF("doc_id", "tag")
    def strat(matching: Int): String =
      Ivf.autoKnn(emb, meta(matching), col("tag") === "hit", q, k = 2,
          selPreMax = 100L, selHybridMax = 300L)
        .select("strategy").distinct().as[String].collect().head
    assert(strat(1) == "prefilter")  // 50‰: selective
    assert(strat(2) == "hybrid")     // 100‰ is NOT < 100 → first hybrid
    assert(strat(5) == "hybrid")     // 250‰
    assert(strat(6) == "postfilter") // 300‰ is NOT < 300 → broad
    assert(strat(20) == "postfilter")
  }

  test("autoKnn with an all-rejecting predicate still runs (empty prefilter result)") {
    val meta = (1L to 6L).map(i => (i, "x")).toDF("doc_id", "tag")
    val q = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("q_vec")
    val r = Ivf.autoKnn(emb, meta, col("tag") === "nope", q, k = 3)
    assert(r.count() == 0)
  }
}
