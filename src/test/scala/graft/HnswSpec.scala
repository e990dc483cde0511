package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Knn}

/** In-partition HNSW (library + spec, the graph-ANN option for corpora
  * where IVF probing loses recall): measured recall vs the exact scan,
  * determinism under a pinned partitioning, and the degenerate cases. */
class HnswSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables(spark, dir, "embeddings")

  private def queryVec(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).select("embedding")
      .head.getSeq[Float](0).toArray

  test("per-partition HNSW reaches high recall where probe-limited IVF cannot") {
    val corpus = emb.filter(col("vec_id") =!= 7).select("vec_id", "embedding")
    val q = queryVec(7)
    val exact = Knn.topK(corpus,
        emb.filter(col("vec_id") === 7).select(col("embedding").as("q_vec")),
        10, Knn.L2)
      .select("vec_id").as[Long].collect().toSet
    val approx = Hnsw.searchPerPartition(corpus.repartition(4, col("vec_id")), q, 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = approx.intersect(exact).size
    // this corpus is the documented IVF recall-collapse regime
    // (probe-3-of-10 IVF reaches 2–4/10 here, IvfTrainedSpec); the graph
    // searches EVERY partition, so only local beam quality bounds recall
    assert(recall >= 8, s"hnsw recall@10 = $recall/10")
  }

  test("exact-rescored scores match the engine's scaled L2 for returned ids") {
    val corpus = emb.filter(col("vec_id") =!= 7).select("vec_id", "embedding")
    val res = Hnsw.searchPerPartition(corpus.repartition(4, col("vec_id")), queryVec(7), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Knn.topK(corpus,
        emb.filter(col("vec_id") === 7).select(col("embedding").as("q_vec")),
        500, Knn.L2)
      .select("vec_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    res.foreach { case (id, s) => assert(expected(id) == s, s"score mismatch for $id") }
  }

  test("deterministic under a pinned partitioning") {
    val corpus = emb.select("vec_id", "embedding").repartition(4, col("vec_id"))
    val q = queryVec(0)
    val a = Hnsw.searchPerPartition(corpus, q, 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Hnsw.searchPerPartition(corpus, q, 10).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    assert(a.size == 10)
  }

  // ----- ACORN-1 filtered traversal (acorn.py:149 acorn_search) -----

  private def corpusWithPass(pred: org.apache.spark.sql.Column, exclId: Long) = {
    val d = Tables(spark, dir, "documents")
    emb.filter(col("vec_id") =!= exclId).select("vec_id", "embedding")
      .join(d.filter(pred).select(col("doc_id"), lit(true).as("pass")),
        col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"), col("embedding"),
        coalesce(col("pass"), lit(false)).as("pass"))
      .repartition(4, col("vec_id"))
  }

  test("saturated ACORN walk equals the exact pre-filtered top-k") {
    import graft.operators.MetaPredicate
    val pred = MetaPredicate("lang" -> ("exact", "zh"))
    val q = queryVec(11)
    val got = Hnsw.searchFilteredPerPartition(corpusWithPass(pred, 11), q, 10, metaSearch = 256)
      .select("vec_id", "score").as[(Long, Long)].collect().toSeq
    val exact = Knn.prefilterKnn(
        emb.filter(col("vec_id") =!= 11).select("vec_id", "embedding"),
        Tables(spark, dir, "documents"), pred,
        emb.filter(col("vec_id") === 11).select(col("embedding").as("q_vec")),
        10, Knn.L2)
      .select("vec_id", "score").as[(Long, Long)].collect().toSeq
    assert(got == exact)
  }

  test("ACORN walk routes THROUGH blocked nodes to survivors behind them") {
    // a 1-D chain: only the far end passes the filter, so every path from
    // the entry runs through filter-failing nodes. Blocking must leave
    // them traversable or the walk strands at the near end.
    val g = new Hnsw.Graph(2, 4, 16)
    (0 until 40).foreach(i => g.insert(i.toLong, Array(i.toFloat, 0f)))
    val far = (35L to 39L).toSet
    val got = g.searchFiltered(Array(0f, 0f), 5, far, metaSearch = 64).map(_._1).toSet
    assert(got == far, s"expected the far-end survivors, got $got")
  }

  test("filtered search is deterministic and only returns passing ids") {
    import graft.operators.MetaPredicate
    val pred = MetaPredicate("n_chars" -> ("<", 200))
    val q = queryVec(3)
    val passing = Tables(spark, dir, "documents").filter(pred)
      .select("doc_id").as[Long].collect().toSet
    val run = () => Hnsw.searchFilteredPerPartition(corpusWithPass(pred, 3), q, 10, metaSearch = 64)
      .select("vec_id", "score").as[(Long, Long)].collect().toSeq
    val a = run(); val b = run()
    assert(a == b)
    assert(a.nonEmpty && a.forall { case (id, _) => passing(id) })
  }

  test("two-hop (ACORN-γ) walk: recall ≥ one-hop at equal visit budgets, saturated ≡ exact") {
    // r12 verdict next #4: the reference doubles M to keep the one-hop
    // walk from blocking (acorn.py:34); the ACORN paper's principled fix
    // is predicate-subgraph traversal via two-hop expansion. At EQUAL
    // per-round visit budgets on the class-1 selective predicate the
    // bridged walk must reach at least as much of the exact answer —
    // that is the entire point of the flag.
    import graft.operators.MetaPredicate
    val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
    val q = queryVec(17)
    val corpus = corpusWithPass(pred, 17).localCheckpoint(true)
    val exact = Knn.prefilterKnn(
        emb.filter(col("vec_id") =!= 17).select("vec_id", "embedding"),
        Tables(spark, dir, "documents"), pred,
        emb.filter(col("vec_id") === 17).select(col("embedding").as("q_vec")),
        10, Knn.L2)
      .select("vec_id").as[Long].collect().toSet
    def recall(budget: Int, twoHop: Boolean): Int =
      Hnsw.searchFilteredPerPartition(corpus, q, 10, metaSearch = budget,
          twoHop = twoHop)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    val budgets = Seq(4, 8, 16, 32, 64)
    val curve = budgets.map(b => (b, recall(b, twoHop = false), recall(b, twoHop = true)))
    info(s"budget -> (one-hop, two-hop) recall@10: " +
      curve.map { case (b, o, t) => s"$b->($o,$t)" }.mkString(", "))
    curve.foreach { case (b, one, two) =>
      assert(two >= one, s"budget $b: two-hop recall $two < one-hop $one")
    }
    assert(curve.map(_._3).sum > curve.map(_._2).sum,
      s"two-hop must beat one-hop somewhere on the budget curve: $curve")
    // saturated (sentinel) walks are exact under BOTH flags — the bridge
    // changes budget-bound traversal order only
    val sat1 = Hnsw.searchFilteredPerPartition(corpus, q, 10, metaSearch = 0)
      .select("vec_id", "score").as[(Long, Long)].collect().toSeq
    val sat2 = Hnsw.searchFilteredPerPartition(corpus, q, 10, metaSearch = 0,
        twoHop = true)
      .select("vec_id", "score").as[(Long, Long)].collect().toSeq
    assert(sat1 == sat2)
    assert(sat1.map(_._1).toSet.subsetOf(exact) && sat1.size == math.min(10, exact.size))
  }

  test("searchFilteredPerPartitionSweep equals the per-call filtered walks cell for cell") {
    // the one-build-many-walks amortization must be invisible in the
    // results: every (budget, twoHop) cell of the sweep is bit-identical
    // to an independent searchFilteredPerPartition call (construction is
    // deterministic, so both build the same graphs)
    import graft.operators.MetaPredicate
    val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
    val q = queryVec(17)
    val corpus = corpusWithPass(pred, 17).localCheckpoint(true)
    val settings = Seq((8, false), (8, true), (32, false), (32, true), (0, true))
    val sweep = Hnsw.searchFilteredPerPartitionSweep(corpus, q, 10, settings)
      .collect().map(r => ((r.getLong(0), r.getBoolean(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    settings.foreach { case (b, th) =>
      val single = Hnsw.searchFilteredPerPartition(corpus, q, 10,
          metaSearch = b, twoHop = th)
        .select("vec_id", "score").as[(Long, Long)].collect().toSet
      assert(sweep.getOrElse((b.toLong, th), Set.empty) == single,
        s"sweep cell ($b, $th) diverged from the per-call walk")
    }
  }

  test("recall_hnsw_2hop entry: every (budget, mode) row sits at its floor") {
    // A51: the spec's budget-curve measurement as the driver gates it —
    // least(n_hit, floor) == floor ⇔ measured ≥ floor, and the gain rows
    // pin two-hop ≥ one-hop at every budget (the never-loses half of the
    // curve claim; the strict win above stays spec-level)
    val rows = SparkEntry.queries("recall_hnsw_2hop")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val expect = graft.queries.HybridQueries.TwoHopBudgets.flatMap {
      case (b, one, two, gain) => Seq(
        (b.toLong, "one") -> one, (b.toLong, "two") -> two,
        (b.toLong, "gain") -> gain)
    }.toMap
    assert(rows == expect)
  }

  test("two-hop walk routes through an all-blocked chain exactly like one-hop") {
    // the anti-stall contract is flag-independent: every path to the far
    // end runs through failing nodes, and both walks must reach it
    val g = new Hnsw.Graph(2, 4, 16)
    (0 until 40).foreach(i => g.insert(i.toLong, Array(i.toFloat, 0f)))
    val far = (35L to 39L).toSet
    val got = g.searchFiltered(Array(0f, 0f), 5, far, metaSearch = 64,
      twoHop = true).map(_._1).toSet
    assert(got == far, s"expected the far-end survivors, got $got")
  }

  test("nothing passes → empty result, walk does not stall") {
    val g = new Hnsw.Graph(2, 4, 16)
    (0 until 20).foreach(i => g.insert(i.toLong, Array(i.toFloat, 0f)))
    assert(g.searchFiltered(Array(0f, 0f), 5, _ => false, metaSearch = 64).isEmpty)
  }

  test("persisted graphs search identically to freshly built ones") {
    val corpus = emb.select("vec_id", "embedding").repartition(4, col("vec_id"))
    val q = queryVec(5)
    val path = graft.TmpDirs.path("hnsw_spec_index")
    Hnsw.buildAndWrite(corpus, path, dims = 64, numParts = 4)
    val fresh = Hnsw.searchPerPartition(corpus, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val persisted = Hnsw.searchPersisted(spark, path, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(persisted == fresh)
    assert(persisted.size == 10)
  }

  test("append-after-restore equals the fresh full-corpus build exactly") {
    val full = emb.select("vec_id", "embedding").repartition(4, col("vec_id"))
    val base = emb.filter(col("vec_id") < 300).select("vec_id", "embedding")
    val arriving = emb.filter(col("vec_id") >= 300).select("vec_id", "embedding")
    val q = queryVec(5)
    val path = graft.TmpDirs.path("hnsw_spec_append")
    Hnsw.buildAndWrite(base, path, dims = 64, numParts = 4)
    val fresh = Hnsw.searchPerPartition(full, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // within every partition the arriving ids all exceed the base ids, so
    // restore + ascending append replays the full build's insertion order
    val appended = Hnsw.searchAppended(spark, path, arriving, 4, q, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(appended == fresh)
  }

  test("filtered search over the persisted index equals the fresh filtered walk") {
    import graft.operators.MetaPredicate
    val pred = MetaPredicate("lang" -> ("exact", "zh"))
    val q = queryVec(11)
    val corpus = emb.select("vec_id", "embedding").repartition(4, col("vec_id"))
    val path = graft.TmpDirs.path("hnsw_spec_filtered")
    Hnsw.buildAndWrite(corpus, path, dims = 64, numParts = 4)
    val passing = Tables(spark, dir, "documents").filter(pred)
      .select(col("doc_id").as("vec_id"))
    val persisted = Hnsw.searchFilteredPersisted(spark, path, passing, 4, q, 10,
        metaSearch = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fresh = Hnsw.searchFilteredPerPartition(
        emb.select("vec_id", "embedding")
          .join(Tables(spark, dir, "documents").filter(pred)
            .select(col("doc_id"), lit(true).as("pass")),
            col("vec_id") === col("doc_id"), "left")
          .select(col("vec_id"), col("embedding"),
            coalesce(col("pass"), lit(false)).as("pass"))
          .repartition(4, col("vec_id")),
        q, 10, metaSearch = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(persisted == fresh)
    assert(persisted.size == 10)
  }

  test("ACORN survivors grow monotonically with the visit budget") {
    // the round sequence is deterministic, so a smaller metaSearch runs a
    // strict PREFIX of a larger one's rounds — survivor sets must nest;
    // and the saturating budget must recover the exact filtered top-k
    import graft.operators.MetaPredicate
    val pred = MetaPredicate("lang" -> ("exact", "zh"))
    val q = queryVec(11)
    val corpus = corpusWithPass(pred, 11)
    // k=500 > any survivor count, so no global top-k cut interferes with
    // the nesting property (a larger budget's better survivors would
    // otherwise displace a smaller budget's from the top-10)
    val at = Seq(4, 16, 64, 512).map { b =>
      b -> Hnsw.searchFilteredPerPartition(corpus, q, 500, metaSearch = b)
        .select("vec_id").as[Long].collect().toSet
    }
    at.sliding(2).foreach { case Seq((b1, s1), (b2, s2)) =>
      assert(s1.subsetOf(s2), s"budget $b1 found ${s1 -- s2} that budget $b2 missed")
    }
    val exact = Knn.prefilterKnn(
        emb.filter(col("vec_id") =!= 11).select("vec_id", "embedding"),
        Tables(spark, dir, "documents"), pred,
        emb.filter(col("vec_id") === 11).select(col("embedding").as("q_vec")),
        10, Knn.L2)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.subsetOf(at.last._2),
      s"saturated walk missed exact hits ${exact -- at.last._2}")
  }

  test("tiny and empty partitions") {
    val corpus = emb.filter(col("vec_id") < 3).select("vec_id", "embedding")
      .repartition(8, col("vec_id")) // most partitions empty
    val res = Hnsw.searchPerPartition(corpus, queryVec(0), 10)
      .select("vec_id").as[Long].collect().toSet
    assert(res == Set(0L, 1L, 2L))
  }

  // ----- saturated-mode exactness under broken connectivity (ADVICE r5:
  // the one-sided degree prune in insert() can orphan a node; the
  // saturating contract is EXACT, so the sweep must recover it) -----

  /** Adversarial graph via the restore path: nodes 0–3 interlinked at
    * layer 0, node 4 with NO in- or out-edges — unreachable from the
    * entry point by construction, and sitting exactly at the query. */
  private def orphanGraph(): Hnsw.Graph = {
    val g = new Hnsw.Graph(2, 16, 64)
    val ring = Array(
      Array(1.0f, 0.0f), Array(0.0f, 1.0f), Array(-1.0f, 0.0f), Array(0.0f, -1.0f))
    val others = Array(Array(1, 2, 3), Array(0, 2, 3), Array(0, 1, 3), Array(0, 1, 2))
    (0 until 4).foreach(i => g.restoreNode(i.toLong, ring(i), 0, Array(others(i))))
    g.restoreNode(4L, Array(0.0f, 0.0f), 0, Array(Array.empty[Int]))
    g.restoreEntry(0, 0)
    g
  }

  test("saturated search sweeps orphaned nodes (exact despite connectivity)") {
    val q = Array(0.0f, 0.0f) // the orphan IS the nearest neighbor
    val g = orphanGraph()
    // realistic beam: the walk cannot reach the orphan — documents that
    // the sweep is what restores exactness, not the beam itself
    val beamOnly = g.search(q, 1, ef = 2).map(_._1)
    assert(beamOnly.nonEmpty && !beamOnly.contains(4L),
      s"beam unexpectedly reached the orphan: $beamOnly")
    // saturating beam (ef >= size): the sweep must surface the orphan
    val exact = g.search(q, 1, ef = 5).map(_._1)
    assert(exact == Seq(4L), s"saturated search missed the orphan: $exact")
    assert(g.search(q, 5, ef = 5).map(_._1).toSet == Set(0L, 1L, 2L, 3L, 4L))
  }

  test("saturated filtered walk sweeps passing orphans") {
    val q = Array(0.0f, 0.0f)
    val g = orphanGraph()
    // the sentinel parameterization the driver entries use: budget/beam/
    // return-cut all >= size
    val res = g.searchFiltered(q, 5, id => id != 1L, metaSearch = 15,
      largeK = 5, ef = 5).map(_._1).toSet
    assert(res == Set(0L, 2L, 3L, 4L), s"sweep missed a passing orphan: $res")
    // realistic budget: orphan stays unreachable (no sweep below saturation)
    val beam = g.searchFiltered(q, 5, id => id != 1L, metaSearch = 4,
      largeK = 2, ef = 2).map(_._1).toSet
    assert(!beam.contains(4L), s"unsaturated walk should not sweep: $beam")
  }

  test("buildAndWrite fails loudly past maxRowsPerGraph") {
    val corpus = emb.select("vec_id", "embedding")
    val err = intercept[Exception] {
      Hnsw.buildAndWrite(corpus, graft.TmpDirs.path("hnsw_guard_spec"),
        dims = 64, numParts = 2, maxRowsPerGraph = 10)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(err).exists(m => m != null && m.contains("maxRowsPerGraph")),
      s"guard message missing: ${messages(err)}")
  }
}
