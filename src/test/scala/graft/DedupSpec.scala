package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  private lazy val docs = Seq(
    doc(1, "the quick brown fox jumps over the lazy dog near the river bank"),
    doc(2, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    doc(3, "completely different content about spark query engines and data"),
    doc(4, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    doc(5, "unrelated short text snippet for testing distinct corpus entries")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs).as[(String, Long, Long)].collect()
    assert(r.length == 4)
    val dupGroup = r.find(_._3 == 2).get
    assert(dupGroup._2 == 1L) // keeper is min(1, 4)
  }

  test("ngram jaccard finds the near-dup pair") {
    val pairs = Dedup.ngramJaccard(docs, tauScaled = 500000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup has jaccard 1
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardPrefixJoin equals the uncapped all-pairs join (lossless pruning)") {
    // the prefix filter may only cut CANDIDATES, never verified results —
    // check at two thresholds and on the real corpus shape
    for (tau <- Seq(500000L, 700000L)) {
      val full = Dedup.ngramJaccard(docs, tau)
        .as[(Long, Long, Long)].collect().toSet
      val pfx = Dedup.jaccardPrefixJoin(docs, tau)
        .as[(Long, Long, Long)].collect().toSet
      assert(pfx == full, s"tau=$tau: prefix join diverged from all-pairs")
      assert(full.nonEmpty)
    }
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
    val fullC = Dedup.ngramJaccard(corpus, 700000L)
      .as[(Long, Long, Long)].collect().toSet
    val pfxC = Dedup.jaccardPrefixJoin(corpus, 700000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pfxC == fullC)
  }

  test("prefix candidates are a strict subset of the shingle-join candidates") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
    val all = Dedup.shingledExploded(corpus)
      .selectExpr("doc_id", s"${Dedup.hashExpr("g")} AS g")
    val fullCand = all.as("a")
      .join(all.as("b"),
        $"a.g" === $"b.g" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    val pfxCand = Dedup.jaccardPrefixCandidates(corpus, 700000L).count()
    assert(pfxCand < fullCand,
      s"prefix stage must prune: $pfxCand vs $fullCand full candidates")
  }

  test("passageDups finds aligned shared chunks across docs, ignores unique text") {
    // docs 1/2/4 share the aligned 12-token prefix → shared 4-token chunks;
    // docs 3/5 share nothing chunk-aligned with anyone
    val r = Dedup.passageDups(docs, chunkTokens = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, nDocs, nOcc, firstDoc) =>
      assert(nDocs >= 2 && nOcc >= nDocs)
      assert(Set(1L, 2L).contains(firstDoc), "carriers are the shared-prefix docs")
    }
    // the full shared prefix "the quick brown fox" chunk appears in 1, 2, 4
    assert(r.exists(_._2 == 3L))
    // a doc shorter than one chunk still chunks (short tail) without error
    val short = Seq((10L, "tiny doc"), (11L, "tiny doc")).toDF("doc_id", "text")
    val s = Dedup.passageDups(short, chunkTokens = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(s.length == 1 && s.head._2 == 2L)
  }

  test("minhash lsh candidates include exact and near dups") {
    val pairs = Dedup.minhashLsh(docs, 12, 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical signatures, always caught
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(3L, 5L)))
  }

  test("incrementalMinhash reports exactly the cross-split LSH candidates") {
    // split after doc 3: arriving {4, 5} probe existing {1, 2, 3}
    val inc = Dedup.incrementalMinhash(docs, splitId = 4, numHashes = 12, bands = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, o, m) => n -> (o, m) }.toMap
    // doc 4 is an exact dup of 1 and near-dup of 2: best match = 1
    assert(inc.contains(4L) && inc(4L)._1 == 1L && inc(4L)._2 >= 1L)
    // doc 5 matches nothing in the existing corpus
    assert(!inc.contains(5L))
    // consistency: every reported match is a minhashLsh candidate pair
    val full = Dedup.minhashLsh(docs, 12, 3).as[(Long, Long)].collect().toSet
    inc.foreach { case (n, (o, _)) => assert(full.contains((o, n))) }
  }

  test("bucket cap skips giant buckets; duplicateClusters reports them") {
    // 40 identical docs: uncapped => 780 pairs per band-bucket; capped => none
    val many = (1L to 40L).map(i => (i, "same same same text here okay")).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLsh(many, 12, 3).count()
    assert(uncapped == 40L * 39 / 2)
    val capped = Dedup.minhashLsh(many, 12, 3, maxBucket = Some(10)).count()
    assert(capped == 0)
    // full-signature grouping: ONE row for the one 40-doc cluster
    val clusters = Dedup.duplicateClusters(many, 12, minSize = 10)
      .as[(String, Long, Long)].collect()
    assert(clusters.length == 1 && clusters.head._2 == 40 && clusters.head._3 == 1L)
    // bucketClusters reports what the cap skipped (one row per band here)
    val buckets = Dedup.bucketClusters(many, 12, 3, minSize = 10)
      .as[(Int, String, Long, Long)].collect()
    assert(buckets.length == 3 && buckets.forall(b => b._3 == 40 && b._4 == 1L))
  }

  test("bucketClusters catches near-dup clusters whose full signatures differ") {
    // 20 docs sharing most shingles (one token varies) + unrelated docs:
    // full signatures differ for some, but band buckets still collide
    val near = ((1L to 20L).map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta iota v$i")) ++
      Seq((98L, "totally different words entirely here now"), (99L, "another unrelated doc body text"))).toDF("doc_id", "text")
    val buckets = Dedup.bucketClusters(near, 12, 3, minSize = 10)
      .as[(Int, String, Long, Long)].collect()
    assert(buckets.nonEmpty && buckets.forall(_._3 >= 10))
    val exact = Dedup.duplicateClusters(near, 12, minSize = 10).count()
    assert(exact == 0) // signatures differ -> exact-dup report empty, as designed
  }

  test("bandedSignatures rejects invalid band configuration") {
    intercept[IllegalArgumentException] { Dedup.minhashLsh(docs, 12, 16) }
    intercept[IllegalArgumentException] { Dedup.minhashLsh(docs, 13, 3) }
  }

  test("bucketed embedding near-dup is a subset of exact and catches identical vectors") {
    val emb = Seq(
      (1L, Array(1.0f, 0.01f)), (2L, Array(1.0f, 0.01f)),   // identical
      (3L, Array(0.99f, 0.05f)),                            // near 1/2
      (4L, Array(-1.0f, 0.3f)), (5L, Array(0.02f, -1.0f))   // far away
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairs(emb, 9000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val bucketed = Dedup.embeddingPairsBucketed(emb, 9000L, numPlanes = 2, dims = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(exact))
    assert(bucketed.contains((1L, 2L))) // identical vectors always same bucket
  }

  test("shingle df cap kills the hot-shingle m² blowup; hotShingles reports the stop shingles") {
    // 30 docs share one hot phrase (2 shingles with df=30); everything else unique
    val many = (1L to 30L)
      .map(i => (i, s"common hot phrase here unique$i tail$i words$i")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(many, tauScaled = 100000L).count()
    assert(uncapped == 30L * 29 / 2) // every pair linked through the hot shingles
    val capped = Dedup.ngramJaccard(many, tauScaled = 100000L, maxDf = Some(10)).count()
    assert(capped == 0) // stop shingles dropped -> no candidate pairs at all
    val hot = Dedup.hotShingles(many, 10).as[(String, Long, Long)].collect()
    assert(hot.length == 2 && hot.forall(h => h._2 == 30 && h._3 == 1L))
  }

  test("embeddingPairsAuto dispatches all-pairs vs bucketed by corpus size") {
    val emb = Seq(
      (1L, Array(1.0f, 0.01f)), (2L, Array(1.0f, 0.01f)),
      (3L, Array(0.99f, 0.05f)), (4L, Array(-1.0f, 0.3f)), (5L, Array(0.02f, -1.0f))
    ).toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val small = Dedup.embeddingPairsAuto(emb, 9000L, 2, 2, bucketedThreshold = 100L)
    assert(pairs(small) == pairs(Dedup.embeddingPairs(emb, 9000L)))
    val big = Dedup.embeddingPairsAuto(emb, 9000L, 2, 2, bucketedThreshold = 2L)
    assert(pairs(big) == pairs(Dedup.embeddingPairsBucketed(emb, 9000L, 2, 2)))
    // the scale branch must never plan a cartesian/nested-loop join
    val plan = big.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
  }

  test("simhash identical docs have distance 0") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("banded simhash equals all-pairs exactly (pigeonhole)") {
    // varied corpus: near-dups + unrelated docs, threshold up to 3
    val corpus = ((1L to 12L).map(i => (i, s"shared common tokens body text piece w${i % 4}")) ++
      Seq((97L, "outlier entirely different content one"),
        (98L, "outlier entirely different content two"))).toDF("doc_id", "text")
    for (h <- Seq(0, 1, 3)) {
      val exact = Dedup.simhashPairs(corpus, h)
        .as[(Long, Long, Long)].collect().toSet
      val banded = Dedup.simhashPairsBanded(corpus, h)
        .as[(Long, Long, Long)].collect().toSet
      assert(banded == exact, s"maxHamming=$h: banded ${banded.size} vs exact ${exact.size}")
    }
    intercept[IllegalArgumentException] { Dedup.simhashPairsBanded(corpus, 4, 4) }
  }

  test("connectedComponents labels every vertex with its component's min id") {
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L))
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("star-contraction CC equals propagation CC on adversarial shapes") {
    // chain (the propagation worst case: diameter = length), clique,
    // star, two components, crossing ids, isolated pair
    val shapes = Seq(
      (1L to 40L).sliding(2).map(w => (w(0), w(1))).toSeq,        // long chain
      (for (a <- 50L to 56L; b <- (a + 1) to 56L) yield (a, b)),  // clique
      (61L to 70L).map(x => (60L, x)),                            // star at min
      (81L to 90L).map(x => (x, 91L)),                            // star at max
      Seq((100L, 99L), (99L, 98L), (101L, 100L)),                 // reversed chain
      Seq((200L, 300L))
    )
    val edges = shapes.flatten.toDF("a_id", "b_id")
    val star = Dedup.connectedComponentsStar(edges).as[(Long, Long)].collect().toMap
    val prop = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(star == prop)
    assert(star(40L) == 1L && star(91L) == 81L && star(101L) == 98L)
  }

  test("star-contraction CC: empty, self-loop, duplicate edges") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponentsStar(empty).count() == 0)
    val messy = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponentsStar(messy).as[(Long, Long)].collect().toMap
    assert(comp == Map(5L -> 5L, 6L -> 5L))
  }

  test("dedup clusters are consistent with their candidate pairs") {
    val pairs = Dedup.minhashLsh(docs, 12, 3).cache()
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    // both endpoints of every candidate pair share a cluster, and the
    // cluster id is a member doc id
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(comp(a) == comp(b), s"pair ($a,$b) split across clusters")
    }
    comp.values.foreach(c => assert(comp(c) == c, s"cluster id $c is not its own root"))
    // docs 1, 2, 4 are exact/near dups: one cluster rooted at 1
    assert(comp.get(1L).contains(1L) && comp.get(4L).contains(1L))
  }

  test("minhashEstimate: exact dups estimate 1.0 and match exact jaccard") {
    val r = Dedup.minhashEstimate(docs, 12, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // docs 1 and 4 are byte-identical: both estimator and exact are 10^6
    assert(r((1L, 4L)) == ((1000000L, 1000000L)))
    // docs 1 and 2 differ in one trailing token: exact jaccard < 1, and the
    // signature estimate is a multiple of 1/12 in [0, 1]
    val (est12, jac12) = r((1L, 2L))
    assert(jac12 > 0L && jac12 < 1000000L)
    // the estimate is quantized to twelfths: one of matches*10^6 div 12
    val twelfths = (0 to 12).map(m => m * 1000000L / 12L).toSet
    assert(twelfths.contains(est12))
  }

  test("normalizedKeepBest collapses case/punct variants, keeps the longest") {
    val d = Seq(
      (1L, "Hello,   World!", 15L),   // variants of the same normal form
      (2L, "hello world", 11L),
      (3L, "HELLO... world?!", 16L),  // longest -> keeper
      (4L, "something else", 14L)
    ).toDF("doc_id", "text", "n_chars")
    val r = Dedup.normalizedKeepBest(d)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(1L) == ((3L, 3L, 0L)))
    assert(r(2L) == ((3L, 3L, 0L)))
    assert(r(3L) == ((3L, 3L, 1L))) // longest original wins its group
    assert(r(4L) == ((4L, 1L, 1L)))
  }

  test("normalizedKeepBest ties on length go to the smallest id") {
    val d = Seq(
      (9L, "same text", 9L),
      (5L, "SAME TEXT", 9L)
    ).toDF("doc_id", "text", "n_chars")
    val r = Dedup.normalizedKeepBest(d)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r == Map(9L -> 5L, 5L -> 5L))
  }

  test("WordShingles kernel: widths, duplicates, short inputs, codegen parity") {
    import graft.functions.text
    import org.apache.spark.sql.functions.{array_distinct, col, split}
    val df = Seq(
      "a b a b a",      // duplicate shingles kept in raw form
      "one two",        // shorter than the shingle width -> empty
      "",               // no tokens
      "x y z"           // exactly one shingle
    ).toDF("text").select(split(col("text"), " ").as("tk"))
    def run(): Seq[Seq[String]] =
      df.select(text.shingles(col("tk"), 3)).as[Seq[String]].collect().toSeq
    val gen = run()
    assert(gen == Seq(Seq("a b a", "b a b", "a b a"), Seq(), Seq(), Seq("x y z")))
    // per-doc distinct is the narrow array_distinct composition
    val dis = df.select(array_distinct(text.shingles(col("tk"), 3)))
      .as[Seq[String]].collect().toSeq
    assert(dis.head == Seq("a b a", "b a b"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == gen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("B35 dedup_semdedup == exact cosine pairs restricted to shared k-means clusters") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val e = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    // the entry's own training constants, re-run independently
    val (cent, qemb) = graft.operators.KMeans.fitInt(e, k = 10, iters = 3)
    val asg = qemb.select(col("vec_id"),
        graft.functions.centroids.nearestLong(col("q"), cent).getField("label").as("cl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.embeddingPairs(e, 4500L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.queries.DedupQueries.defs("dedup_semdedup")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val expected = exact.filter { case (a, b) => asg(a) == asg(b) }
    assert(got == expected, s"semdedup pairs ${got.size} != cluster-scoped exact ${expected.size}")
    // non-vacuity: the sf0.001 corpus has exact near-dup pairs to scope
    assert(exact.nonEmpty, "no exact cosine pairs at sf0.001 — test is vacuous")
  }

  test("B35b dedup_semdedup_2048 == exact wide cosine pairs restricted to shared k-means clusters") {
    // the B35 pin at the reference width: the wide Lloyd's re-run
    // independently, exact wide all-pairs restricted to shared clusters
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val e = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
    val (cent, qemb) = graft.operators.KMeans.fitInt(e, k = 10, iters = 3)
    val asg = qemb.select(col("vec_id"),
        graft.functions.centroids.nearestLong(col("q"), cent).getField("label").as("cl"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Dedup.embeddingPairs(e, 4500L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.queries.DedupQueries.defs("dedup_semdedup_2048")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val expected = exact.filter { case (a, b) => asg(a) == asg(b) }
    assert(got == expected, s"wide semdedup pairs ${got.size} != cluster-scoped exact ${expected.size}")
    assert(exact.nonEmpty, "no exact wide cosine pairs at sf0.001 — test is vacuous")
  }

  test("B5b dedup_embedding_2048: bucketed wide pairs ⊆ exact wide pairs; identical vectors always pair") {
    // the width dispatch contract: below the threshold the entry IS the
    // exact all-pairs (sf0.001 — checked vs Dedup.embeddingPairs over the
    // wide frame); the bucketed form (forced) is a subset sharing the
    // 2048-slot hyperplane buckets
    val dir = "/root/testdata/sf0.001"
    val e = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
    val exact = Dedup.embeddingPairs(e, 4500L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val entry = graft.queries.DedupQueries.defs("dedup_embedding_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(entry == exact, "below the dispatch threshold the entry must be the exact all-pairs")
    val bucketed = Dedup.embeddingPairsBucketed(e, 4500L, numPlanes = 4,
        dims = graft.queries.HybridQueries.WideDims)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed.subsetOf(exact), "bucketed pairs must be a recall-trading subset")
    assert(exact.nonEmpty)
  }

  test("B36 dedup_span_coverage == independent raw-gram computation") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // independent path: RAW gram strings (no hashing), explode + two aggs
    val g = Tables(spark, dir, "documents")
      .select(col("doc_id"), graft.functions.text.shingles(expr(Dedup.TokExpr), 4).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(col("sh")).as("gram"))
    val nd = g.groupBy("gram").agg(countDistinct("doc_id").as("nd"))
    val expected = g.join(nd, "gram").groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .selectExpr("doc_id", "n_grams", "n_dup", "(n_dup * 1000000) div n_grams AS cov_ppm")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val got = graft.queries.DedupQueries.defs("dedup_span_coverage")(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // non-vacuity: some doc shares a 4-gram with another doc
    assert(got.values.exists(_._2 > 0), "no cross-doc grams at sf0.001 — test is vacuous")
  }

  test("dedup_lsh_sweep: s-curve invariants over the real corpus") {
    val rows = SparkEntry.queries("dedup_lsh_sweep")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // one row per allocation, budget partitioned exactly
    assert(rows.map(_._1) == Seq(2L, 3L, 4L, 6L, 12L))
    assert(rows.forall { case (b, r, _, _, _, _) => b * r == 12L })
    rows.foreach { case (_, _, nCand, nPos, prec, rec) =>
      assert(nPos <= nCand && prec <= 1000000L && rec <= 1000000L)
    }
    // the b=12 (r=1) allocation's candidates are a superset of every
    // other allocation's (a band match at any r implies each component
    // matches) up to the shared hot-bucket cap — its recall leads
    val byBands = rows.map(r => r._1 -> r).toMap
    assert(byBands(12L)._6 >= byBands(2L)._6)
    // narrowing bands can only widen the candidate net at this corpus
    val cands = rows.map(_._3)
    assert(cands.zip(cands.tail).forall { case (a, b) => a <= b }, cands.toString)
    // non-vacuity: the sweep actually verified some true positives
    assert(rows.map(_._4).max > 0)
  }

  test("dedup_minhash_1bit: packed parities, debiased estimate, B20's pair set") {
    val dir = "/root/testdata/sf0.001"
    val one = graft.queries.DedupQueries.defs("dedup_minhash_1bit")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(one.nonEmpty)

    // the 1-bit columns ride along B20's rows: same candidate pairs, same
    // full-width estimate, same exact Jaccard
    val base = graft.queries.DedupQueries.defs("dedup_minhash_est")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(one.map(r => (r._1, r._2, r._3, r._4)).sorted == base)

    // parity reconstruction straight from the signature operator
    val sigs = Dedup.minhashSignatures(
        Tables(spark, dir, "documents"), 12).collect()
      .map(r => r.getLong(0) -> (0 until 12).map(j => r.getLong(1 + j) % 2)).toMap
    one.foreach { case (a, b, _, _, m1, e1) =>
      val m = (0 until 12).count(j => sigs(a)(j) == sigs(b)(j))
      assert(m1 == m, s"pair ($a,$b): n_match1 $m1 vs recomputed $m")
      assert(e1 == math.max(0L, ((2L * m - 12L) * 1000000L) / 12L))
    }
    // the debiased 1-bit estimate tracks the full-width one on true
    // near-dups (est = 1.0 forces every parity to match → est1 = 1.0)
    one.filter(_._3 == 1000000L).foreach { case (_, _, _, _, _, e1) =>
      assert(e1 == 1000000L)
    }
  }

  test("dedup_minhash_bbit_sweep: b=1 row equals the 1-bit entry's aggregate, error shrinks with b") {
    val dir = "/root/testdata/sf0.001"
    val sweep = graft.queries.DedupQueries.defs("dedup_minhash_bbit_sweep")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(sweep.keySet == Set(1L, 2L, 4L, 8L))
    // one pair universe feeds every width
    assert(sweep.values.map(_._1).toSet.size == 1)

    // cross-entry consistency: aggregating dedup_minhash_1bit's per-pair
    // (est1, exact) columns must reproduce the sweep's b=1 row exactly
    val one = graft.queries.DedupQueries.defs("dedup_minhash_1bit")(spark, dir)
      .collect().map(r => (r.getLong(5), r.getLong(3)))
    val errs = one.map { case (e1, jac) => math.abs(e1 - jac) }
    assert(sweep(1L) == ((one.length.toLong, errs.sum / one.length, errs.max)))

    // the fidelity direction on this corpus: quadrupling the bits cuts
    // the mean error (59.3k → 39.1k ppm at the gate scale)
    assert(sweep(1L)._2 > sweep(4L)._2,
      s"mae(b=1)=${sweep(1L)._2} should exceed mae(b=4)=${sweep(4L)._2}")

    // guard: b = 0 (zero debias divisor) and b past the debias-numerator
    // ceiling (numHashes·10⁶·2^b must fit a BIGINT: b ≤ 39 at 12 hashes —
    // r10 ADVICE: Spark would wrap silently above it) refuse loudly
    // before any corpus work
    val d = Tables(spark, dir, "documents")
    for (bad <- Seq(Seq(0), Seq(1, 63), Seq(40), Seq.empty[Int], Seq(2, 2))) {
      val e = intercept[IllegalArgumentException] {
        Dedup.minhashBbitSweep(d, 12, 3, None, bad)
      }
      assert(e.getMessage.contains("bit widths"))
    }
  }
}
