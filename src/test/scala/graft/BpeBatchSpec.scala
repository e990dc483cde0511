package graft

import graft.operators.Bpe

/** B34d/B34e — batched BPE training (top-M mutually-non-interacting merges
  * per scan job) and the end-of-word-marked variant. The driver oracle
  * replays both end-to-end; these specs pin the STRUCTURAL claims the
  * oracle can't see: the ≥64-merges-from-8-jobs bar, the non-interaction
  * invariant inside every accepted batch, batched-vs-sequential agreement
  * where batching is exact, and the eow divergence. */
class BpeBatchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables(spark, dir, "documents")

  test("batched training clears the 64-merge bar in BatchScans scan jobs") {
    val merges = Bpe.trainedBatched(docs, dir)
    assert(merges.length >= 64,
      s"r7 verdict bar: >=64 merges from ${Bpe.BatchScans} scans, got ${merges.length}")
    // one pair-count job per scan → jobs-per-merge strictly better than
    // the sequential trainer's 1.0
    assert(merges.map(_.scan).max <= Bpe.BatchScans)
    assert(Bpe.BatchScans.toDouble / merges.length < 0.15,
      s"jobs-per-merge ${Bpe.BatchScans.toDouble / merges.length}")
    // idx dense 1..k within each scan, rank order preserved
    merges.groupBy(_.scan).foreach { case (s, ms) =>
      assert(ms.map(_.idx).sorted == (1 to ms.length),
        s"scan $s: idx not dense: ${ms.map(_.idx)}")
    }
  }

  test("every accepted batch is mutually non-interacting ({l, r, l||r} triples disjoint)") {
    val merges = Bpe.trainedBatched(docs, dir)
    merges.groupBy(_.scan).foreach { case (s, ms) =>
      val triples = ms.sortBy(_.idx).map(m => Set(m.l, m.r, m.l + m.r))
      for (i <- triples.indices; j <- 0 until i)
        assert((triples(i) & triples(j)).isEmpty,
          s"scan $s: batch members $j and $i interact: ${triples(j)} ∩ ${triples(i)}")
    }
  }

  test("within a scan, counts follow the sequential trainer's rank order") {
    // accepted rules are a subsequence of the (n DESC, l, r) candidate
    // ranking, so counts must be non-increasing within each scan
    Bpe.trainedBatched(docs, dir).groupBy(_.scan).foreach { case (s, ms) =>
      val ns = ms.sortBy(_.idx).map(_.n)
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        s"scan $s: counts not ranked: $ns")
    }
  }

  test("batch 1 rule 1 equals the sequential trainer's first merge (rank-1 always accepted)") {
    val seq = Bpe.trainedMerges(docs, dir)
    val bat = Bpe.trainedBatched(docs, dir)
    val b1 = bat.find(m => m.scan == 1 && m.idx == 1).get
    assert((b1.l, b1.r, b1.n) === (seq.head.l, seq.head.r, seq.head.n))
  }

  test("eow training diverges from unmarked and merges the word-final marker") {
    val plain = Bpe.trainedMerges(docs, dir).map(m => (m.l, m.r))
    val eow = Bpe.trainedMergesEow(docs, dir).map(m => (m.l, m.r))
    assert(plain !== eow, "the marker must change the merge statistics")
    assert(eow.exists { case (l, r) => r == Bpe.EowMarker || r.endsWith(Bpe.EowMarker) },
      s"expected a word-final merge in $eow")
    // the marker never starts a merged symbol's LEFT side before appearing
    // as a right side (it is word-FINAL: nothing follows it)
    assert(eow.forall { case (l, _) => !l.startsWith(Bpe.EowMarker) },
      s"'</w>' can never be followed by another symbol: $eow")
    // every eow word's symbol sequence still ends with the marker
    import spark.implicits._
    val st = Bpe.applyMergeRules(docs, eow, eow = true)
      .selectExpr("syms").as[Seq[String]].collect()
    assert(st.forall(s => s.last.endsWith(Bpe.EowMarker)))
  }

  test("iteration count scales: 16 scans yield 150+ merges on a rich vocabulary") {
    // the production-shape claim behind B34d — merge count grows linearly
    // in scan count at fixed jobs-per-scan (600 distinct synthetic words;
    // the reference python simulation of this exact corpus accepts 184)
    import spark.implicits._
    val docs = (0 until 300).map { i =>
      val w = s"${('a' + i % 17).toChar}${('a' + (i / 17) % 13).toChar}x${i % 7}q${i % 11}"
      (i.toLong, s"$w $w ${('a' + i % 23).toChar}z$i")
    }.toDF("doc_id", "text")
    val (merges, words) = Bpe.trainBatched(docs, scans = 16, batchM = 16, poolC = 64)
    assert(merges.length >= 150, s"got ${merges.length} merges from 16 scans")
    // non-interaction holds in every batch at this depth
    merges.groupBy(_.scan).foreach { case (s, ms) =>
      val triples = ms.sortBy(_.idx).map(m => Set(m.l, m.r, m.l + m.r))
      for (i <- triples.indices; j <- 0 until i)
        assert((triples(i) & triples(j)).isEmpty, s"scan $s interaction")
    }
    // the deep flat rule list still applies as ONE kernel pass ≡ the state
    val direct = Bpe.applyMergeRules(docs, merges.map(m => (m.l, m.r)))
      .selectExpr("word", "syms").as[(String, Seq[String])].collect().toMap
    val trained = words.selectExpr("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(trained === direct)
  }

  test("batched-vocabulary encode: per-doc token counts bounded and compressing") {
    import org.apache.spark.sql.functions._
    val enc = graft.queries.TextQueries.defs("bpe_encode_batched")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.nonEmpty)
    // every word encodes to >= 1 symbol, so n_bpe >= n_ws; and 80+ merges
    // must compress well below character count corpus-wide
    enc.foreach { case (d, nWs, nBpe) =>
      assert(nBpe >= nWs, s"doc $d: $nBpe < $nWs")
    }
    val chars = Tables(spark, dir, "documents")
      .selectExpr(s"explode(${graft.operators.Dedup.TokExpr}) AS w")
      .agg(sum(length(col("w")))).head.getLong(0)
    val totBpe = enc.map(_._3).sum
    assert(totBpe < chars / 2,
      s"batched vocabulary barely compresses: $totBpe symbols vs $chars chars")
  }

  test("deep batched training matches the driver simulation scan-for-scan") {
    // the depth pin behind the thousand-merge ScaleProbe row (r8 verdict
    // next #2): on a 2500-word vocabulary, EVERY scan's accepted batch —
    // pair counts, pool order, greedy disjoint selection, rank order —
    // must equal an independent driver-side simulation of the published
    // selection rule, hundreds of merges deep; and the engine's first
    // merge must equal the sequential trainer's argmax (rank-1 ≡
    // sequential at depth 0, the continuity anchor).
    import spark.implicits._
    val docs = (0 until 2500).map { i =>
      (i.toLong, s"w${i}x${i % 97} w$i y${i % 31}k")
    }.toDF("doc_id", "text")
    val scans = 24; val batchM = 16; val poolC = 128
    val (merges, _) = Bpe.trainBatched(docs, scans, batchM, poolC)
    // ~8.6 accepted/scan on this vocabulary; the ≥10³-merge demonstration
    // itself is the ScaleProbe bpe_train_batched_1k_merges row
    assert(merges.length >= 200, s"expected depth: got ${merges.length}")

    // driver simulation from the same base word table
    val base = Bpe.wordTable(docs)
      .selectExpr("word", "freq", "syms")
      .as[(String, Long, Seq[String])].collect()
    def applyRule(syms: Array[String], l: String, r: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (x <- syms) {
        if (out.nonEmpty && out.last == l && x == r)
          out(out.length - 1) = out.last + x
        else out += x
      }
      out.toArray
    }
    var state = base.map { case (_, f, s) => (f, s.toArray) }
    val sim = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String, String, Long)]
    for (scan <- 1 to scans) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (f, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      val pool = counts.toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.take(poolC)
      val blocked = scala.collection.mutable.Set.empty[String]
      val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var accepted = 0
      for (((l, r), n) <- pool if accepted < batchM) {
        if (!blocked(l) && !blocked(r) && !blocked(l + r)) {
          accepted += 1
          sim += ((scan, accepted, l, r, n))
          batch += ((l, r))
          blocked ++= Seq(l, r, l + r)
        }
      }
      state = state.map { case (f, syms) =>
        (f, batch.foldLeft(syms)((s, m) => applyRule(s, m._1, m._2)))
      }
    }
    val engine = merges.map(m => (m.scan, m.idx, m.l, m.r, m.n))
    assert(engine === sim.toSeq,
      s"engine diverged from the simulation at depth ${merges.length}")
    // continuity anchor: scan 1 rank 1 == the sequential trainer's argmax
    val seq1 = Bpe.train(docs, iters = 1)._1.head
    assert((merges.head.l, merges.head.r, merges.head.n)
      === ((seq1.l, seq1.r, seq1.n)))
  }

  test("batched final state equals the kernel applied to the flat rule list") {
    import spark.implicits._
    val (merges, words) = Bpe.trainBatched(docs)
    val direct = Bpe.applyMergeRules(docs, merges.map(m => (m.l, m.r)))
      .selectExpr("word", "syms").as[(String, Seq[String])].collect().toMap
    val trained = words.selectExpr("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(trained === direct)
  }
}
