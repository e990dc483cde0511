package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** §2.B13–B15 corpus curation: vocabulary cutoff, deterministic mixture
  * sampling, benchmark decontamination. */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = CurationQueries.defs(name)(spark, dir)

  test("text_vocab returns a descending count cutoff with token tiebreak") {
    val rows = q("text_vocab").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    val resorted = rows.sortBy { case (tok, n) => (-n, tok) }
    assert(rows.toSeq == resorted.toSeq, "vocab must arrive ordered by (n desc, tok)")
  }

  test("vocab_tv_drift matches a brute-force total-variation computation") {
    val rows = graft.queries.TextQueries.defs("vocab_tv_drift")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 15)
    // brute force on the driver: same tokenizer, same floor ppm shares
    val byLang = Tables(spark, dir, "documents")
      .filter(col("lang").isin("en", "fr")).select("lang", "text").collect()
      .filter(!_.isNullAt(1))
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.flatMap(_.getString(1).split("\\s+").filter(_.nonEmpty))
          .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      }
    val (ca, cb) = (byLang("en"), byLang("fr"))
    val (ta, tb) = (ca.values.sum, cb.values.sum)
    val ppm = (ca.keySet ++ cb.keySet).map { t =>
      val p = ca.getOrElse(t, 0L) * 1000000L / ta
      val q = cb.getOrElse(t, 0L) * 1000000L / tb
      (t, p, q, math.abs(p - q))
    }
    val tv = ppm.toSeq.map(_._4).sum / 2
    assert(rows.forall(_._5 == tv), s"tv_ppm mismatch: got ${rows.head._5}, exp $tv")
    assert(tv > 0L && tv <= 1000000L, s"TV out of range: $tv")
    val expTop = ppm.toSeq.sortBy { case (t, _, _, d) => (-d, t) }.take(15)
      .map { case (t, p, q, d) => (t, p, q, d, tv) }
    assert(rows.toSeq == expTop, s"got ${rows.toSeq.take(3)}…\nexp ${expTop.take(3)}…")
  }

  test("sample_mixture is deterministic and honors per-source rates") {
    val a = q("sample_mixture").collect().map(_.toSeq).toSet
    val b = q("sample_mixture").collect().map(_.toSeq).toSet
    assert(a == b, "hash-based sampling must be reproducible run-to-run")
    q("sample_mixture").collect().foreach { r =>
      val rate = r.getLong(r.fieldIndex("rate"))
      val bucket = r.getLong(r.fieldIndex("bucket"))
      assert(bucket < rate && rate >= 10 && rate <= 89)
    }
    // the mixture must actually differentiate sources (not one global rate)
    val rates = q("sample_mixture").select("source", "rate").distinct().collect()
      .map(r => r.getLong(1)).toSet
    assert(rates.size > 1)
  }

  test("pii_scrub leaves no digits and counts every masked run") {
    q("pii_scrub").collect().foreach { r =>
      assert(!r.getString(1).exists(_.isDigit), "scrubbed payload must carry no digits")
      assert(r.getLong(2) == r.getString(1).count(_ == '#'),
        "redaction count must equal the masked runs")
    }
  }

  test("sample_group_topk keeps at most 10 docs per source, reproducibly") {
    val a = q("sample_group_topk").collect().map(_.toSeq).toSet
    val b = q("sample_group_topk").collect().map(_.toSeq).toSet
    assert(a == b)
    val bySource = a.groupBy(_.head)
    assert(bySource.nonEmpty)
    bySource.values.foreach(rows => assert(rows.size <= 10))
  }

  test("decontaminate flags only non-benchmark docs above the overlap floor") {
    val docs = Tables(spark, dir, "documents")
    val benchIds = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = q("decontaminate").collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), "benchmark docs must never self-flag")
      assert(r.getLong(1) >= 5)
    }
  }

  test("pack_sequences exactly tiles the token stream, checked against a driver replay") {
    val seqs = q("pack_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(seqs.nonEmpty)
    // driver-side replay of greedy-contiguous packing in doc_id order
    val L = 64L
    val counts = Tables(spark, dir, "documents")
      .selectExpr("doc_id",
        "CAST(size(filter(split(text, '\\\\s+'), x -> x != '')) AS BIGINT) AS n")
      .filter(col("n") > 0).collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var off = 0L
    val expected = counts.flatMap { case (id, n) =>
      val spans = ((off / L) to ((off + n - 1) / L)).map { w =>
        (w, id, math.min((w + 1) * L, off + n) - math.max(w * L, off))
      }
      off += n
      spans
    }.groupBy(_._1).toSeq.map { case (w, rows) =>
      (w, rows.size.toLong, rows.map(_._3).sum, rows.map(_._2).min, rows.map(_._2).max)
    }.sortBy(_._1)
    assert(seqs.toSeq == expected)
    // tiling invariants: contiguous ids, every sequence full except the last
    assert(seqs.map(_._1).toSeq == seqs.indices.map(_.toLong))
    seqs.init.foreach { case (_, _, nt, _, _) => assert(nt == L) }
    assert(seqs.map(_._3).sum == counts.map(_._2).sum)
  }

  test("decontaminate_semantic flags only non-benchmark docs with a real cosine neighbor") {
    val flagged = q("decontaminate_semantic").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.nonEmpty)
    val benchIds = Tables(spark, dir, "documents")
      .filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    flagged.foreach { case (id, nMatches, maxCs) =>
      assert(!benchIds.contains(id), "benchmark docs must never self-flag")
      assert(nMatches >= 1 && maxCs >= 3000L)
    }
    // every flagged doc's best match must be confirmed by an exact,
    // bucket-free cosine against the benchmark set (LSH can only MISS
    // true neighbors, never invent one)
    val e = Tables(spark, dir, "embeddings")
    val bench = e.filter(col("vec_id").isin(benchIds.toSeq: _*))
      .select(col("embedding").as("b_vec"))
    val exact = e.filter(!col("vec_id").isin(benchIds.toSeq: _*))
      .crossJoin(broadcast(bench))
      .withColumn("cs", graft.functions.scaled(
        graft.functions.vectors.cosine(col("embedding"), col("b_vec")), 4))
      .groupBy("vec_id").agg(max("cs").as("best"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    flagged.foreach { case (id, _, maxCs) =>
      assert(exact(id) >= maxCs, "bucketed best can never exceed the exact best")
      assert(exact(id) >= 3000L)
    }
  }

  test("epoch_shuffle: a permutation, balanced shards, rerun-identical") {
    val res = SparkEntry.queries("epoch_shuffle")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables(spark, dir, "documents").count()
    // a PERMUTATION of the corpus: every doc exactly once
    assert(res.length == nDocs && res.map(_._1).distinct.length == nDocs)
    // in-shard positions are contiguous 1..n_s (resumable shard reads)
    res.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // uniform hash → every shard populated, none hot (3× ideal bound)
    val sizes = res.groupBy(_._2).values.map(_.length)
    assert(sizes.size == 16, s"expected 16 shards, got ${sizes.size}")
    assert(sizes.max <= 3 * nDocs.toInt / 16,
      s"hot shard: max ${sizes.max} vs ideal ${nDocs / 16}")
    // deterministic: the rerun reads byte-identical order
    val again = SparkEntry.queries("epoch_shuffle")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(res.sortBy(t => (t._2, t._3)).toSeq == again.sortBy(t => (t._2, t._3)).toSeq)
  }

  test("B14b mixture_temperature: integer isqrt weights, driver-recomputed") {
    import org.apache.spark.sql.functions.col
    val rows = q("mixture_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ts = rows.map(_._3).sum
    rows.foreach { case (lang, nTok, s, wPpm) =>
      assert(s == math.sqrt(nTok.toDouble).floor.toLong, s"$lang: isqrt($nTok) != $s")
      assert(wPpm == s * 1000000L / ts, s"$lang: w_ppm mismatch")
    }
    // α = 1/2 compresses the spread: the weight ratio between the largest
    // and smallest language is the sqrt of their token ratio
    val tokMax = rows.map(_._2).max.toDouble
    val tokMin = rows.map(_._2).min.toDouble
    val wMax = rows.map(_._4).max.toDouble
    val wMin = rows.map(_._4).min.toDouble
    if (tokMin > 0 && wMin > 0)
      assert(wMax / wMin < tokMax / tokMin || tokMax == tokMin,
        "temperature scaling must compress the sampling spread")
    // weights normalize to ~1e6 (integer-floor slack < #langs)
    val wSum = rows.map(_._4).sum
    assert(wSum <= 1000000L && wSum > 1000000L - rows.length)
  }

  test("sample_weighted matches a driver-side bottom-k reconstruction and skews heavy") {
    import spark.implicits._
    val entry = q("sample_weighted").as[(Long, Long, Long)].collect().toSeq
    assert(entry.size == 100)

    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val ranked = Tables(spark, dir, "documents").select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
      .flatMap { case (id, text) =>
        val w = text.split("\\s+").count(_.nonEmpty).toLong
        if (w == 0) None else Some((h60("wsp" + id) / w, id, w))
      }.sorted
    val expect = ranked.take(100).map { case (pri, id, w) => (id, w, pri) }
    assert(entry == expect)

    // the weighting works: heavier docs are overrepresented — the sampled
    // median token count exceeds the corpus median (inclusion ∝ ~w)
    val medAll = ranked.map(_._3).sorted.apply(ranked.size / 2)
    val medSmp = expect.map(_._2).sorted.apply(expect.size / 2)
    assert(medSmp > medAll,
      s"weighted sample median $medSmp must exceed corpus median $medAll")
    // and the rank rule is exactly H div w (bottom-k sketch property:
    // the sample is mergeable — min-rank unions commute)
    assert(entry.forall { case (id, w, pri) => h60("wsp" + id) / w == pri })

    // the mergeability LAW the streaming form relies on: bottom-k of the
    // whole corpus equals bottom-k of the union of per-shard bottom-k's
    // (so a distributed or incremental fold can never change the sample)
    val (shard1, shard2) = ranked.partition(_._2 % 2 == 0)
    val merged = (shard1.take(100) ++ shard2.take(100)).sorted.take(100)
    assert(merged == ranked.take(100))
  }

  test("sample_stratified: largest-remainder quotas, hash-order members, exact K") {
    import spark.implicits._
    val entry = q("sample_stratified").as[(String, Long, Long)].collect().toSeq
    assert(entry.size == 50, "allocation must sum to exactly K")

    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val docs = Tables(spark, dir, "documents").select("doc_id", "lang")
      .as[(Long, String)].collect().toSeq
    val byLang = docs.groupBy(_._2)
    val n = docs.size.toLong
    // Hamilton / largest-remainder allocation, ties to the lower lang
    val base = byLang.map { case (l, v) => l -> (50L * v.size / n, 50L * v.size % n) }
    val extras = 50L - base.values.map(_._1).sum
    val bumped = base.toSeq.sortBy { case (l, (_, r)) => (-r, l) }
      .take(extras.toInt).map(_._1).toSet
    val quotas = base.map { case (l, (b, _)) => l -> (b + (if (bumped(l)) 1L else 0L)) }
    val expect = byLang.toSeq.flatMap { case (l, v) =>
      v.map { case (id, _) => (h60("str" + id), id) }.sorted
        .take(quotas(l).toInt).map { case (_, id) => (l, id, quotas(l)) }
    }.sortBy(t => (t._1, t._2))
    assert(entry.sortBy(t => (t._1, t._2)) == expect)

    // proportionality: every stratum's share is within one doc of exact
    byLang.foreach { case (l, v) =>
      val exact = 50.0 * v.size / n
      assert(math.abs(quotas(l) - exact) < 1.0,
        s"$l quota ${quotas(l)} vs exact share $exact")
    }
  }
}
