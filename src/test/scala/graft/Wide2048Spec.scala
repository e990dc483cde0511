package graft

import graft.queries.HybridQueries

/** A45/A45b: the 2048-d gate entries (the reference's actual build
  * dimensionality, reference acorn.py:30–40). These specs re-derive both
  * results from an INDEPENDENT plain-Scala reconstruction — the wide
  * construction, the float rounds, and the sequential float→double L2
  * accumulation all re-implemented without Spark expressions — so an
  * engine-side expression bug and its oracle transliteration cannot
  * cancel out (the FunnelSpec convention).
  */
class Wide2048Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = HybridQueries.defs(name)(spark, dir)

  private val Dims = 64
  private val WideDims = 2048

  /** wide[j] = base[((j%64)+(j/64))%64] · ((j/64)%5 + (j%64)%3 + 1),
    * one float round — plain Scala, no Spark. */
  private def widen(base: Array[Float]): Array[Float] =
    Array.tabulate(WideDims) { j =>
      val src = ((j % Dims) + (j / Dims)) % Dims
      val mult = (j / Dims) % 5 + (j % Dims) % 3 + 1
      (base(src).toDouble * mult).toFloat
    }

  /** floor(||a − b||·10⁴ + 0.5) with the kernel's exact accumulation:
    * per-element float→double widen, sequential double sum. */
  private def l2Scaled(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    math.floor(math.sqrt(acc) * 10000 + 0.5).toLong
  }

  private def wideCorpus(): Map[Long, Array[Float]] =
    Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> widen(r.getSeq[Float](1).toArray)).toMap

  test("knn_exact_l2_2048 equals the plain-Scala 2048-d reconstruction (self excluded)") {
    val w = wideCorpus()
    assert(w.values.head.length == WideDims)
    val qv = w(0L)
    val expect = w.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = q("knn_exact_l2_2048").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("knn_hnsw_2048: saturated persisted 2048-d graph walk equals exact (self included)") {
    val w = wideCorpus()
    val qv = w(13L)
    val expect = w.toSeq
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = q("knn_hnsw_2048").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    // the walk found the query itself — it is an indexed item
    assert(got.exists { case (id, s) => id == 13L && s == 0L })
  }

  test("knn_sq8_2048 equals the plain-Scala wide sq8 reconstruction") {
    // r12 (r11 verdict "what's missing" #2): the funnel's int8 arithmetic
    // at the reference width — corpus-wide (mn, mx), 0..255 codes,
    // integer squared-L2, ties to the lower id
    val w = wideCorpus()
    val mn = w.valuesIterator.map(_.iterator.map(_.toDouble).min).min
    val mx = w.valuesIterator.map(_.iterator.map(_.toDouble).max).max
    def sq8(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(((x.toDouble - mn) * 255.0) / (mx - mn)).toLong)
    val qb = sq8(w(0L))
    val expect = w.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        val qa = sq8(v)
        var d = 0L; var i = 0
        while (i < qa.length) { val x = qa(i) - qb(i); d += x * x; i += 1 }
        (id, d)
      }
      .sortBy { case (id, d) => (d, id) }.take(10)
    val got = SparkEntry.queries("knn_sq8_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("hybrid_knn_pq_2048 returns only filter-qualified vectors, subset of the keep-pruned corpus") {
    // the ACORN composition at width: the oracle hash-gates the full
    // pipeline; this pins the filter contract — every hit qualifies,
    // the query itself is excluded
    val rows = SparkEntry.queries("hybrid_knn_pq_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.size == 10)
    val keep = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("lang").isNotNull &&
        org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.forall { case (id, _) => keep.contains(id) && id != 0L },
      "a non-qualified vector (or the query) leaked through the filtered wide PQ")
  }

  test("knn_cascade_2048 equals the plain-Scala wide three-stage funnel") {
    // the full funnel at the reference width: 64-long packed sign codes,
    // Hamming cut, sq8 cut under corpus-wide calibration, exact cosine —
    // reconstructed without Spark expressions (the FunnelSpec convention)
    val (s1n, s2n, qid) = (100, 25, 3L)
    val w = wideCorpus()
    val wd = w.map { case (id, v) => id -> v.map(_.toDouble) }
    def pack(v: Array[Float]): Array[Long] =
      Array.tabulate(64) { g =>
        var acc = 0L; var j = 0
        while (j < 32) { if (v(g * 32 + j) > 0.0f) acc |= (1L << j); j += 1 }
        acc
      }
    val p = w.map { case (id, v) => id -> pack(v) }
    val qp = p(qid); val qv = wd(qid)
    val mn = wd.valuesIterator.map(_.min).min
    val mx = wd.valuesIterator.map(_.max).max
    val s1 = wd.keys.filter(_ != qid).map { id =>
      val ham = p(id).zip(qp).map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum.toLong
      (ham, id)
    }.toSeq.sorted.take(s1n)
    def sq8(x: Double): Long = math.floor(((x - mn) * 255.0) / (mx - mn)).toLong
    val qb = qv.map(sq8)
    val s2 = s1.map { case (ham, id) =>
      val qa = wd(id).map(sq8)
      var d = 0L; var i = 0
      while (i < qa.length) { val x = qa(i) - qb(i); d += x * x; i += 1 }
      (d, id, ham)
    }.sorted.take(s2n)
    val fin = s2.map { case (d8, id, ham) =>
      val v = wd(id)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) { dot += v(i) * qv(i); na += v(i) * v(i); nb += qv(i) * qv(i); i += 1 }
      (-math.floor((dot / (math.sqrt(na) * math.sqrt(nb))) * 10000 + 0.5).toLong, id, d8, ham)
    }.sorted.take(10).map { case (ns, id, d8, ham) => (id, -ns, d8, ham) }
    val got = SparkEntry.queries("knn_cascade_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == fin)
  }

  test("knn_ivf_cascade_2048 equals the plain-Scala probe-restricted wide funnel") {
    // A46g: the knn_cascade_2048 reconstruction with the stage-1 body
    // pruned to the two nearest wide-centroid clusters; calibration and
    // the query stay corpus-wide
    val (s1n, s2n, qid, nProbe) = (50, 25, 3L, 2)
    val w = wideCorpus()
    val wd = w.map { case (id, v) => id -> v.map(_.toDouble) }
    val labels = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents: Map[Long, Array[Float]] = wd.groupBy { case (id, _) => labels(id) }
      .map { case (lbl, m) =>
        val vs = m.values.toSeq
        lbl -> Array.tabulate(WideDims)(d => (vs.map(_(d)).sum / vs.size).toFloat)
      }
    def cosScaledF(a: Array[Float], b: Array[Float]): Long = {
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      math.floor(dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum)) * 10000.0 + 0.5).toLong
    }
    val probed = cents.toSeq
      .map { case (lbl, c) => (-cosScaledF(c, w(qid)), lbl) }.sorted.take(nProbe)
      .map(_._2).toSet
    def pack(v: Array[Float]): Array[Long] =
      Array.tabulate(64) { g =>
        var acc = 0L; var j = 0
        while (j < 32) { if (v(g * 32 + j) > 0.0f) acc |= (1L << j); j += 1 }
        acc
      }
    val p = w.map { case (id, v) => id -> pack(v) }
    val qp = p(qid); val qv = wd(qid)
    val mn = wd.valuesIterator.map(_.min).min
    val mx = wd.valuesIterator.map(_.max).max
    val s1 = wd.keys.filter(id => id != qid && probed.contains(labels(id))).map { id =>
      val ham = p(id).zip(qp).map { case (a, b) => java.lang.Long.bitCount(a ^ b) }.sum.toLong
      (ham, id)
    }.toSeq.sorted.take(s1n)
    def sq8(x: Double): Long = math.floor(((x - mn) * 255.0) / (mx - mn)).toLong
    val qb = qv.map(sq8)
    val s2 = s1.map { case (ham, id) =>
      val qa = wd(id).map(sq8)
      var d = 0L; var i = 0
      while (i < qa.length) { val x = qa(i) - qb(i); d += x * x; i += 1 }
      (d, id, ham)
    }.sorted.take(s2n)
    val fin = s2.map { case (d8, id, ham) =>
      val v = wd(id)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < v.length) { dot += v(i) * qv(i); na += v(i) * v(i); nb += qv(i) * qv(i); i += 1 }
      (-math.floor((dot / (math.sqrt(na) * math.sqrt(nb))) * 10000 + 0.5).toLong, id, d8, ham)
    }.sorted.take(10).map { case (ns, id, d8, ham) => (id, -ns, d8, ham) }
    val got = SparkEntry.queries("knn_ivf_cascade_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == fin)
    assert(got.forall { case (id, _, _, _) => probed.contains(labels(id)) },
      "a result outside the probed clusters leaked through")
  }

  test("recall_cascade_2048 is monotone in stage-1 width and recovers exact at the widest") {
    // the A43c contract at the reference width: one Hamming ranking feeds
    // every width; the aggregate curve climbs (33→51→68→77 of 80 at
    // sf0.001, measured with margin)
    val rows = SparkEntry.queries("recall_cascade_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val widths = Seq(25L, 50L, 100L, 200L)
    assert(rows.map(_._1).distinct.sorted == widths)
    assert(rows.size == widths.size * 8)
    val totals = widths.map(w => rows.filter(_._1 == w).map(_._3).sum)
    assert(totals.zip(totals.tail).forall { case (a, b) => a <= b },
      s"aggregate recall not monotone: $totals")
    assert(totals.last >= 60, s"recall@w=200 total ${totals.last} < 60/80")
  }

  test("knn_pq_2048 equals the plain-Scala wide ADC + rerank reconstruction") {
    // the compressed family at the reference width: 16 subspaces ×
    // 128 dims, 64 seeded codewords, ADC shortlist of 100, exact rerank —
    // every cut integer-exact with ties to the lower id/code
    val (numSub, subDim, numCodes, shortlist) = (16, 128, 64, 100)
    val w = wideCorpus()
    val wd = w.map { case (id, v) => id -> v.map(_.toDouble) }
    def sqdFloor(a: Array[Double], off: Int, cw: Array[Double]): Long = {
      var acc = 0.0; var i = 0
      while (i < cw.length) { val d = a(off + i) - cw(i); acc += d * d; i += 1 }
      math.floor(acc * 10000.0).toLong
    }
    val cb: Map[(Int, Long), Array[Double]] =
      (for (code <- 0L until numCodes; m <- 0 until numSub)
        yield (m, code) -> wd(code).slice(m * subDim, (m + 1) * subDim)).toMap
    val qv = wd(0L)
    val adc = cb.map { case ((m, c), cw) => (m, c) -> sqdFloor(qv, m * subDim, cw) }
    val short = wd.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      var asum = 0L
      for (m <- 0 until numSub) {
        val best = (0L until numCodes)
          .map(c => (sqdFloor(v, m * subDim, cb((m, c))), c)).min
        asum += adc((m, best._2))
      }
      (asum, id)
    }.sorted.take(shortlist).map(_._2)
    val expect = short
      .map(id => (id, l2Scaled(w(id), w(0L))))
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = SparkEntry.queries("knn_pq_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("knn_ivfpq_2048 equals the plain-Scala wide probe + ADC + rerank reconstruction") {
    // A46f: the coarse quantizer at width — 2048-d centroids, scaled-
    // cosine probe ranking (desc, label asc), then the knn_pq_2048
    // pipeline restricted to the probed clusters' members
    val (numSub, subDim, numCodes, shortlist, nProbe) = (16, 128, 64, 100, 2)
    val w = wideCorpus()
    val wd = w.map { case (id, v) => id -> v.map(_.toDouble) }
    val labels = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per-label mean over the wide doubles, one float round per dim
    val cents: Map[Long, Array[Float]] = wd.groupBy { case (id, _) => labels(id) }
      .map { case (lbl, m) =>
        val vs = m.values.toSeq
        lbl -> Array.tabulate(WideDims)(d => (vs.map(_(d)).sum / vs.size).toFloat)
      }
    def cosScaled(a: Array[Float], b: Array[Float]): Long = {
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      val na = math.sqrt(ad.map(x => x * x).sum); val nb = math.sqrt(bd.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 10000.0 + 0.5).toLong
    }
    val probed = cents.toSeq
      .map { case (lbl, c) => (-cosScaled(c, w(0L)), lbl) }.sorted.take(nProbe)
      .map(_._2).toSet
    val keep = labels.collect { case (id, lbl) if probed.contains(lbl) => id }.toSet
    def sqdFloor(a: Array[Double], off: Int, cw: Array[Double]): Long = {
      var acc = 0.0; var i = 0
      while (i < cw.length) { val d = a(off + i) - cw(i); acc += d * d; i += 1 }
      math.floor(acc * 10000.0).toLong
    }
    val cb: Map[(Int, Long), Array[Double]] =
      (for (code <- 0L until numCodes; m <- 0 until numSub)
        yield (m, code) -> wd(code).slice(m * subDim, (m + 1) * subDim)).toMap
    val qv = wd(0L)
    val adc = cb.map { case ((m, c), cw) => (m, c) -> sqdFloor(qv, m * subDim, cw) }
    val short = wd.toSeq.filter { case (id, _) => id != 0L && keep.contains(id) }
      .map { case (id, v) =>
        var asum = 0L
        for (m <- 0 until numSub) {
          val best = (0L until numCodes)
            .map(c => (sqdFloor(v, m * subDim, cb((m, c))), c)).min
          asum += adc((m, best._2))
        }
        (asum, id)
      }.sorted.take(shortlist).map(_._2)
    val expect = short
      .map(id => (id, l2Scaled(w(id), w(0L))))
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = SparkEntry.queries("knn_ivfpq_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.forall { case (id, _) => keep.contains(id) },
      "a result outside the probed clusters leaked through")
  }

  test("knn_ivfpq_residual_2048 equals the plain-Scala integer residual reconstruction") {
    // A42d: the full residual composition at width, re-derived without
    // Spark expressions — quantize, floor-mean centroids, integer probe,
    // residual transform, seeded codebook, argmin encode, per-cluster
    // ADC, exact integer rerank.
    val (numSub, subDim, numCodes, nProbe, shortlist) = (16, 128, 16, 2, 100)
    val w = wideCorpus()
    val qz: Map[Long, Array[Long]] = w.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    }
    val labels = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents: Map[Long, Array[Long]] = qz.groupBy { case (id, _) => labels(id) }
      .map { case (lbl, m) =>
        val vs = m.values.toSeq
        lbl -> Array.tabulate(WideDims)(d => Math.floorDiv(vs.map(_(d)).sum, vs.size))
      }
    def sqd(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val qv = qz(0L)
    val probed = cents.toSeq.map { case (l, c) => (sqd(c, qv), l) }
      .sortBy { case (d, l) => (d, l) }.take(nProbe).map(_._2)
    val resOf: Long => Array[Long] = id => {
      val v = qz(id); val c = cents(labels(id))
      Array.tabulate(WideDims)(i => v(i) - c(i))
    }
    val cb: Map[(Int, Long), Array[Long]] =
      (for (code <- 0L until numCodes; m <- 0 until numSub)
        yield (m, code) -> resOf(code).slice(m * subDim, (m + 1) * subDim)).toMap
    val bodyIds = qz.keys.filter(id => id != 0L && probed.contains(labels(id))).toSeq
    val adc: Map[(Long, Int, Long), Long] = (for {
      l <- probed
      qr = Array.tabulate(WideDims)(i => qv(i) - cents(l)(i))
      m <- 0 until numSub
      code <- 0L until numCodes
    } yield (l, m, code) -> sqd(qr.slice(m * subDim, (m + 1) * subDim), cb((m, code)))).toMap
    val short = bodyIds.map { id =>
      val r = resOf(id)
      var asum = 0L
      for (m <- 0 until numSub) {
        val best = (0L until numCodes)
          .map(c => (sqd(r.slice(m * subDim, (m + 1) * subDim), cb((m, c))), c)).min
        asum += adc((labels(id), m, best._2))
      }
      (asum, id)
    }.sorted.take(shortlist).map(_._2)
    val expect = short.map(id => (id, sqd(qz(id), qv)))
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = SparkEntry.queries("knn_ivfpq_residual_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.forall { case (id, _) => probed.contains(labels(id)) },
      "a result outside the probed clusters leaked through")
  }

  test("knn_pq_trained_2048 equals the plain-Scala Lloyd's + ADC + rerank reconstruction") {
    // A25b: the 2-iteration per-subspace k-means, the encode, the ADC
    // shortlist and the exact integer rerank, all re-derived without
    // Spark expressions at d=2048.
    val (numSub, subDim, numCodes, iters, sampleMax, shortlist) = (16, 128, 16, 2, 256, 100)
    val w = wideCorpus()
    val qz: Map[Long, Array[Long]] = w.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    }
    def sqd(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * subDim, (m + 1) * subDim)
    val sample = qz.filter(_._1 < sampleMax)
    val seedIds = sample.keys.toSeq.sorted.take(numCodes)
    var cb: Map[(Int, Long), Array[Long]] =
      (for (m <- 0 until numSub; (sid, c) <- seedIds.zipWithIndex)
        yield (m, c.toLong) -> sub(qz(sid), m)).toMap
    for (_ <- 0 until iters) {
      val assigned: Seq[((Int, Long), Array[Long])] = sample.toSeq.flatMap { case (_, v) =>
        (0 until numSub).map { m =>
          val s = sub(v, m)
          val best = (0L until numCodes).map(c => (sqd(s, cb((m, c))), c)).min._2
          (m, best) -> s
        }
      }
      val next = assigned.groupBy(_._1).map { case (key, grp) =>
        val vs = grp.map(_._2)
        key -> Array.tabulate(subDim)(d => Math.floorDiv(vs.map(_(d)).sum, vs.size))
      }
      cb = cb.map { case (key, cw) => key -> next.getOrElse(key, cw) }
    }
    val qv = qz(0L)
    val adc = cb.map { case ((m, c), cw) => (m, c) -> sqd(sub(qv, m), cw) }
    val short = qz.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      var asum = 0L
      for (m <- 0 until numSub) {
        val best = (0L until numCodes).map(c => (sqd(sub(v, m), cb((m, c))), c)).min._2
        asum += adc((m, best))
      }
      (asum, id)
    }.sorted.take(shortlist).map(_._2)
    val expect = short.map(id => (id, sqd(qz(id), qv)))
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = SparkEntry.queries("knn_pq_trained_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("knn_pq_batch_wide_2048: per-query results equal the single-query wide pipeline") {
    // A21g: the O(1)-plan batch machinery at width — query 0's slice of
    // the batch result must be bit-identical to knn_pq_2048 (same seeded
    // codebook, same shortlist/rerank tie orders)
    val batch = SparkEntry.queries("knn_pq_batch_wide_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch.map(_._1).distinct.sorted == (0L until 8L),
      "every query in the file must be answered")
    assert(batch.groupBy(_._1).forall(_._2.size == 10))
    val q0 = batch.filter(_._1 == 0L).sortBy(_._3).map(t => (t._2, t._4))
    val single = SparkEntry.queries("knn_pq_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q0 == single)
  }

  test("knn_ivfsq_2048 equals the plain-Scala probe-restricted sq8 + rerank reconstruction") {
    // A44b: wide centroids → scaled-cosine probe (desc, label asc) →
    // corpus-wide-calibrated int8 ranking of probed members → exact
    // cosine rerank of the 40-row shortlist
    val (nProbe, shortlistN) = (2, 40)
    val w = wideCorpus()
    val wd = w.map { case (id, v) => id -> v.map(_.toDouble) }
    val labels = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents: Map[Long, Array[Float]] = wd.groupBy { case (id, _) => labels(id) }
      .map { case (lbl, m) =>
        val vs = m.values.toSeq
        lbl -> Array.tabulate(WideDims)(d => (vs.map(_(d)).sum / vs.size).toFloat)
      }
    def cosScaled(a: Array[Float], b: Array[Float]): Long = {
      val (ad, bd) = (a.map(_.toDouble), b.map(_.toDouble))
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      math.floor(dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum)) * 10000.0 + 0.5).toLong
    }
    val probed = cents.toSeq
      .map { case (lbl, c) => (-cosScaled(c, w(0L)), lbl) }.sorted.take(nProbe)
      .map(_._2).toSet
    val mn = wd.valuesIterator.map(_.min).min
    val mx = wd.valuesIterator.map(_.max).max
    def sq8(x: Double): Long = math.floor(((x - mn) * 255.0) / (mx - mn)).toLong
    val qb = wd(0L).map(sq8)
    val short = wd.toSeq
      .filter { case (id, _) => id != 0L && probed.contains(labels(id)) }
      .map { case (id, v) =>
        val qa = v.map(sq8)
        var d = 0L; var i = 0
        while (i < qa.length) { val x = qa(i) - qb(i); d += x * x; i += 1 }
        (d, id)
      }.sorted.take(shortlistN)
    def cosScaledD(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000.0 + 0.5).toLong
    }
    val expect = short.map { case (d8, id) =>
      (-cosScaledD(wd(id), wd(0L)), id, d8)
    }.sorted.take(10).map { case (ns, id, d8) => (id, -ns, d8) }
    val got = SparkEntry.queries("knn_ivfsq_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    assert(got.forall { case (id, _, _) => probed.contains(labels(id)) },
      "a result outside the probed clusters leaked through")
  }

  test("hybrid_knn_hnsw_2hop_2048: two-hop ≥ one-hop at equal budgets AT WIDTH, saturated ≡ exact") {
    // A45d: the bridge's budget economics re-measured at d=2048 — every
    // bridged hop pays a 32× costlier distance than at d=64, so the
    // flag must re-earn its keep at the width the reference builds
    import org.apache.spark.sql.functions.{coalesce, lit}
    import spark.implicits._
    val c = org.apache.spark.sql.functions.col _
    val pred = graft.operators.MetaPredicate(
      "lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
    val w = wideCorpus()
    val qv = w(17L)
    val passing = Tables(spark, dir, "documents").filter(pred)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = w.toSeq
      .filter { case (id, _) => id != 17L && passing.contains(id) }
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10).map(_._1).toSet
    val wideDf = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      .select(c("vec_id"),
        graft.functions.vectors.widen(c("embedding"), Dims, WideDims).as("embedding"))
    val corpus = wideDf.filter(c("vec_id") =!= 17)
      .join(Tables(spark, dir, "documents").filter(pred)
        .select(c("doc_id"), lit(true).as("pass")),
        c("vec_id") === c("doc_id"), "left")
      .select(c("vec_id"), c("embedding"), coalesce(c("pass"), lit(false)).as("pass"))
      .repartition(8, c("vec_id"))
      .localCheckpoint(true)
    def recall(budget: Int, twoHop: Boolean): Int =
      graft.operators.Hnsw.searchFilteredPerPartition(corpus, qv, 10,
          metaSearch = budget, twoHop = twoHop)
        .select("vec_id").as[Long].collect().toSet.intersect(exact).size
    val budgets = Seq(4, 8, 16, 32, 64)
    val curve = budgets.map(b => (b, recall(b, twoHop = false), recall(b, twoHop = true)))
    info(s"WIDTH budget -> (one-hop, two-hop) recall@10: " +
      curve.map { case (b, o, t) => s"$b->($o,$t)" }.mkString(", "))
    curve.foreach { case (b, one, two) =>
      assert(two >= one, s"budget $b: two-hop recall $two < one-hop $one at width")
    }
    // saturated walks are exact and flag-independent at width too
    val got = SparkEntry.queries("hybrid_knn_hnsw_2hop_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = w.toSeq
      .filter { case (id, _) => id != 17L && passing.contains(id) }
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    assert(got == expect)
  }

  test("hybrid_knn_hnsw_2048: saturated wide ACORN walk equals the exact prefilter") {
    // A45c: the filtered graph walk at width — at the saturating sentinel
    // the result is the exact top-10 of the predicate-passing wide rows
    val w = wideCorpus()
    val qv = w(11L)
    val passing = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("lang").isNotNull &&
        org.apache.spark.sql.functions.col("lang") === "zh")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expect = w.toSeq
      .filter { case (id, _) => id != 11L && passing.contains(id) }
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = SparkEntry.queries("hybrid_knn_hnsw_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(got.forall { case (id, _) => passing.contains(id) },
      "a predicate-failing row leaked into the filtered walk's result")
  }

  // ---- round 14: the batch×width closure + persisted wide codes --------

  test("knn_ivfpq_batch_wide_2048: per-query slice equals the single-query wide composition") {
    // A24d: the label-keyed broadcast (q_id, label, tds) relation at
    // width — query 0's slice must be bit-identical to knn_ivfpq_2048
    // (same wide centroids, same probe tie order, same seeded codebook)
    val batch = SparkEntry.queries("knn_ivfpq_batch_wide_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch.map(_._1).distinct.sorted == (0L until 8L),
      "every query in the file must be answered")
    assert(batch.groupBy(_._1).forall(_._2.size == 10))
    val q0 = batch.filter(_._1 == 0L).sortBy(_._3).map(t => (t._2, t._4))
    val single = SparkEntry.queries("knn_ivfpq_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q0 == single)
  }

  test("knn_ivfpq_residual_batch_wide_2048: per-query slice equals the single-query residual path") {
    // A42e: the FAISS-default encoding, amortized at width — query 0's
    // slice ≡ knn_ivfpq_residual_2048 (integer-exact end to end, so
    // equality is bit-equality, not approximate)
    val batch = SparkEntry.queries("knn_ivfpq_residual_batch_wide_2048")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch.map(_._1).distinct.sorted == (0L until 8L))
    assert(batch.groupBy(_._1).forall(_._2.size == 10))
    val q0 = batch.filter(_._1 == 0L).sortBy(_._3).map(t => (t._2, t._4))
    val single = SparkEntry.queries("knn_ivfpq_residual_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q0 == single)
  }

  test("knn_pq_persisted_2048: the stored-code serve equals the fresh wide pipeline") {
    // A21h: build→store→restore→serve must not change a single row vs
    // the in-memory encode path at the same constants (the A21e pin, at
    // the reference width — FLOAT wide vectors and long codes round-trip
    // parquet exactly)
    val served = SparkEntry.queries("knn_pq_persisted_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fresh = graft.operators.Pq.searchRerank(
        HybridQueries.wideEmbeddings(spark, dir), qid = 9, k = 10,
        numSub = 16, subDim = 128, numCodes = 64, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == fresh)
    assert(served.size == 10)
  }

  /** floor(cos(a,b)·10⁴ + 0.5) with the CosineSimilarity kernel's exact
    * arithmetic: sequential double dot and norms, then / (√na · √nb). */
  private def cosScaled(a: Array[Float], b: Array[Float]): Long = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5).toLong
  }

  test("ann_lsh_multiprobe_2048 equals the plain-Scala 1-flip reconstruction; single-bucket ⊆ ball") {
    // A31b: buckets re-derived from the same md5 plane constants at
    // d=2048, candidates = the 1-flip Hamming ball, top-5 by scaled
    // cosine desc then id asc — entirely without Spark expressions
    val w = wideCorpus()
    def bucket(v: Array[Float]): Long =
      (0 until 4).map { j =>
        val pw = graft.operators.Lsh.planeWeights(j, WideDims)
        var acc = 0.0; var i = 0
        while (i < WideDims) { acc += v(i).toDouble * pw(i).toDouble; i += 1 }
        if (acc > 0) 1L << j else 0L
      }.sum
    val qv = w(3L); val qb = bucket(qv)
    val ball = w.toSeq.filter { case (id, v) =>
      id != 3L && java.lang.Long.bitCount(bucket(v) ^ qb) <= 1 }
    val expect = ball.map { case (id, v) => (id, cosScaled(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    val got = SparkEntry.queries("ann_lsh_multiprobe_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    // the superset law at width: the single-bucket operator's answers all
    // sit inside the 1-flip ball the multi-probe scan searched
    val singleIds = graft.operators.Lsh.annSearch(
        HybridQueries.wideEmbeddings(spark, dir)
          .filter(org.apache.spark.sql.functions.col("vec_id") =!= 3L),
        HybridQueries.wideEmbeddings(spark, dir)
          .filter(org.apache.spark.sql.functions.col("vec_id") === 3L)
          .select(org.apache.spark.sql.functions.col("embedding").as("q_vec")),
        5, 4, WideDims)
      .collect().map(_.getLong(0)).toSet
    val ballIds = ball.map(_._1).toSet
    assert(singleIds.subsetOf(ballIds),
      "a single-bucket answer fell outside the 1-flip ball")
  }

  test("knn_pq_append_2048: appended wide index equals a full fresh rebuild at serve") {
    // A21i: base+append serve ≡ the fresh whole-corpus pipeline at the
    // same stored-codebook constants (codeword seeds sit in the base
    // half; encode is per-row independent) — the A21f pin at width
    val served = SparkEntry.queries("knn_pq_append_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fresh = graft.operators.Pq.searchRerank(
        HybridQueries.wideEmbeddings(spark, dir), qid = 5, k = 10,
        numSub = 16, subDim = 128, numCodes = 64, shortlist = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == fresh)
  }

  test("knn_pq_batch_sharded_2048: the cap-and-union passes equal one uncapped wide pass") {
    // A21j: every q_id lands in exactly one shard, so the 3-pass union is
    // row-identical to the single wide pass at the same 8-query file
    val sharded = SparkEntry.queries("knn_pq_batch_sharded_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val one = SparkEntry.queries("knn_pq_batch_wide_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sharded == one)
  }

  test("knn_ivfpq_batch_sharded_2048: the cap-and-union passes equal one uncapped wide pass") {
    // A24e: per-query probes are independent, so every q_id lands in
    // exactly one shard and the 3-pass union is row-identical to the
    // single wide pass over the same 8-query file
    val sharded = SparkEntry.queries("knn_ivfpq_batch_sharded_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val one = SparkEntry.queries("knn_ivfpq_batch_wide_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sharded == one)
  }

  test("knn_ivfpq_residual_batch_sharded_2048: the cap-and-union passes equal one uncapped wide pass") {
    // A42f: rows encode against their OWN centroid, so the encode is
    // chunk-independent too — union ≡ one pass, bit-identical
    val sharded = SparkEntry.queries("knn_ivfpq_residual_batch_sharded_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val one = SparkEntry.queries("knn_ivfpq_residual_batch_wide_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(sharded == one)
  }

  test("knn_hnsw_batch_2048 equals the plain-Scala per-query exact top-3 (self included)") {
    // A35i: the persisted wide graphs at the saturating beam answer the
    // whole query file exactly — every (q_id, rank) cell replayed from
    // the no-Spark reconstruction
    val w = wideCorpus()
    val got = SparkEntry.queries("knn_hnsw_batch_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(t => (t._1, t._3))
    val expect = (0L to 4L).flatMap { qid =>
      w.toSeq.map { case (id, v) => (id, l2Scaled(v, w(qid))) }
        .sortBy { case (id, s) => (s, id) }.take(3).zipWithIndex
        .map { case ((id, s), i) => (qid, id, (i + 1).toLong, s) }
    }
    assert(got == expect)
  }

  test("knn_hnsw_external_2048 equals the plain-Scala external-midpoint reconstruction (no exclusion)") {
    // A49: the midpoint derives OUTSIDE the corpus ((w0+w1)/2, one float
    // round), the saturated walk is exact, and no corpus row is excluded
    val w = wideCorpus()
    val qv = Array.tabulate(WideDims)(i =>
      ((w(0L)(i).toDouble + w(1L)(i).toDouble) * 0.5).toFloat)
    assert(!w.values.exists(_.sameElements(qv)),
      "midpoint must not collide with an indexed vector")
    val expect = w.toSeq.map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = SparkEntry.queries("knn_hnsw_external_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("acorn_pipeline_recall: parsed-attr realistic-budget recall sits at or above every floor") {
    // A50b: least(n_hit, floor) == floor ⇔ measured ≥ floor — the same
    // assertion the oracle gate makes, kept red-close to the code
    val rows = SparkEntry.queries("acorn_pipeline_recall")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == graft.queries.HybridQueries.PipelineRecallFloors)
  }

  test("hybrid_knn_pq_batch_wide_2048: per-query slice equals the single-query filtered wide pipeline") {
    // A23d ≡ A46e per query: same keep set, same seeded codebook, same
    // shortlist/rerank tie orders
    val batch = SparkEntry.queries("hybrid_knn_pq_batch_wide_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch.map(_._1).distinct.sorted == (0L until 8L))
    val q0 = batch.filter(_._1 == 0L).sortBy(_._3).map(t => (t._2, t._4))
    val single = SparkEntry.queries("hybrid_knn_pq_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(q0 == single)
    // the keep contract: every answered row is filter-qualified
    val keep = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("lang").isNotNull &&
        org.apache.spark.sql.functions.col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch.forall { case (_, id, _, _) => keep.contains(id) },
      "a filter-failing row leaked into the filtered wide batch")
  }

  test("knn_pq_batch_external_2048 equals the plain-Scala external-midpoint reconstruction") {
    // A47c: the reference's demo shape (an out-of-corpus query against
    // the d=2048 index) re-derived without Spark — midpoint derivation
    // (one float round per component), seeded codebook, per-query ADC
    // over the WHOLE corpus (no self-exclusion: external ids name no
    // corpus row), shortlist, exact L2 rerank against the raw midpoint
    val (numSub, subDim, numCodes, shortlist) = (16, 128, 64, 100)
    val w = wideCorpus()
    val wd = w.map { case (id, v) => id -> v.map(_.toDouble) }
    def sqdFloor(a: Array[Double], off: Int, cw: Array[Double]): Long = {
      var acc = 0.0; var i = 0
      while (i < cw.length) { val d = a(off + i) - cw(i); acc += d * d; i += 1 }
      math.floor(acc * 10000.0).toLong
    }
    val cb: Map[(Int, Long), Array[Double]] =
      (for (code <- 0L until numCodes; m <- 0 until numSub)
        yield (m, code) -> wd(code).slice(m * subDim, (m + 1) * subDim)).toMap
    val expect = (0L until 4L).flatMap { g =>
      val a = wd(2 * g); val b = wd(2 * g + 1)
      val qf = Array.tabulate(WideDims)(i => ((a(i) + b(i)) * 0.5).toFloat)
      val qd = qf.map(_.toDouble)
      val adc = cb.map { case ((m, c), cw) => (m, c) -> sqdFloor(qd, m * subDim, cw) }
      val short = wd.toSeq.map { case (id, v) =>
        var asum = 0L
        for (m <- 0 until numSub) {
          val best = (0L until numCodes)
            .map(c => (sqdFloor(v, m * subDim, cb((m, c))), c)).min
          asum += adc((m, best._2))
        }
        (asum, id)
      }.sorted.take(shortlist).map(_._2)
      short.map(id => (id, l2Scaled(w(id), qf)))
        .sortBy { case (id, s) => (s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (g, id, (i + 1).toLong, s) }
    }.toSeq
    val got = SparkEntry.queries("knn_pq_batch_external_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(t => (t._1, t._3))
    assert(got == expect)
  }

  test("knn_ivf_hnsw_2048: graph probe matches the scaled-sqrt ranking at width; entry equals the pruned scan") {
    // A14e: the FunnelSpec A14d pin at the reference width — the HNSW
    // walk over the k·2048 centroid table must return exactly the
    // scaled-sqrt top-3 (floor(sqrt(d²)·10⁴+0.5), ties to the lower
    // label), and the entry must equal the exact integer scan restricted
    // to those clusters' members
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val w = HybridQueries.wideEmbeddings(spark, dir)
    val corpus = w.select("vec_id", "embedding").filter(col("vec_id") =!= 21)
    val (cent, qemb) = graft.operators.KMeans.fitInt(corpus, k = 10, iters = 3)
    val qv = graft.operators.Pq.quantized(w.filter(col("vec_id") === 21))
      .select("q").head.getSeq[Long](0).toArray
    assert(qv.length == WideDims)
    def scaledDist(c: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < c.length) { val d = c(i) - qv(i); acc += d * d; i += 1 }
      math.floor(math.sqrt(acc.toDouble) * 10000 + 0.5).toLong
    }
    val expectProbe = cent.map { case (cl, v) => (cl, scaledDist(v)) }
      .sortBy { case (cl, s) => (s, cl) }.take(3).map(_._1).toSet
    val centDf = cent.map { case (cl, v) => (cl, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding").repartition(1)
    val graphProbe = graft.operators.Hnsw
      .searchPerPartition(centDf, qv.map(_.toFloat), k = 3, ef = 0)
      .select("vec_id").as[Long].collect().toSet
    assert(graphProbe == expectProbe)
    val entry = SparkEntry.queries("knn_ivf_hnsw_2048")(spark, dir)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(entry.size == 10)
    val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
    val expected = qemb.select(col("vec_id"),
        graft.functions.centroids.nearestLong(col("q"), cent)
          .getField("label").as("cluster"), col("q"))
      .filter(col("cluster").isin(expectProbe.toSeq: _*))
      .selectExpr("vec_id", graft.functions.sqDistLongSql("q", qLit) + " AS score")
      .orderBy(col("score").asc, col("vec_id").asc).limit(10)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(entry == expected)
  }

  test("knn_ivf_hnsw_batch_2048: batched wide graph probe ≡ per-query ranking; self-hits at rank 1") {
    // A14g: the FunnelSpec A14f pin at the reference width — the one-pass
    // batched walk over the k·2048 centroid table must equal the
    // per-query scaled-sqrt ranking for EVERY query in the file, and the
    // pruned scan over the full-corpus wide index must surface each
    // indexed query's self-hit first (score 0)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val w = HybridQueries.wideEmbeddings(spark, dir)
    val (cent, _) = graft.operators.KMeans.fitInt(
      w.select("vec_id", "embedding"), k = 10, iters = 3)
    val qvs = graft.operators.Pq.quantized(w.filter(col("vec_id") < 8))
      .select("vec_id", "q").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq.sortBy(_._1)
    assert(qvs.size == 8 && qvs.head._2.length == WideDims)
    def scaledDist(c: Array[Long], qv: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < c.length) { val d = c(i) - qv(i); acc += d * d; i += 1 }
      math.floor(math.sqrt(acc.toDouble) * 10000 + 0.5).toLong
    }
    val centDf = cent.map { case (cl, v) => (cl, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding").repartition(1)
    val batchedProbe = graft.operators.Hnsw.searchPerPartitionBatch(centDf,
        qvs.map { case (id, q) => (id, q.map(_.toFloat)) }, k = 3, ef = 0)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    qvs.foreach { case (qid, qv) =>
      val expect = cent.map { case (cl, v) => (cl, scaledDist(v, qv)) }
        .sortBy { case (cl, s) => (s, cl) }.take(3).map(_._1).toSet
      assert(batchedProbe(qid) == expect, s"wide probe mismatch for q$qid")
    }
    val entry = SparkEntry.queries("knn_ivf_hnsw_batch_2048")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(entry.map(_._1).distinct.sorted == (0L until 8L))
    assert(entry.groupBy(_._1).forall(_._2.size == 10))
    entry.filter(_._3 == 1L).foreach { case (qid, vid, _, score) =>
      assert(vid == qid && score == 0L,
        s"q$qid rank-1 must be its own indexed row at score 0, got ($vid, $score)")
    }
  }

  test("recall_hnsw_beam_2048: wide recall sits at or above every floor") {
    // A48: least(n_hit, floor) == floor ⇔ measured ≥ floor — the same
    // assertion the oracle gate makes, kept red-close to the code
    val rows = SparkEntry.queries("recall_hnsw_beam_2048")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows == graft.queries.HybridQueries.RecallBeam2048Floors)
  }

  test("knn_matryoshka_2048 reranks with exact wide scores; 256-slot prefix keeps recall") {
    // A38b: the FusionSpec A38 pin at width — reranked scores must be
    // the exact wide cosine, and the 8×-truncated shortlist must keep
    // most of the exact top-10
    import org.apache.spark.sql.functions.col
    val e = HybridQueries.wideEmbeddings(spark, dir)
    val exact = graft.operators.Knn.topK(
      e.filter(col("vec_id") =!= 0).select("vec_id", "embedding"),
      e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec")),
      10, graft.operators.Knn.Cosine).select("vec_id", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mrl = graft.queries.FusionQueries.defs("knn_matryoshka_2048")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mrl.length == 10)
    mrl.filter(p => exact.contains(p._1)).foreach { case (id, s) => assert(exact(id) == s) }
    assert(mrl.map(_._1).toSet.intersect(exact.keySet).size >= 6,
      "256-of-2048-slot shortlist should keep most of the exact top-10")
  }

  test("knn_ivf_append_2048 equals the plain-Scala wide assignment reconstruction") {
    // A30d: base centroids (per-label mean over the wide doubles, one
    // float round per dim — the knn_ivfpq_2048 reconstruction) and the
    // per-arrival argmin under (scaled-L2 asc, label asc), re-derived
    // without Spark
    val w = wideCorpus()
    val labels = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseIds = w.keys.filter(_ < 400L).toSeq.sorted
    val cents: Map[Long, Array[Float]] = baseIds.groupBy(labels)
      .map { case (lbl, ids) =>
        lbl -> Array.tabulate(WideDims)(d =>
          (ids.map(i => w(i)(d).toDouble).sum / ids.size).toFloat)
      }
    val expect = w.keys.filter(_ >= 400L).toSeq.sorted.map { id =>
      val (lbl, d) = cents.toSeq
        .map { case (l, c) => (l, l2Scaled(w(id), c)) }
        .sortBy { case (l, s) => (s, l) }.head
      (id, lbl, d)
    }
    val entry = SparkEntry.queries("knn_ivf_append_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(entry.nonEmpty && entry == expect)
  }

  test("ivf_split_hot_2048 equals the plain-Scala wide split reconstruction") {
    // A33b: hot selection, min/max seeds, and the tie-to-lo two-way
    // re-assignment re-derived without Spark over the wide vectors
    val w = wideCorpus()
    val labels = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byLabel = w.keys.toSeq.groupBy(labels)
    val hot = byLabel.toSeq.map { case (l, ids) => (-ids.size, l) }
      .sorted.take(3).map(_._2)
    val expect = hot.flatMap { l =>
      val ids = byLabel(l).sorted
      val (lo, hi) = (w(ids.min), w(ids.max))
      ids.map { id =>
        val sub = if (l2Scaled(w(id), lo) <= l2Scaled(w(id), hi)) 0L else 1L
        (l, sub, id)
      }.groupBy { case (_, sub, _) => sub }.toSeq.map { case (sub, ms) =>
        (l, sub, ms.size.toLong, ms.map(_._3).min)
      }
    }.sortBy { case (l, sub, _, _) => (l, sub) }
    val entry = SparkEntry.queries("ivf_split_hot_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy { case (l, sub, _, _) => (l, sub) }
    assert(entry.nonEmpty && entry == expect)
  }

  test("ivf_drift_rebuild_2048: verdict self-consistent, both arms fire, membership conserved at width") {
    // A30c: the FunnelSpec A30b pins at the reference width — the verdict
    // column equals the threshold formula applied to the entry's own
    // stats, base/arriving membership is conserved, and BOTH dispatch
    // arms fire (a decision entry where one branch never runs proves
    // nothing)
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("ivf_drift_rebuild_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nb, nn, mb, mn2, rebuild, served) =>
      val expect = if (mn2 * 10 > mb * 12 || nn * 5 >= nb + nn) 1L else 0L
      assert(rebuild == expect, s"verdict disagrees with its own stats: ${rows.mkString(", ")}")
      assert(served > 0)
    }
    assert(rows.map(_._2).sum == 400L, "base membership must cover vec_id < 400")
    assert(rows.map(_._3).sum ==
      Tables(spark, dir, "embeddings").filter(col("vec_id") >= 400).count())
    assert(rows.exists(_._6 == 1L) && rows.exists(_._6 == 0L),
      s"both verdict arms must fire at the gate scale: ${rows.mkString(", ")}")
  }

  test("recall_hnsw_2hop_2048: wide two-hop curve sits at or above every floor") {
    // A51b: least(n_hit, floor) == floor ⇔ measured ≥ floor, and the
    // gain rows pin two-hop ≥ one-hop at equal budget AT width — the
    // same assertion the oracle gate makes, kept red-close to the code
    val rows = SparkEntry.queries("recall_hnsw_2hop_2048")(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val expect = HybridQueries.TwoHopBudgets2048.flatMap {
      case (b, oneF, twoF, gF) => Seq((b.toLong, "one") -> oneF,
        (b.toLong, "two") -> twoF, (b.toLong, "gain") -> gF)
    }.toMap
    assert(rows == expect)
  }

  test("acorn_pipeline_e2e equals the plain-Scala parse→attr→prefilter reconstruction") {
    // A50: the whole composition re-derived without Spark — attributes
    // straight from documents (the JSONL synthesis collapsed), class
    // predicates, wide vectors, exact top-10 per class. Queries stay in
    // the corpus; whether a query's own listing passes is decided by the
    // same predicate on both sides.
    val w = wideCorpus()
    val docRows = Tables(spark, dir, "documents")
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    case class Attr(brand: String, color: String, modelYear: Long)
    val attrs = docRows.map { case (id, source, lang) =>
      id -> Attr(
        if (id % 5 != 0) Option(source).getOrElse("unknown") else null,
        Option(lang).getOrElse("und"),
        2000L + id % 25)
    }.toMap
    val classes = Seq(
      ("c1", 3L, (a: Attr) => a.brand != null && a.brand == "src1"),
      ("c2", 11L, (a: Attr) => a.color == "zh"),
      ("c3", 17L, (a: Attr) => a.modelYear <= 2010L))
    val expect = classes.flatMap { case (cls, qid, pred) =>
      val qv = w(qid)
      w.toSeq.filter { case (id, _) => attrs.get(id).exists(pred) }
        .map { case (id, v) => (id, l2Scaled(v, qv)) }
        .sortBy { case (id, s) => (s, id) }.take(10)
        .map { case (id, s) => (cls, id, s) }
    }.toSet
    val got = SparkEntry.queries("acorn_pipeline_e2e")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
    assert(got.size == 30, "three classes x top-10")
  }

  // --- round-17 additions: the strategy matrix, the pipeline recall
  // table, and the remaining width cells ---

  /** The A50 parsed-attr reconstruction shared by the r17 pipeline
    * tests: plain-Scala attributes straight from documents. */
  private def pipelineAttrs(): Map[Long, (String, String, Long)] =
    Tables(spark, dir, "documents")
      .select("doc_id", "source", "lang").collect()
      .map { r =>
        val id = r.getLong(0)
        val source = if (r.isNullAt(1)) null else r.getString(1)
        val lang = if (r.isNullAt(2)) null else r.getString(2)
        id -> (
          (if (id % 5 != 0) Option(source).getOrElse("unknown") else null),
          Option(lang).getOrElse("und"),
          2000L + id % 25)
      }.toMap

  private val PipelineClasses = Seq(
    ("c1", 3L, (a: (String, String, Long)) => a._1 != null && a._1 == "src1"),
    ("c2", 11L, (a: (String, String, Long)) => a._2 == "zh"),
    ("c3", 17L, (a: (String, String, Long)) => a._3 <= 2010L))

  test("acorn_pipeline_e2e_2048: pre equals the reconstruction, acorn equals pre, post equals the top-50 funnel") {
    val w = wideCorpus()
    val attrs = pipelineAttrs()
    val rows = SparkEntry.queries("acorn_pipeline_e2e_2048")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    for ((cls, qid, pred) <- PipelineClasses) {
      val qv = w(qid)
      val scored = w.toSeq.map { case (id, v) => (id, l2Scaled(v, qv)) }
      val passIds = attrs.filter { case (id, a) => pred(a) }.keySet
      val pre = scored.filter(t => passIds(t._1))
        .sortBy { case (id, s) => (s, id) }.take(10)
      val got = (strat: String) =>
        rows.filter(r => r._1 == cls && r._2 == strat).map(r => (r._3, r._4))
          .sortBy { case (id, s) => (s, id) }.toSeq
      assert(got("pre") == pre, s"$cls pre")
      // the saturated persisted walk must land on the SAME rows — the
      // walk ≡ scan identity per class IS the strategy matrix's gate
      assert(got("acorn") == pre, s"$cls acorn ≡ pre")
      val post = scored.sortBy { case (id, s) => (s, id) }.take(50)
        .filter(t => passIds(t._1)).take(10)
      assert(got("post") == post, s"$cls post")
      // the collapse is visible where the reconstruction says it is:
      // post ⊆ the unfiltered top-50, so on a selective class it may
      // return fewer than 10 rows — both sides agree exactly
      assert(post.size <= 10)
    }
  }

  test("acorn_pipeline_recall_2048: cells sit at or above every floor; acorn cells share the A50b measurement") {
    val rows = SparkEntry.queries("acorn_pipeline_recall_2048")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(rows == graft.queries.HybridQueries.PipelineMatrixFloors)
    // shared-constant discipline: the matrix's acorn floors ARE the A50b
    // floors (same index, pass sets, query files, constants) — a drifted
    // copy would let the two entries gate different knees silently
    val a50b = graft.queries.HybridQueries.PipelineRecallFloors
    for (cls <- Seq("c1", "c2", "c3"))
      assert(graft.queries.HybridQueries.PipelineMatrixFloors((cls, "acorn"))
        == a50b(cls))
  }

  test("recall_filtered_2048: hybrid recall dominates post on the selective class; counts are honest") {
    val rows = SparkEntry.queries("recall_filtered_2048")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // README §3's direction at width: the predicate-aware probe must not
    // trail the post-filter baseline on class 1
    val (_, postHit) = rows(("class1_selective", "post"))
    val (_, hybHit) = rows(("class1_selective", "hybrid"))
    assert(hybHit >= postHit)
    rows.values.foreach { case (nRet, nHit) =>
      assert(nRet <= 10 && nHit <= nRet)
    }
  }

  test("attr_specific_knn_hnsw_2048 equals the plain-Scala membership+predicate reconstruction") {
    val w = wideCorpus()
    val docRows = Tables(spark, dir, "documents")
      .select("doc_id", "n_chars", "lang").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))
    // membership: n_chars present; predicate: n_chars ≤ 400 AND lang ∋ 'e'
    val pass = docRows.filter { case (_, nc, lg) =>
      nc.isDefined && nc.get <= 400 && lg.exists(_.contains("e"))
    }.map(_._1).toSet
    val qv = w(9L)
    val expect = w.toSeq.filter { case (id, _) => id != 9L && pass(id) }
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(3)
    val got = q("attr_specific_knn_hnsw_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("hybrid_knn_adaptive_2048: the widening loop reaches k filter-passing survivors at width") {
    val rows = q("hybrid_knn_adaptive_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 10, "the loop must widen until >= k survivors")
    val fr = Tables(spark, dir, "documents")
      .select("doc_id", "lang").collect()
      .filter(r => !r.isNullAt(1) && r.getString(1) == "fr")
      .map(_.getLong(0)).toSet
    rows.foreach { case (id, _) => assert(fr(id) && id != 3L) }
  }

  test("knn_bq_2048: shortlist comes from the packed-code Hamming ranking; rerank scores are exact") {
    val w = wideCorpus()
    val qv = w(0L)
    def pack(v: Array[Float]): Array[Long] =
      Array.tabulate(64) { g =>
        var acc = 0L
        var j = 0
        while (j < 32) { if (v(g * 32 + j) > 0.0f) acc |= (1L << j); j += 1 }
        acc
      }
    def cosScaled(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5).toLong
    }
    val qp = pack(qv)
    val expect = w.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        val p = pack(v)
        val ham = (0 until 64).map(g => java.lang.Long.bitCount(p(g) ^ qp(g))).sum.toLong
        (id, ham, v)
      }
      .sortBy { case (id, ham, _) => (ham, id) }.take(40)
      .map { case (id, ham, v) => (id, cosScaled(v, qv), ham) }
      .sortBy { case (id, s, _) => (-s, id) }.take(10)
    val got = SparkEntry.queries("knn_bq_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("knn_mmr_2048: first pick is the top-relevance row; picks are distinct shortlist members") {
    val rows = SparkEntry.queries("knn_mmr_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1) == (1L to 5L))
    assert(rows.map(_._2).distinct.length == 5)
    // rank-1 MMR reduces to pure relevance (empty selected set), so the
    // first pick must be the wide-cosine top-1 of the corpus minus self
    val w = wideCorpus()
    val qv = w(0L)
    def cosScaled(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5).toLong
    }
    val top1 = w.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cosScaled(v, qv)) }
      .maxBy { case (id, s) => (s, -id) }
    assert(rows.head._2 == top1._1)
  }

  test("knn_refine_rerank_2048: every result comes from the SQ8 coarse shortlist, scores integer-exact") {
    val rows = SparkEntry.queries("knn_refine_rerank_2048")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.length == 10)
    val w = wideCorpus()
    // calibration runs over the FULL frame (query included) — the
    // entry's stats pass and the oracle's st CTE both read every row
    val all = w.toSeq.map(_._2)
    val mn = all.map(_.map(_.toDouble).min).min
    val mx = all.map(_.map(_.toDouble).max).max
    def sq8(v: Array[Float]): Array[Long] =
      v.map(x => math.floor((x.toDouble - mn) * 255.0 / (mx - mn)).toLong)
    val qv = w(0L)
    val q8 = sq8(qv)
    val shortlist = w.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        val c = sq8(v)
        var acc = 0L; var i = 0
        while (i < c.length) { val d = c(i) - q8(i); acc += d * d; i += 1 }
        (id, acc)
      }
      .sortBy { case (id, d) => (d, id) }.take(50)
    val shortIds = shortlist.map(_._1).toSet
    val coarseById = shortlist.toMap
    rows.foreach { case (id, coarse, _) =>
      assert(shortIds(id), s"$id not in the coarse shortlist")
      assert(coarse == coarseById(id))
    }
  }
}
