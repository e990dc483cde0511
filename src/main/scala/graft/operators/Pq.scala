package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.{pq, scaled, vectors}

/** Product quantization (IVF-PQ style) — the canonical 100 TB vector-
  * compression path: vectors become `numSub` small codes (here 8 codes of
  * 6 bits → 8 bytes per 64-dim float vector, 32× smaller), queries scan
  * codes via an ADC (asymmetric distance computation) lookup table, and
  * only a short candidate list is reranked against full vectors.
  *
  * Codebook training is deliberately DETERMINISTIC here: the K lowest-id
  * vectors seed each subspace's codewords (the `KMeans` operator exists for
  * real Lloyd's training — seeding keeps this whole path, encode included,
  * verifiable by the DuckDB oracle, the same trade `ivf_build` makes).
  *
  * Scale shape:
  *  - codebook and ADC table are K·M rows — broadcast, never shuffled;
  *  - encoding is one narrow crossJoin + a (vec_id, m)-keyed argmin
  *    aggregate; at 100 TB codes are computed ONCE at ingest and stored
  *    (the 32× compression is what makes the corpus scannable);
  *  - the query scan reads codes only, sums M broadcast-table lookups per
  *    row, and TakeOrders the shortlist — no full-vector I/O until the
  *    R-row rerank.
  *
  * All sub-distances are squared L2 computed as an explicit left-assoc
  * 8-term sum (no sqrt, no engine aggregation-order ambiguity), scaled to
  * BIGINT per the repo convention. */
object Pq {

  /** (m, code, cw): KMeans-trained codewords — real Lloyd's over every
    * subspace's sub-vectors SIMULTANEOUSLY (the production alternative to
    * the oracle-friendly seeded codebook). Per iteration: ONE scan whose
    * assignment step is the codegen'd `PqNearestCode` kernel itself (the
    * encode path doubles as Lloyd's E-step), a stack to (m, code, subvec)
    * rows, and one (m, code)-keyed mean — all M·K centroids update in a
    * single job, vs M separate KMeans fits. Training runs on a bounded
    * sample (`sampleMax` lowest-id vectors), exactly how large-corpus PQ
    * codebooks are fit in practice: the codebook is k·d model state and
    * the full corpus is only ever touched by the one-pass encode that
    * follows. Deterministic (lowest-id seeds, lowest-code tie-breaks,
    * empty codes keep their centroid) but iterative fp — so entries built
    * on it are rows-only, the same trade SURVEY §2 documents for A14. */
  def trainedCodebook(emb: DataFrame, numSub: Int, subDim: Int, numCodes: Int,
                      iters: Int, sampleMax: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample = Dedup.materialize(emb.filter(col("vec_id") < sampleMax)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"))
    var cb = seededCodebook(emb, numSub, subDim, numCodes).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val stackExpr = s"stack($numSub, " +
      (0 until numSub).map(m => s"$m, code_$m").mkString(", ") + ") AS (m, code)"
    for (_ <- 0 until iters) {
      val next = encodeFast(sample, cb, numSub, subDim)
        .join(sample, "vec_id")
        .selectExpr(stackExpr, "v")
        .selectExpr("m", "code",
          s"CAST(slice(v, m * $subDim + 1, $subDim) AS ARRAY<FLOAT>) AS sv")
        .groupBy("m", "code")
        .agg(graft.functions.aggs.vecSum(col("sv")).as("vsum"), count(col("sv")).as("n"))
        .selectExpr("m", "code", "transform(vsum, x -> x / n) AS cw")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      cb = cb.map { case (m, c, cw) => (m, c, next.getOrElse((m, c), cw)) }
    }
    cb.toSeq.map { case (m, c, cw) => (m, c, cw.toSeq) }.toDF("m", "code", "cw")
  }

  /** (vec_id, q: array<bigint>): components quantized to floor(x·10⁴+0.5)
    * — the integer-exact form the engine-portable training paths share. */
  def quantized(emb: DataFrame): DataFrame =
    emb.selectExpr("vec_id",
      graft.functions.quantizeVecSql("embedding") + " AS q")

  /** INTEGER-EXACT trained PQ codebook — Lloyd's per subspace over
    * QUANTIZED sub-vectors: assignment via the `NearestCentroidLong`
    * kernel (exact integer squared L2, lowest-code ties), centroid update
    * as the element-wise integer floor-mean. Bit-identical in any engine
    * ⇒ the trained search carries a full DuckDB oracle (the float
    * `trainedCodebook` remains the library fp form). Same scale shape:
    * bounded sample, one kernel-projection E-step + one (m, code)-keyed
    * VecSumLong M-step per iteration, M·K·d driver model state. */
  def trainedCodebookInt(emb: DataFrame, numSub: Int, subDim: Int, numCodes: Int,
                         iters: Int, sampleMax: Int): Seq[(Int, Long, Array[Long])] = {
    val sample = Dedup.materialize(quantized(emb).filter(col("vec_id") < sampleMax))
    val seedVecs = sample.orderBy(col("vec_id").asc).limit(numCodes)
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    var cb: Seq[(Int, Long, Array[Long])] =
      for { m <- 0 until numSub; (v, c) <- seedVecs.zipWithIndex.toSeq }
        yield (m, c.toLong, v.slice(m * subDim, (m + 1) * subDim))
    val stackExpr = s"stack($numSub, " +
      (0 until numSub).map(m => s"$m, code_$m").mkString(", ") + ") AS (m, code)"
    for (_ <- 0 until iters) {
      val next = encodeIntCols(sample, cb, numSub, subDim)
        .selectExpr(stackExpr, "q")
        .selectExpr("m", "code", s"slice(q, m * $subDim + 1, $subDim) AS sv")
        .groupBy("m", "code")
        .agg(graft.functions.aggs.vecSumLong(col("sv")).as("s"), count(lit(1)).as("cnt"))
        // integer floor-mean; components can be negative → pmod identity
        .selectExpr("m", "code", graft.functions.floorMeanVecSql("s", "cnt") + " AS cw")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2).toArray).toMap
      // empty codes keep their previous codeword
      cb = cb.map { case (m, c, cw) => (m, c, next.getOrElse((m, c), cw)) }
    }
    cb
  }

  /** Wide integer codes (vec_id, q, code_0 … code_{M-1}) — one narrow
    * projection of `NearestCentroidLong` kernels over sliced sub-vectors. */
  private def encodeIntCols(qemb: DataFrame, cb: Seq[(Int, Long, Array[Long])],
                            numSub: Int, subDim: Int): DataFrame = {
    val cols = (0 until numSub).map { m =>
      val table = cb.filter(_._1 == m).map { case (_, c, cw) => (c, cw) }
      graft.functions.centroids.nearestLong(
        expr(s"slice(q, ${m * subDim + 1}, $subDim)"), table)
        .getField("label").as(s"code_$m")
    }
    qemb.select(col("vec_id") +: col("q") +: cols: _*)
  }

  /** Integer-exact ADC shortlist + exact integer rerank over a trained
    * integer codebook: score = exact squared L2 in quantized units.
    * Narrow encode (kernel projection) → literal-array td lookup →
    * TakeOrdered shortlist → rerank from the carried q (no join back). */
  def searchRerankInt(emb: DataFrame, cb: Seq[(Int, Long, Array[Long])],
                      qid: Int, k: Int, numSub: Int, subDim: Int,
                      shortlist: Int): DataFrame = {
    val qall = quantized(emb)
    val qv = qall.filter(col("vec_id") === qid).select("q").head.getSeq[Long](0).toArray
    val codes = Dedup.materialize(
      encodeIntCols(qall.filter(col("vec_id") =!= qid), cb, numSub, subDim))
    val td: Map[(Int, Long), Long] = cb.map { case (m, c, cw) =>
      var acc = 0L; var j = 0
      while (j < subDim) { val d = qv(m * subDim + j) - cw(j); acc += d * d; j += 1 }
      (m, c) -> acc
    }.toMap
    val adistExpr = (0 until numSub).map { m =>
      val tds = cb.filter(_._1 == m).sortBy(_._2).map { case (_, c, _) => s"${td((m, c))}L" }
      s"element_at(array(${tds.mkString(", ")}), CAST(code_$m AS INT) + 1)"
    }.mkString(" + ")
    val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
    codes.selectExpr("vec_id", "q", s"CAST($adistExpr AS BIGINT) AS adist")
      .orderBy(col("adist").asc, col("vec_id").asc).limit(shortlist)
      .selectExpr("vec_id",
        graft.functions.sqDistLongSql("q", qLit) + " AS score")
      .orderBy(col("score").asc, col("vec_id").asc).limit(k)
  }

  /** A42: residual IVF-PQ search — the real FAISS IVFPQ encoding (Jégou et
    * al. 2011 §IV-A): vectors PQ-encode their RESIDUAL against the coarse
    * (cluster) centroid rather than the raw vector — the residual
    * distribution is far tighter than the raw one, so the same code budget
    * quantizes finer (A24 `knn_ivfpq` is the direct-encode baseline).
    *
    * INTEGER-EXACT throughout: quantized components, the KMeans.fitInt
    * floor-mean centroid arithmetic, integer squared L2 for the probe,
    * encode argmin, per-cluster ADC and the final rerank — so the whole
    * composition (centroids → probe → residual seeds → encode →
    * per-cluster ADC → shortlist → exact rerank) replays in DuckDB.
    *
    * Scale shape: centroids + residual codebook are k·d / K·M·d model
    * state (driver-held, literal-embedded — the KMeans contract). The
    * probed members' encode is one narrow codegen'd kernel projection; the
    * ADC is a per-label literal lookup (one CASE arm per probed cluster);
    * shortlist via TakeOrdered; the exact rerank touches `shortlist` rows.
    * At 100 TB codes pre-exist from ingest and the probe prunes the code
    * scan to ~nProbe/k of the corpus — the residual transform changes
    * WHAT is encoded, not the scan shape. */
  def ivfpqResidual(emb: DataFrame, qid: Int, k: Int, numSub: Int, subDim: Int,
                    numCodes: Int, nProbe: Int, shortlist: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = numSub * subDim
    val qe = emb.selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
      graft.functions.quantizeVecSql("embedding") + " AS q")
    // coarse centroids: integer floor-mean per label, over the FULL corpus
    // (index-build state — the query row is part of the ingested index)
    val cent: Map[Long, Array[Long]] = qe.groupBy("label")
      .agg(graft.functions.aggs.vecSumLong(col("q")).as("s"), count(lit(1)).as("cnt"))
      .selectExpr("label", graft.functions.floorMeanVecSql("s", "cnt") + " AS cent")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val qv = qe.filter(col("vec_id") === qid).select("q").head.getSeq[Long](0).toArray
    def sqdFull(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // probe: nProbe nearest centroids, ties to the lower label
    val probed: Seq[Long] = cent.toSeq
      .map { case (l, c) => (l, sqdFull(c, qv)) }
      .sortBy { case (l, d) => (d, l) }.take(nProbe).map(_._1)
    // residual codebook: codes 0..K-1 = residuals of the K lowest-id
    // vectors (the seededCodebook convention, residual-transformed)
    val seedRows = qe.filter(col("vec_id") < numCodes)
      .select("vec_id", "label", "q").collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val v = r.getSeq[Long](2).toArray
        val c = cent(r.getLong(1))
        (r.getLong(0), Array.tabulate(dims)(i => v(i) - c(i)))
      }
    require(seedRows.map(_._1).toSeq == (0L until numCodes.toLong),
      s"ivfpqResidual: seed ids not dense 0..${numCodes - 1} — " +
        "the literal ADC lookup indexes by code; re-densify vec_id first")
    val cb: Seq[(Int, Long, Array[Long])] =
      for { m <- 0 until numSub; (code, rv) <- seedRows.toSeq }
        yield (m, code, rv.slice(m * subDim, (m + 1) * subDim))
    // probed members, residual-transformed (broadcast centroid join + one
    // narrow zip_with over nProbe/k of the corpus)
    val centDf = cent.toSeq.map { case (l, c) => (l, c.toSeq) }.toDF("label", "cent")
    val members = qe.filter(col("label").isin(probed: _*) && col("vec_id") =!= qid)
      .join(broadcast(centDf), "label")
      .selectExpr("vec_id", "label", "q", "zip_with(q, cent, (a, b) -> a - b) AS r")
    // encode: nearest residual codeword per subspace (codegen'd kernel,
    // ties to the lowest code — matching the oracle's min-join)
    val codeCols = (0 until numSub).map { m =>
      val table = cb.filter(_._1 == m).map { case (_, c, cw) => (c, cw) }
      graft.functions.centroids.nearestLong(
        expr(s"slice(r, ${m * subDim + 1}, $subDim)"), table)
        .getField("label").as(s"code_$m")
    }
    val codes = members.select(Seq(col("vec_id"), col("label"), col("q")) ++ codeCols: _*)
    // per-cluster ADC: td(label, m, code) = ||(q − cent_label)_sub − cw||²,
    // embedded as literal arrays behind one CASE arm per probed cluster
    val adcByLabel: Map[Long, IndexedSeq[IndexedSeq[Long]]] = probed.map { l =>
      val qr = Array.tabulate(dims)(i => qv(i) - cent(l)(i))
      l -> (0 until numSub).map { m =>
        cb.filter(_._1 == m).sortBy(_._2).map { case (_, _, cw) =>
          var acc = 0L; var j = 0
          while (j < subDim) { val d = qr(m * subDim + j) - cw(j); acc += d * d; j += 1 }
          acc
        }.toIndexedSeq
      }.toIndexedSeq
    }.toMap
    def adistFor(l: Long): String = (0 until numSub).map { m =>
      val tds = adcByLabel(l)(m).map(v => s"${v}L").mkString(", ")
      s"element_at(array($tds), CAST(code_$m AS INT) + 1)"
    }.mkString(" + ")
    val whens = probed.init.map(l => s"WHEN label = ${l}L THEN (${adistFor(l)})").mkString(" ")
    val caseExpr =
      if (probed.size == 1) adistFor(probed.head)
      else s"CASE $whens ELSE (${adistFor(probed.last)}) END"
    val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
    codes.selectExpr("vec_id", "q", s"CAST($caseExpr AS BIGINT) AS adist")
      .orderBy(col("adist").asc, col("vec_id").asc).limit(shortlist)
      .selectExpr("vec_id", graft.functions.sqDistLongSql("q", qLit) + " AS score")
      .orderBy(col("score").asc, col("vec_id").asc).limit(k)
  }

  /** BATCHED residual IVF-PQ (A42's batch form). The residual structure is
    * QUERY-INDEPENDENT — residuals, seeds, codebook, and codes all encode
    * against each row's OWN cluster centroid — so one encode of the
    * probed-cluster UNION serves every query; only the per-(query, probed
    * cluster) ADC tables differ, and they ride as literal lookup arrays
    * behind one CASE arm per cluster, per query (query-count-bounded model
    * state, the ivfpqResidual convention). Membership is encoded in the
    * same CASE: a row whose cluster is not among THIS query's probes gets
    * NULL adist and is filtered — no membership join at all. Integer-exact
    * end-to-end like the single-query form; per-query results ≡
    * ivfpqResidual (spec-pinned). */
  /** The batch-family |Q| guard, checked at FUNCTION ENTRY (before any
    * Spark work — r8 review: a 65-query call must refuse before paying a
    * corpus encode): each query adds literal ADC state and an adist
    * column to the scan projection; chunk the query file above 64. */
  private def requireBatchQids(qids: Seq[Long], who: String): Unit =
    require(qids.nonEmpty && qids.size <= 64,
      s"$who: |Q|=${qids.size} — each query adds a literal ADC table and " +
        "an adist column to the scan projection; chunk the query file " +
        "above 64 per pass (and pass at least one query)")

  def ivfpqResidualBatch(emb: DataFrame, qids: Seq[Long], k: Int, numSub: Int,
                         subDim: Int, numCodes: Int, nProbe: Int,
                         shortlist: Int): DataFrame = {
    import org.apache.spark.sql.functions.posexplode
    requireBatchQids(qids, "ivfpqResidualBatch")
    val spark = emb.sparkSession
    import spark.implicits._
    val dims = numSub * subDim
    val qe = emb.selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
      graft.functions.quantizeVecSql("embedding") + " AS q")
    val cent: Map[Long, Array[Long]] = qe.groupBy("label")
      .agg(graft.functions.aggs.vecSumLong(col("q")).as("s"), count(lit(1)).as("cnt"))
      .selectExpr("label", graft.functions.floorMeanVecSql("s", "cnt") + " AS cent")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val qvs: Map[Long, Array[Long]] = qe.filter(col("vec_id").isin(qids: _*))
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // absent query ids must refuse loudly, not silently drop from the
    // answer set (the adcTables convention)
    require(qids.forall(qvs.contains),
      s"ivfpqResidualBatch: query ids absent from the corpus: " +
        qids.filterNot(qvs.contains).mkString(", "))
    def sqdFull(a: Array[Long], b: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // per-query probes: nProbe nearest integer centroids, ties lower label
    val probedByQ: Map[Long, Seq[Long]] = qids.map { qid =>
      qid -> cent.toSeq.map { case (l, c) => (l, sqdFull(c, qvs(qid))) }
        .sortBy { case (l, d) => (d, l) }.take(nProbe).map(_._1)
    }.toMap
    val unionLabels = probedByQ.values.flatten.toSeq.distinct
    // residual codebook (query-independent): residuals of the K lowest-id
    // vectors against their OWN centroids
    val seedRows = qe.filter(col("vec_id") < numCodes)
      .select("vec_id", "label", "q").collect()
      .sortBy(_.getLong(0))
      .map { r =>
        val v = r.getSeq[Long](2).toArray
        val c = cent(r.getLong(1))
        (r.getLong(0), Array.tabulate(dims)(i => v(i) - c(i)))
      }
    require(seedRows.map(_._1).toSeq == (0L until numCodes.toLong),
      s"ivfpqResidualBatch: seed ids not dense 0..${numCodes - 1} — " +
        "the literal ADC lookup indexes by code; re-densify vec_id first")
    val cb: Seq[(Int, Long, Array[Long])] =
      for { m <- 0 until numSub; (code, rv) <- seedRows.toSeq }
        yield (m, code, rv.slice(m * subDim, (m + 1) * subDim))
    val centDf = cent.toSeq.map { case (l, c) => (l, c.toSeq) }.toDF("label", "cent")
    val members = qe.filter(col("label").isin(unionLabels: _*))
      .join(broadcast(centDf), "label")
      .selectExpr("vec_id", "label", "q", "zip_with(q, cent, (a, b) -> a - b) AS r")
    val codeCols = (0 until numSub).map { m =>
      val table = cb.filter(_._1 == m).map { case (_, c, cw) => (c, cw) }
      graft.functions.centroids.nearestLong(
        expr(s"slice(r, ${m * subDim + 1}, $subDim)"), table)
        .getField("label").as(s"code_$m")
    }
    val codes = Dedup.materialize(
      members.select(Seq(col("vec_id"), col("label")) ++ codeCols: _*))
    // per-(query, probed cluster) ADC literal tables
    val adcByQL: Map[(Long, Long), IndexedSeq[IndexedSeq[Long]]] =
      (for { qid <- qids; l <- probedByQ(qid) } yield {
        val qr = Array.tabulate(dims)(i => qvs(qid)(i) - cent(l)(i))
        (qid, l) -> (0 until numSub).map { m =>
          cb.filter(_._1 == m).sortBy(_._2).map { case (_, _, cw) =>
            var acc = 0L; var j = 0
            while (j < subDim) { val d = qr(m * subDim + j) - cw(j); acc += d * d; j += 1 }
            acc
          }.toIndexedSeq
        }.toIndexedSeq
      }).toMap
    def adistFor(qid: Long, l: Long): String = (0 until numSub).map { m =>
      val tds = adcByQL((qid, l))(m).map(v => s"${v}L").mkString(", ")
      s"element_at(array($tds), CAST(code_$m AS INT) + 1)"
    }.mkString(" + ")
    // membership IS the CASE: labels outside this query's probes → NULL
    val adistColsQ = qids.map { qid =>
      val whens = probedByQ(qid)
        .map(l => s"WHEN label = ${l}L THEN (${adistFor(qid, l)})").mkString(" ")
      s"CAST(CASE $whens END AS BIGINT) AS adist_$qid"
    }
    val short = codes
      .selectExpr(Seq("vec_id", "label") ++ adistColsQ: _*)
      .selectExpr("vec_id", stackExpr(qids))
      .filter(col("adist").isNotNull && col("vec_id") =!= col("q_id"))
      .groupBy("q_id")
      .agg(graft.functions.aggs.topK(col("adist"), col("vec_id"), shortlist,
        asc = true).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("q_id"), col("hit.id").as("vec_id"))
    // exact integer rerank in quantized space (the single-query convention)
    val qqDf = qe.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("q").as("qq"))
    qe.select("vec_id", "q")
      .join(broadcast(short), "vec_id")
      .join(broadcast(qqDf), "q_id")
      .selectExpr("q_id", "vec_id",
        graft.functions.sqDistLongSql("q", "qq") + " AS score")
      .groupBy("q_id")
      .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), k, asc = true).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("q_id"), col("hit.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rank"), col("hit.score").as("score"))
  }

  /** (m, code, cw): K seed codewords per subspace from the lowest-id vectors. */
  def seededCodebook(emb: DataFrame, numSub: Int, subDim: Int, numCodes: Int): DataFrame =
    emb.filter(col("vec_id") < numCodes)
      .selectExpr("vec_id AS code", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .selectExpr("code", s"explode(sequence(0, ${numSub - 1})) AS m", "v")
      .selectExpr("m", "code", s"slice(v, m * $subDim + 1, $subDim) AS cw")

  /** round(||v_sub − cw||² · 10⁴): explicit per-dim terms in fixed order so
    * both engines sum bit-identically. `vecExpr` is indexed through the
    * subspace offset (column `m`); `subExpr` is the codeword. */
  private def sqDistExpr(vecExpr: String, subExpr: String, subDim: Int,
                         offset: Boolean): String = {
    val terms = (1 to subDim).map { i =>
      val x = if (offset) s"element_at($vecExpr, m * $subDim + $i)"
              else s"element_at($vecExpr, $i)"
      val diff = s"($x - element_at($subExpr, $i))"
      s"$diff * $diff"
    }
    // floor, not round: floor on a double is a single allocation-free fp op
    // in both engines (Spark's round routes every value through BigDecimal —
    // measurably dominant when the expression runs 512× per row)
    s"CAST(floor((${terms.mkString(" + ")}) * 10000.0) AS BIGINT)"
  }

  /** (vec_id, m, code): nearest codeword per subspace — ties to the lowest
    * code via lexicographic struct-min, matching the oracle's min-join. */
  def encode(body: DataFrame, codebook: DataFrame, subDim: Int): DataFrame =
    body.crossJoin(broadcast(codebook))
      .selectExpr("vec_id", "m", "code", s"${sqDistExpr("v", "cw", subDim, offset = true)} AS d")
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d"), col("code"))).as("best"))
      .selectExpr("vec_id", "m", "best.code AS code")

  /** (m, code, td): the query's ADC lookup table (one row per codeword). */
  def adcTable(query: DataFrame, codebook: DataFrame, subDim: Int): DataFrame =
    codebook.crossJoin(broadcast(query))
      .selectExpr("m", "code", s"slice(qv, m * $subDim + 1, $subDim) AS qsub", "cw")
      .selectExpr("m", "code", s"${sqDistExpr("qsub", "cw", subDim, offset = false)} AS td")

  /** Scan-speed encode: the codebook is k·d MODEL STATE (like KMeans
    * centroids), so it rides along as a reference object inside the
    * codegen'd `PqNearestCode` kernel and every code is computed in ONE
    * narrow projection — no 512×corpus row explosion, no argmin shuffle
    * (the crossJoin+groupBy `encode` form materialized n·M·K intermediate
    * rows: 26 s vs ~2 s at 500k vectors). The kernel's loop is
    * bit-identical to `encode`'s SQL arithmetic — asserted by spec AND by
    * the driver oracle through `searchRerank`. Returns wide codes
    * (vec_id, code_0 … code_{M-1}). */
  def encodeFast(body: DataFrame, cbRows: Array[(Int, Long, Array[Double])],
                 numSub: Int, subDim: Int): DataFrame = {
    val cols = col("vec_id") +: (0 until numSub).map { m =>
      val cw = cbRows.filter(_._1 == m).sortBy(_._2).map(_._3)
      pq.nearestCode(col("v"), cw, m, subDim).as(s"code_$m")
    }
    body.select(cols: _*)
  }

  /** Full search: ADC shortlist of `shortlist` candidates over the codes,
    * then exact L2 rerank of the shortlist to top-`k`.
    *
    * `keep` (optional, single `vec_id` column) restricts the search to a
    * metadata-qualified subset — the ACORN-hybrid composition over the
    * compressed index. Here the filter prunes before encoding; in
    * production the codes pre-exist and the same predicate prunes the
    * code scan (codes are co-partitioned with their metadata), so the
    * filtered query reads |keep|·8 bytes, not the corpus. */
  def searchRerank(emb: DataFrame, qid: Int, k: Int, numSub: Int, subDim: Int,
                   numCodes: Int, shortlist: Int,
                   keep: Option[DataFrame] = None): DataFrame =
    searchRerankCb(emb, seededCodebook(emb, numSub, subDim, numCodes),
      qid, k, numSub, subDim, shortlist, keep)

  /** As `searchRerank` but over a caller-supplied codebook (m, code, cw) —
    * the seeded and KMeans-trained paths share everything downstream. */
  def searchRerankCb(emb: DataFrame, cb: DataFrame, qid: Int, k: Int,
                     numSub: Int, subDim: Int, shortlist: Int,
                     keep: Option[DataFrame] = None): DataFrame = {
    val cast = emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    val body0 = cast.filter(col("vec_id") =!= qid)
    val body = keep.fold(body0)(ids => body0.join(ids, "vec_id"))
    // codebook + ADC table are k·d model state: collected once (like KMeans
    // centroids), embedded as literals so the code scan is one narrow
    // codegen'd projection — see encodeFast
    val cbRows = cb.collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val qv = cast.filter(col("vec_id") === qid).select(col("v").as("qv"))
    // td values computed BY Spark (one 512-row job), so the literal table
    // is bit-identical to the joined form in both engines
    val td = adcTable(qv, cb, subDim).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // TWO small codegen'd steps, not one giant expression. A single fused
    // adist expression (argmin inlined into the td lookup, ~8× the size of
    // one code expression) is too deep for janino: whole-stage codegen
    // fails, the failure is NOT cached, and every task re-pays a slow
    // failed compile + interpreted tree-walk — 15-19 s per query at sf0.1
    // vs ~0.5 s split. Step 1 materializes the 9-column code projection
    // (each per-subspace argmin compiles fine); localCheckpoint is the
    // optimizer-OPAQUE barrier — with anything weaker (repartition tried),
    // Catalyst collapses the projections back into one and re-inlines the
    // argmin into the top-k's sort order, where TakeOrdered comparators
    // run INTERPRETED per comparison. The materialized relation is the
    // ~(8·8B codes + id) per row any PQ index stores anyway.
    val codes = Dedup.materialize(encodeFast(body, cbRows, numSub, subDim))
    // Step 2: td lookup per subspace as element_at over a literal array —
    // a small projection over bound code columns, whole-stage codegen'd.
    // (A CASE-key form desugars to per-branch EqualTo copies of the key,
    // duplicating the lookup 64×.)
    val adistExpr = (0 until numSub).map { m =>
      val tds = cbRows.filter(_._1 == m).sortBy(_._2)
        .map { case (_, c, _) => s"${td((m, c))}L" }
      s"element_at(array(${tds.mkString(", ")}), CAST(code_$m AS INT) + 1)"
    }.mkString(" + ")
    val short = codes
      .selectExpr("vec_id", s"CAST($adistExpr AS BIGINT) AS adist")
      .orderBy(col("adist").asc, col("vec_id").asc).limit(shortlist)
    val qfull = emb.filter(col("vec_id") === qid).select(col("embedding").as("q_vec"))
    emb.join(broadcast(short.select("vec_id")), "vec_id")
      .select("vec_id", "embedding")
      .crossJoin(broadcast(qfull))
      .withColumn("score", scaled(vectors.l2(col("embedding"), col("q_vec")), Knn.ScoreDigits))
      .orderBy(col("score").asc, col("vec_id").asc).limit(k)
      .select("vec_id", "score")
  }

  /** BATCHED PQ search (r7 verdict "next" #2): the reference's main loop is
    * per-query over a query FILE, and the compressed path must amortize
    * the way the exact/HNSW batch entries (A12/A35f) do — ONE code scan
    * serving every query. Encoding runs ONCE over the whole corpus (in
    * production the codes pre-exist from ingest; here the one encode pass
    * is the honest build cost); each query contributes only a literal
    * 512-entry ADC table to the projection. The scan then computes |Q|
    * adist columns per row, stacks them to (q_id, adist) rows — a narrow
    * generate, nothing shuffles yet — and the per-query shortlist comes
    * out of the map-side k-heap aggregate (TopKHits: ≤ |Q|·shortlist rows
    * per partition cross the only shuffle, never the |corpus|·|Q| scored
    * rows). The exact rerank joins ≤ |Q|·shortlist ids broadcast against
    * full vectors, per-query k-heaps again. Per-query results are
    * IDENTICAL to `searchRerank` (encode is per-row independent, so
    * encode-all-then-exclude ≡ exclude-then-encode) — spec-pinned.
    * Output: (q_id, vec_id, rank, score), the A12 batch convention. */
  /** `keep` (optional, single `vec_id` column) restricts the search to a
    * metadata-qualified subset — the ACORN-hybrid composition over the
    * compressed index, batched (query-INDEPENDENT filter: one keep set
    * serves the whole query file, so the pruned encode/scan still runs
    * once). Queries need no codes of their own (their side of the ADC is
    * the raw vector), so the code table holds keep members only. */
  def searchRerankBatch(emb: DataFrame, qids: Seq[Long], k: Int, numSub: Int,
                        subDim: Int, numCodes: Int, shortlist: Int,
                        keep: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.functions.posexplode
    requireBatchQids(qids, "searchRerankBatch")
    val cast0 = emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    val cast = keep.fold(cast0)(ids => cast0.join(ids, "vec_id"))
    val cbRows = seededCodebook(emb, numSub, subDim, numCodes).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    // ADC tables FIRST (they carry the absent-query-id guard and need no
    // encode) so a bad query set refuses before the corpus pays anything
    val td = adcTables(emb, qids, cbRows, subDim)
    // ONE encode pass over the (keep-pruned) corpus — query rows included
    // when unfiltered (each is corpus for the other queries); same
    // janino-depth split as the single-query path
    val codes = Dedup.materialize(encodeFast(cast, cbRows, numSub, subDim))
    val short = codes
      .selectExpr(Seq("vec_id") ++ adistCols(qids, cbRows, td, numSub): _*)
      .selectExpr("vec_id", stackExpr(qids))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id")
      .agg(graft.functions.aggs.topK(col("adist"), col("vec_id"), shortlist,
        asc = true).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("q_id"), col("hit.id").as("vec_id"))
    exactRerankBatch(emb, short, qids, k)
  }

  /** All queries' ADC tables in ONE Spark job (|Q|·K·M rows of model
    * state), keyed (q_id, m, code) → td. Computed BY Spark (not the
    * driver) so the literal tables are bit-identical to the joined form
    * in both engines — the searchRerank convention, batched. */
  def adcTables(emb: DataFrame, qids: Seq[Long],
                cbRows: Array[(Int, Long, Array[Double])],
                subDim: Int): Map[(Long, Int, Long), Long] = {
    requireBatchQids(qids, "batched PQ")
    val qvs = emb.filter(col("vec_id").isin(qids: _*))
      .selectExpr("vec_id AS q_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    val cbDf = emb.sparkSession.createDataFrame(
      cbRows.toIndexedSeq.map { case (m, c, cw) => (m, c, cw.toSeq) })
      .toDF("m", "code", "cw")
    val td = cbDf.crossJoin(broadcast(qvs))
      .selectExpr("q_id", "m", "code",
        s"slice(qv, m * $subDim + 1, $subDim) AS qsub", "cw")
      .selectExpr("q_id", "m", "code",
        s"${sqDistExpr("qsub", "cw", subDim, offset = false)} AS td")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    // a query id absent from the corpus would otherwise just vanish from
    // the answer set (the isin filter drops it) — refuse loudly instead
    val missing = qids.filterNot(q => td.contains((q, cbRows.head._1, cbRows.head._2)))
    require(missing.isEmpty,
      s"batched PQ: query ids absent from the corpus: ${missing.mkString(", ")}")
    td
  }

  /** One literal-array td-lookup adist column per query (`adist_<q>`)
    * over bound code_0..code_{M-1} columns. */
  def adistCols(qids: Seq[Long], cbRows: Array[(Int, Long, Array[Double])],
                td: Map[(Long, Int, Long), Long], numSub: Int): Seq[String] =
    qids.map { q =>
      val sum = (0 until numSub).map { m =>
        val tds = cbRows.filter(_._1 == m).sortBy(_._2)
          .map { case (_, c, _) => s"${td((q, m, c))}L" }
        s"element_at(array(${tds.mkString(", ")}), CAST(code_$m AS INT) + 1)"
      }.mkString(" + ")
      s"CAST($sum AS BIGINT) AS adist_$q"
    }

  /** stack() the per-query adist columns to (q_id, adist) rows — a narrow
    * generate, nothing shuffles. */
  def stackExpr(qids: Seq[Long]): String =
    s"stack(${qids.size}, " + qids.map(q =>
      s"CAST($q AS BIGINT), adist_$q").mkString(", ") + ") AS (q_id, adist)"

  /** Exact rerank of a (q_id, vec_id) candidate frame: broadcast joins to
    * full vectors + the per-query k-heap, emitting the A12 batch shape
    * (q_id, vec_id, rank, score). */
  def exactRerankBatch(emb: DataFrame, short: DataFrame, qids: Seq[Long],
                       k: Int): DataFrame = {
    import org.apache.spark.sql.functions.posexplode
    val qfull = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    emb.select("vec_id", "embedding")
      .join(broadcast(short), "vec_id")
      .join(broadcast(qfull), "q_id")
      .withColumn("score", scaled(vectors.l2(col("embedding"), col("q_vec")), Knn.ScoreDigits))
      .groupBy("q_id")
      .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), k, asc = true).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("q_id"), col("hit.id").as("vec_id"),
        (col("pos") + 1).cast("long").as("rank"), col("hit.score").as("score"))
  }

  /** BATCHED IVF×PQ (A24's batch form): per-query coarse probes prune the
    * code scan to the probed clusters' UNION, membership resolves per
    * (q_id, label) via a broadcast join of the ≤|Q|·nProbe probe pairs,
    * and everything downstream is the searchRerankBatch machinery — one
    * encode of the union, one code scan with |Q| literal ADC columns,
    * per-query k-heap shortlists, broadcast exact rerank. At 100 TB the
    * scan reads (distinct probed clusters)/C of an already-compressed
    * corpus — the batch shares clusters probed by several queries. */
  def ivfpqBatch(emb: DataFrame, qids: Seq[Long], k: Int, numSub: Int,
                 subDim: Int, numCodes: Int, nProbe: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.functions.posexplode
    val cbRows = seededCodebook(emb, numSub, subDim, numCodes).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    // ADC tables FIRST: adcTables holds the |Q| and absent-query-id
    // guards, and needs only (emb, qids, codebook) — refusing here costs
    // one tiny job instead of a probe pass + a union encode (r8 review)
    val td = adcTables(emb, qids, cbRows, subDim)
    val qs = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val probes = Dedup.materialize(Ivf.probeBatch(Ivf.centroids(emb), qs, nProbe))
    // encode ONLY the probed-cluster union, carrying label for membership
    val body = emb.join(broadcast(probes.select("label").distinct()), "label")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    val codeCols = (0 until numSub).map { m =>
      val cw = cbRows.filter(_._1 == m).sortBy(_._2).map(_._3)
      pq.nearestCode(col("v"), cw, m, subDim).as(s"code_$m")
    }
    val codes = Dedup.materialize(
      body.select(Seq(col("vec_id"), col("label")) ++ codeCols: _*))
    val short = codes
      .selectExpr(Seq("vec_id", "label") ++ adistCols(qids, cbRows, td, numSub): _*)
      .selectExpr("vec_id", "label", stackExpr(qids))
      .filter(col("vec_id") =!= col("q_id"))
      // per-(row, query) membership: the row's cluster must be one of THIS
      // query's probes — the label-keyed form that survives 100 TB (never
      // a per-vec_id membership list)
      .join(broadcast(probes), Seq("q_id", "label"))
      .groupBy("q_id")
      .agg(graft.functions.aggs.topK(col("adist"), col("vec_id"), shortlist,
        asc = true).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("q_id"), col("hit.id").as("vec_id"))
    exactRerankBatch(emb, short, qids, k)
  }
}
