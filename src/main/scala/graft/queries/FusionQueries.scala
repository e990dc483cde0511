package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cascade, Dedup, Ivf, Knn, Pq}

/** §2.A18–A20 — keyword relevance, rank fusion, and quantized vector search:
  * the retrieval surface a hybrid engine needs beyond pure vector kNN.
  *
  * All scoring is integer arithmetic (scaled rationals + integer division)
  * so both engines rank bit-identically — no fp .5 boundaries anywhere.
  *
  * Scale notes:
  *  - BM25: token stream is filtered to the query terms BEFORE the explode
  *    leaves the narrow scan, so the (doc, term) shuffle carries only
  *    matching postings; df and corpus stats are broadcast scalars. At
  *    100 TB this is the classic two-phase postings aggregation.
  *  - RRF fuses the top-R of each ranking (standard fused-list contract):
  *    both inputs arrive via TakeOrdered (no global sort), the rank windows
  *    run over ≤R pre-limited rows, and the fusion join is R×R-bounded.
  *  - SQ8: scalar quantization to 8-bit codes — 4× less scan I/O at equal
  *    layout, integer (SIMD-friendly, codegen'd) distance arithmetic; the
  *    (mn, mx) calibration is index-build state, broadcast at query time.
  */
object FusionQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  private val sTok = Dedup.TokExpr
  private val dTok = DuckDialect.Tok

  /** keyword query for B M25/RRF; IDF scale 10³ keeps (idf·tf·2200) far from
    * Long overflow even at billion-doc corpora. */
  private val QueryTerms = Seq("join", "vector", "stream")
  private val FuseR = 50 // fuse the top-R of each ranking
  private val RrfK = 60  // standard RRF dampening constant
  // A41: coarse-candidate count for the SQ8→exact refine stage; 5× the
  // final k absorbs quantization rank noise (FAISS's default k_factor
  // ballpark) while keeping the rerank join broadcast-trivially small
  private val RefineR = 50

  /** A37 binary quantization: 32 sign bits of `vec` starting at dim
    * `off` packed into one non-negative BIGINT — 32 explicit codegen'd
    * CASE terms (disjoint bits, so + is OR), token-identical in both
    * dialects via [[bqHalfDuck]]. */
  private def bqHalf(vec: String, off: Int): String = Cascade.bqHalf(vec, off)
  private[queries] def bqHalfDuck(vec: String, off: Int): String =
    (0 until 32).map(j =>
      s"(CASE WHEN $vec[${off + j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
  private val BqShortlist = 40 // 4× oversample before the exact rerank
  // A44 IVF×SQ8: shortlist width of the probed-cluster sq8 cut (4× k,
  // the BqShortlist oversampling convention)
  private val IvfSqShortlist = 40

  // A43 cascade funnel widths: corpus →(hamming) 100 →(sq8) 25 →(exact) 10
  private[queries] val CascStage1 = 100
  private[queries] val CascStage2 = 25
  // A43d IVF×cascade: stage-1 width inside the probed body — narrower than
  // the flat cascade's because the coarse quantizer already cut the corpus
  // (and so the cut stays active even at the smallest gate scale, where
  // two probed clusters hold ~100 rows)
  private val IvfCascStage1 = 50

  // A21e: build-once persisted PQ index per (JVM, sfDir) — the A35c
  // memoization convention (HybridQueries.ensureHnswIndex): racing callers
  // serialize on the build so none observes a mid-overwrite index
  private val pqIndexFor = scala.collection.mutable.Map.empty[String, String]
  private def ensurePqIndex(s: SparkSession, dir: String): String = synchronized {
    pqIndexFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("pq_index_" + graft.TmpDirs.dirKey(dir))
      Pq.buildAndWriteIndex(Tables(s, dir, "embeddings"), path,
        numSub = 8, subDim = 8, numCodes = 64)
      path
    })
  }

  // A21f: base-half persisted PQ index + incremental append of the rest —
  // the knn_ivf_append/knn_hnsw_append split convention. Memoized like the
  // full index so racing callers serialize on build+append and none
  // observes a half-appended code table.
  private val pqAppendedFor = scala.collection.mutable.Map.empty[String, String]
  private def ensurePqAppendedIndex(s: SparkSession, dir: String): String = synchronized {
    pqAppendedFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("pq_append_" + graft.TmpDirs.dirKey(dir))
      val e = Tables(s, dir, "embeddings")
      Pq.buildAndWriteIndex(e.filter(col("vec_id") < HybridQueries.IvfAppendSplit),
        path, numSub = 8, subDim = 8, numCodes = 64)
      Pq.appendToIndex(s, path,
        e.filter(col("vec_id") >= HybridQueries.IvfAppendSplit),
        numSub = 8, subDim = 8)
      path
    })
  }
  // A21h: the persisted PQ index at the REFERENCE width — build-once memo
  // per (JVM, sfDir), the ensurePqIndex convention over the A45
  // derived-wide frame (16×128-dim subspaces, 64 seeded codewords)
  private val pqWideIndexFor = scala.collection.mutable.Map.empty[String, String]
  private def ensurePqWideIndex(s: SparkSession, dir: String): String = synchronized {
    pqWideIndexFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("pq_wide_index_" + graft.TmpDirs.dirKey(dir))
      Pq.buildAndWriteIndex(HybridQueries.wideEmbeddings(s, dir), path,
        numSub = 16, subDim = 128, numCodes = 64)
      path
    })
  }

  // A21i: base-half wide index + incremental append — the A21f split
  // convention at the reference width (base = vec_id < IvfAppendSplit,
  // the rest arrive and encode with the STORED codebook)
  private val pqWideAppendedFor = scala.collection.mutable.Map.empty[String, String]
  private def ensurePqWideAppendedIndex(s: SparkSession, dir: String): String =
    synchronized {
      pqWideAppendedFor.getOrElseUpdate(dir, {
        val path = graft.TmpDirs.path("pq_wide_append_" + graft.TmpDirs.dirKey(dir))
        val w = HybridQueries.wideEmbeddings(s, dir)
        Pq.buildAndWriteIndex(w.filter(col("vec_id") < HybridQueries.IvfAppendSplit),
          path, numSub = 16, subDim = 128, numCodes = 64)
        Pq.appendToIndex(s, path,
          w.filter(col("vec_id") >= HybridQueries.IvfAppendSplit),
          numSub = 16, subDim = 128)
        path
      })
    }

  /** A52: the CONSUMER-proven export hand-off (r16 verdict next #5 — the
    * Pq SchemaVersion contract was producer-gated only: the engine's own
    * restore path validated what the engine wrote, but nothing proved an
    * EXTERNAL engine could serve from the artifacts). The artifacts
    * persist at a FIXED path under target/ — NOT the per-process TmpDirs
    * root, which is deleted at JVM exit: the DuckDB oracle (standing in
    * for the external serving engine BASELINE.json's charter names) runs
    * AFTER this JVM's Verify pass and `read_parquet`s the very files the
    * engine wrote. Rebuilt whenever the (JVM, sfDir) pair changes so a
    * scale switch never serves a stale corpus' artifacts; within one
    * run the build happens once and every serve is restore-only. */
  private[queries] val PqConsumerPath = "/root/repo/target/pq_consumer_2048/index"
  private var pqConsumerBuiltFor: Option[String] = None
  private def ensurePqConsumerExport(s: SparkSession, dir: String): String =
    synchronized {
      if (!pqConsumerBuiltFor.contains(dir)) {
        Pq.buildAndWriteIndex(HybridQueries.wideEmbeddings(s, dir),
          PqConsumerPath, numSub = 16, subDim = 128, numCodes = 64)
        pqConsumerBuiltFor = Some(dir)
      }
      PqConsumerPath
    }

  // A43c recall sweep: stage-1 widths of the funnel's recall/width curve
  private val CascWidths = Seq(25, 50, 100, 200)

  /** Shared CTE prefix of the batched-cascade oracles: codes, sq8
    * calibration, the `maxQ + 1`-query set, and the per-q_id Hamming
    * ranking. */
  private def cascBaseDuck(maxQ: Int = 7, bodyJoin: String = ""): String =
    s"""b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  ${bqHalfDuck("embedding", 0)} AS lo,
       |  ${bqHalfDuck("embedding", 32)} AS hi FROM embeddings),
       |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
       |              max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
       |qs AS (SELECT vec_id AS q_id, lo AS q_lo, hi AS q_hi, v AS q_vec FROM b WHERE vec_id <= $maxQ),
       |h AS (SELECT q.q_id, b.vec_id, b.v, q.q_vec,
       |    CAST(bit_count(xor(b.lo, q.q_lo)) + bit_count(xor(b.hi, q.q_hi)) AS BIGINT) AS ham
       |  FROM b $bodyJoin CROSS JOIN qs q WHERE b.vec_id <> q.q_id),
       |r1 AS (SELECT h.*, row_number() OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id ASC) AS rn1
       |  FROM h)""".stripMargin

  /** One funnel replay at stage-1 width `width`, CTEs suffixed `tag`;
    * ends with r3`tag` carrying (q_id, vec_id, ham, d8, score, rn3). */
  /** [[cascBaseDuck]] at the derived 2048-d width (r12): packed-code
    * arrays replace the lo/hi pair (the BqPackVec bit order), Hamming is
    * the 64-group bit_count(xor) fold. Ends with the same r1 CTE shape,
    * so [[cascFunnelDuck]] chains on unchanged (it is width-generic —
    * len(s.v)-driven sq8, list cosine). */
  /** The A47 external-query construction: component-wise midpoints of
    * corpus pairs (2g, 2g+1) for 2g < maxVecId, one deterministic float
    * round per component — both engines derive identical non-indexed
    * vectors with no new table. q_id = g. */
  private def externalMidpointQueries(e: DataFrame, maxVecId: Int): DataFrame = {
    val a = e.filter(col("vec_id") % 2 === 0 && col("vec_id") < maxVecId)
      .selectExpr("vec_id div 2 AS q_id", "CAST(embedding AS ARRAY<DOUBLE>) AS va")
    val b = e.filter(col("vec_id") % 2 === 1 && col("vec_id") < maxVecId)
      .selectExpr("vec_id div 2 AS q_id", "CAST(embedding AS ARRAY<DOUBLE>) AS vb")
    a.join(b, "q_id").selectExpr("q_id",
      "zip_with(va, vb, (x, y) -> CAST((x + y) * 0.5D AS FLOAT)) AS q_vec")
  }

  /** The IVF×SQ8 pipeline over a (vec_id, label, embedding, v) frame —
    * A44 `knn_ivfsq` (d=64) and A44b `knn_ivfsq_2048` share ONE
    * construction path (the residualModel convention). Calibration
    * threads [[Cascade.calibrationAndPresence]] so an absent qid fails
    * LOUDLY instead of silently emptying the entry — an empty result
    * would hash-match the oracle's equally-empty frame and the gate
    * would pass vacuously. */
  private def ivfsqSearch(ev: DataFrame, qid: Long): DataFrame = {
    val stats = Cascade.calibrationAndPresence(ev, Seq(qid))
    val q = ev.filter(col("vec_id") === qid)
      .select(col("v").as("qd"), col("embedding").as("q_vec"))
    val probed = Ivf.probe(Ivf.centroids(ev),
      ev.filter(col("vec_id") === qid).select(col("embedding").as("q_vec")),
      nProbe = 2)
    val vecs = graft.functions.vectors
    ev.filter(col("vec_id") =!= qid)
      .join(broadcast(probed), "label")
      .crossJoin(broadcast(q)).crossJoin(broadcast(stats))
      // sq8 + integer sq-L2 kernels (the knn_sq8 swap; spec-pinned)
      .select(col("vec_id"), col("embedding"), col("q_vec"),
        vecs.sq8(col("v"), col("mn"), col("mx")).as("qa"),
        vecs.sq8(col("qd"), col("mn"), col("mx")).as("qb"))
      .withColumn("d8", vecs.sqDistLong(col("qa"), col("qb")))
      .orderBy(col("d8").asc, col("vec_id").asc).limit(IvfSqShortlist)
      .withColumn("score", graft.functions.scaled(
        vecs.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
      .orderBy(col("score").desc, col("vec_id").asc).limit(10)
      .select("vec_id", "score", "d8")
  }

  /** `qsSelect` replaces the indexed-query CTE (must yield q_id, q_p —
    * the 64-long packed code — and q_vec; the C71e external wide serve
    * derives non-indexed queries) and `excludeSelf` drops the
    * self-exclusion (external q_ids name no corpus row) — the
    * pqBatchWideOracleSql2048 convention. */
  private[queries] def cascBaseDuckWide(maxQ: Int = 7,
                                        qsSelect: Option[String] = None,
                                        excludeSelf: Boolean = true): String = {
    val qsCte = qsSelect.getOrElse(
      s"SELECT vec_id AS q_id, p AS q_p, v AS q_vec FROM b WHERE vec_id <= $maxQ")
    val excl = if (excludeSelf) " WHERE b.vec_id <> q.q_id" else ""
    s"""wide AS MATERIALIZED (SELECT vec_id,
       |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
       |b AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  list_transform(range(0, 64), g ->
       |    list_reduce(list_transform(range(0, 32), j ->
       |      CASE WHEN embedding[g*32 + j + 1] > 0.0 THEN CAST(1 AS BIGINT) << j
       |           ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y)) AS p
       |  FROM wide),
       |st AS (SELECT min(list_min(v)) AS mn, max(list_max(v)) AS mx FROM b),
       |qs AS ($qsCte),
       |h AS (SELECT q.q_id, b.vec_id, b.v, q.q_vec,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      i -> bit_count(xor(b.p[i], q.q_p[i])))) AS BIGINT) AS ham
       |  FROM b CROSS JOIN qs q$excl),
       |r1 AS (SELECT h.*, row_number() OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id ASC) AS rn1
       |  FROM h)""".stripMargin
  }

  private def cascFunnelDuck(width: Int, tag: String): String = {
    def q8(x: String) = s"CAST(floor((($x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)"
    s"""s1$tag AS (SELECT q_id, vec_id, v, q_vec, ham FROM r1 WHERE rn1 <= $width),
       |z$tag AS (SELECT s.q_id, s.vec_id, s.v, s.q_vec, s.ham,
       |    CAST(list_sum(list_transform(range(1, len(s.v) + 1),
       |      i -> (${q8("s.v[i]")} - ${q8("s.q_vec[i]")})
       |         * (${q8("s.v[i]")} - ${q8("s.q_vec[i]")}))) AS BIGINT) AS d8
       |  FROM s1$tag s CROSS JOIN st),
       |r2$tag AS (SELECT z$tag.*, row_number() OVER (PARTITION BY q_id ORDER BY d8 ASC, vec_id ASC) AS rn2
       |  FROM z$tag),
       |s2$tag AS (SELECT q_id, vec_id, v, q_vec, ham, d8 FROM r2$tag WHERE rn2 <= $CascStage2),
       |f$tag AS (SELECT q_id, vec_id, ham, d8,
       |    CAST(floor(list_cosine_similarity(v, q_vec) * 10000 + 0.5) AS BIGINT) AS score
       |  FROM s2$tag),
       |r3$tag AS (SELECT f$tag.*, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rn3
       |  FROM f$tag)""".stripMargin
  }

  /** A40/A40b shared body over any (vec_id, embedding) frame: top-MmrR
    * relevance shortlist (TakeOrdered), R² pairwise sim via a broadcast
    * self-join, then the greedy λ-tradeoff loop over collected R + R²
    * integer model state (MMR is sequential by definition — each pick
    * conditions on the last; the distributed part is the shortlist and
    * the sim matrix). The exact-count guard refuses an absent query id
    * or a shortlist the corpus cannot fill — either would empty both
    * entry and oracle and the hash gate would pass vacuously. */
  private def mmrDiversified(s: SparkSession, frame: DataFrame,
                             who: String): DataFrame = {
    val q = frame.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
    val sl = frame.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("rel", graft.functions.scaled(
        graft.functions.vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(MmrR)
      .select("vec_id", "embedding", "rel")
    val a = sl.select(col("vec_id").as("ai"), col("embedding").as("ea"))
    val b = sl.select(col("vec_id").as("bi"), col("embedding").as("eb"))
    val simRows = a.join(broadcast(b), col("ai") =!= col("bi"))
      .withColumn("s", graft.functions.scaled(
        graft.functions.vectors.cosine(col("ea"), col("eb")), Knn.ScoreDigits))
      .select("ai", "bi", "s")
    val rel = sl.select("vec_id", "rel").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(rel.size == MmrR,
      s"$who: relevance shortlist holds ${rel.size} of $MmrR expected rows " +
        "— an absent query id (or an under-filled corpus) would empty both " +
        "entry and oracle and the gate would pass vacuously")
    val sim = simRows.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    var selected = Vector.empty[(Long, Long)] // (vec_id, mmr)
    var remaining = rel.keySet
    for (_ <- 1 to MmrK if remaining.nonEmpty) {
      val pick = remaining.toSeq.map { c =>
        val maxSim =
          if (selected.isEmpty) 0L
          else selected.map(sv => sim((c, sv._1))).max
        (c, MmrLambda * rel(c) - (10000L - MmrLambda) * maxSim)
      }.minBy { case (c, m) => (-m, c) }
      selected :+= pick
      remaining -= pick._1
    }
    import s.implicits._
    selected.zipWithIndex
      .map { case ((id, m), i) => ((i + 1).toLong, id, m) }
      .toDF("rank", "vec_id", "mmr")
  }

  // A40 MMR: relevance shortlist size, diversified picks, λ ×10⁴
  // (λ = 5000 weighs relevance and redundancy equally)
  private val MmrR = 20
  private val MmrK = 5
  private val MmrLambda = 5000L
  // A38: half-dim prefix + 6.4× oversample — the measured knee on this
  // corpus (16 dims keeps only 4/10; 32/64 keeps 7/10 at sf0.001)
  private val MrlDims = 32
  private val MrlShortlist = 64
  // A38b: the published MRL shape — an 8× truncation of the 2048-d frame
  // (prefixes of MRL-trained embeddings are semantically ordered; the
  // derived-wide prefix covers every base dim with its lowest multipliers,
  // so cluster structure survives — spec-measured recall ≥ 6/10)
  private val MrlDims2048 = 256

  /** A39 late interaction: tokens per passage vector, vector dims, and the
    * query document whose passage multi-vector scores the corpus. */
  private val MvChunk = 8
  private val MvDims = 8
  private val MvQueryDoc = 0L

  /** Per-passage deterministic integer pseudo-embedding — the honest stub
    * for a per-token encoder (same contract as sources/Multimodal
    * embedStub): component i = md5-hash(passage ‖ '_' ‖ i) % 2001 − 1000,
    * so both engines derive identical vectors from content alone. A real
    * ColBERT-style encoder drops into this projection; everything
    * downstream (MaxSim, shuffles, oracle) is encoder-agnostic. */
  private def mvPassages(s: SparkSession, dir: String): DataFrame =
    // spread the passage featurization (r17 optimization, guide §2.5):
    // every passage component is an md5-derived integer, so the
    // projection is the entry's dominant CPU and the one-row-group gate
    // corpus would run it on a single task; spreadHeavyKernel moves the
    // raw doc rows once and is a no-op when the scan is already parallel
    Pq.spreadHeavyKernel(docs(s, dir), opsPerRow = 1 << 20)
      .selectExpr("doc_id", s"$sTok AS tk")
      .filter(size(col("tk")) > 0)
      .selectExpr("doc_id",
        s"""transform(sequence(0, (size(tk) - 1) div $MvChunk),
           |  i -> array_join(slice(tk, i * $MvChunk + 1, $MvChunk), ' ')) AS chunks""".stripMargin)
      .select(col("doc_id"), posexplode(col("chunks")).as(Seq("pos", "passage")))
      .selectExpr("doc_id", "CAST(pos AS BIGINT) AS pos",
        s"""transform(sequence(0, ${MvDims - 1}),
           |  i -> ${graft.functions.md5Hash60Sql("concat(passage, '_', i)")} % 2001 - 1000) AS pv""".stripMargin)

  /** Integer BM25 (k1=1.2, b=0.75, both ×1000): per-(doc, term) score is
    * idf(t) · tf · (k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with every factor a
    * scaled integer and every division truncating — identical in both
    * engines. idf is the monotone rational form (N−df+1)/(df+1), ×1000. */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val tk = docs(s, dir).selectExpr("doc_id", s"$sTok AS tk")
    val stats = tk.selectExpr("CAST(size(tk) AS BIGINT) AS dl")
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sumdl"))
      .selectExpr("n_docs", "sumdl div n_docs AS avgdl")
    val tf = tk.selectExpr("doc_id", "CAST(size(tk) AS BIGINT) AS dl", "explode(tk) AS tok")
      .filter(col("tok").isin(QueryTerms: _*))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfx), "tok").crossJoin(broadcast(stats))
      .withColumn("term_score", expr(
        "((((n_docs - df + 1) * 1000) div (df + 1)) * tf * 2200) div " +
          "(tf * 1000 + (1200 * (250 + (750 * dl) div avgdl)) div 1000)"))
      .groupBy("doc_id").agg(sum("term_score").as("bm25"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A18: keyword top-k by integer BM25
    "text_bm25" -> ((s, dir) =>
      bm25Scores(s, dir).orderBy(col("bm25").desc, col("doc_id")).limit(10)),

    // A26: boolean-AND keyword retrieval (the conjunctive complement of
    // BM25's ranked retrieval): docs containing EVERY query term, ranked by
    // total term frequency. The entire filter+score is one narrow codegen'd
    // scan — array_contains per term, one filtered size() for tf — followed
    // by TakeOrdered: zero shuffles before the k-row driver merge, the best
    // scale shape retrieval can have.
    "keyword_search" -> ((s, dir) => {
      val mustHave = QueryTerms.map(t => s"array_contains(tk, '$t')").mkString(" AND ")
      val inSet = QueryTerms.map(t => s"x = '$t'").mkString(" OR ")
      docs(s, dir).selectExpr("doc_id", s"$sTok AS tk")
        .filter(expr(mustHave))
        .selectExpr("doc_id", s"CAST(size(filter(tk, x -> $inSet)) AS BIGINT) AS tf")
        .orderBy(col("tf").desc, col("doc_id")).limit(20)
    }),

    // A36: positional phrase search — exact n-word phrase matching, the
    // ordered complement of A26's boolean bag-of-words. A phrase of n words
    // IS an n-shingle, so the match is the codegen'd WordShingles kernel +
    // an equality filter: the entire per-doc occurrence count and first
    // token position come out of ONE narrow scan (zero pre-limit shuffles,
    // the keyword_search scale shape). The phrase itself is the corpus's
    // top 3-gram (count desc, phrase asc — total order), so the entry is
    // self-contained at any sf; the 1-row phrase broadcasts to the scan.
    "phrase_search" -> ((s, dir) => {
      val sh = docs(s, dir).select(col("doc_id"),
        graft.functions.text.shingles(expr(sTok), 3).as("s"))
      val top = sh.select(explode(col("s")).as("p"))
        .groupBy("p").agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("p").asc).limit(1).select("p")
      sh.join(broadcast(top), expr("array_contains(s, p)"))
        .selectExpr("doc_id", "p AS phrase",
          "CAST(size(filter(s, x -> x = p)) AS BIGINT) AS n_occ",
          "CAST(array_position(s, p) AS BIGINT) AS first_pos")
    }),

    // A39: multi-vector late-interaction retrieval (ColBERT-style MaxSim) —
    // each document is a BAG of passage vectors and the query is another
    // document's bag; score(Q, D) = Σ_{q∈Q} max_{p∈D} ⟨q, p⟩. This is the
    // retrieval model between single-vector kNN (A6) and full cross-
    // attention: token-level matching at embedding-index cost. Shape: the
    // passage projection is narrow (chunk HOF + per-component hash, no
    // shuffle); the query bag (|Q| rows) broadcasts; the per-(doc, q_pos)
    // max partial-aggregates MAP-SIDE, so the only shuffle carries
    // |docs|·|Q| pre-maxed rows — never the |passages|·|Q| scored rows —
    // then a |docs|-row sum and a TakeOrdered top-10. Integer dot products
    // end to end (components ∈ [-1000, 1000]), so the ranking is
    // engine-exact.
    "multivector_maxsim" -> ((s, dir) => {
      val p = mvPassages(s, dir)
      val q = p.filter(col("doc_id") === MvQueryDoc)
        .select(col("pos").as("q_pos"), col("pv").as("qv"))
      p.filter(col("doc_id") =!= MvQueryDoc)
        .crossJoin(broadcast(q))
        // codegen'd integer kernel — the HOF form (aggregate ∘ zip_with)
        // evaluates its lambda per element outside whole-stage codegen,
        // which dominated this entry's wall time (r5 bench regression)
        .withColumn("dot", graft.functions.vectors.dotLong(col("pv"), col("qv")))
        .groupBy("doc_id", "q_pos").agg(max("dot").as("m"))
        .groupBy("doc_id").agg(sum("m").as("maxsim"))
        .orderBy(col("maxsim").desc, col("doc_id").asc)
        .limit(10)
    }),

    // A40: MMR-diversified rerank (Carbonell & Goldstein '98) — the
    // DIVERSITY member of the rerank family (RRF fuses rankings, this
    // de-redundifies one): greedily pick k of a top-R shortlist maximizing
    // λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s). MMR is sequential BY
    // DEFINITION (each pick conditions on the last), so the scale-bearing
    // work is the distributed part: the top-R shortlist via TakeOrdered
    // and the R² pairwise sim matrix via a broadcast self-join; the greedy
    // loop runs on collected shortlist state (R + R² integer rows — the
    // KMeans/PQ model-state contract), k·R integer ops. Every sim is the
    // scaled cosine, so the oracle's unrolled 5-pick CTE chain reproduces
    // the selection bit-exactly.
    "knn_mmr" -> ((s, dir) =>
      mmrDiversified(s, Tables(s, dir, "embeddings"), "knn_mmr")),

    // A40b: MMR at the REFERENCE width — the R² pairwise sim matrix and
    // the relevance shortlist both pay 2048-term cosines (the greedy
    // driver loop itself is width-independent integer arithmetic on the
    // collected R + R² model state); same unrolled-CTE oracle shape with
    // every cosine over the wide frame.
    "knn_mmr_2048" -> ((s, dir) =>
      mmrDiversified(s, HybridQueries.wideEmbeddings(s, dir), "knn_mmr_2048")),

    // A19: reciprocal-rank fusion of the keyword and vector rankings
    "hybrid_rrf" -> ((s, dir) => {
      val kw = bm25Scores(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(FuseR)
      val kwr = kw.withColumn("rank_kw",
          row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select("doc_id", "rank_kw")
      val e = Tables(s, dir, "embeddings")
      val vt = Knn.topK(
        e.filter(col("vec_id") =!= 0).select("vec_id", "embedding"),
        e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec")),
        FuseR, Knn.Cosine)
      val vr = vt.withColumn("rank_vec",
          row_number().over(Window.orderBy(col("score").desc, col("vec_id"))))
        .selectExpr("vec_id AS doc_id", "rank_vec")
      kwr.join(vr, Seq("doc_id"), "full_outer")
        .withColumn("rrf", expr(
          s"CAST(coalesce(1000000 div ($RrfK + rank_kw), 0)" +
            s" + coalesce(1000000 div ($RrfK + rank_vec), 0) AS BIGINT)"))
        .select("doc_id", "rrf")
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
    }),

    // A21: product-quantized search — 8×8-dim subspaces, 64 seeded codewords
    // each, ADC shortlist over the codes, exact L2 rerank of the shortlist
    "knn_pq" -> ((s, dir) =>
      Pq.searchRerank(Tables(s, dir, "embeddings"), qid = 0, k = 10,
        numSub = 8, subDim = 8, numCodes = 64, shortlist = 100)),

    // A21e: the persisted-index LIFECYCLE for the compressed family — the
    // A35c build-once/serve-many shape applied to PQ: the one-time build
    // encodes the WHOLE corpus and writes the two artifacts any PQ index
    // stores (the M-bytes-per-row wide code table and the k·d codebook)
    // as parquet; the timed body restores the codebook, scans the STORED
    // codes (never re-encodes), and pages raw floats only for the
    // ≤shortlist rerank rows. Parquet IS the index format: the code table
    // stays a distributed partition-prunable relation, so at 100 TB a
    // serving session reads 8 B/row of codes where the build read d
    // floats. Query id 9 stays in the corpus (query-by-indexed-item,
    // excluded at serve time — encode-all-then-exclude ≡ the oracle's
    // exclude-then-encode, the identity the batch paths already pin).
    "knn_pq_persisted" -> ((s, dir) => {
      val path = ensurePqIndex(s, dir)
      Pq.searchPersisted(s, path, Tables(s, dir, "embeddings"), qid = 9,
        k = 10, numSub = 8, subDim = 8, shortlist = 100)
    }),

    // A21f: incremental ADD to the persisted PQ index (reference
    // acorn.py:61 add_items while serving — the maintenance path that
    // completes the lifecycle symmetry: IVF has A30, HNSW has A35d, this
    // is the compressed family's). Base index persists the first
    // IvfAppendSplit ids; the rest ARRIVE, encode with the STORED codebook
    // (never retrained — drift is handled by periodic rebuild, the A30
    // convention) and append as new parquet files. Encode is per-row
    // independent and the seeded codebook's 64 codewords all sit inside
    // the base half, so appended-index serve ≡ full-rebuild serve
    // row-for-row (spec-pinned) and the single-query PQ oracle replays it
    // verbatim. At 100 TB the append writes |arriving|·8 bytes and never
    // touches the existing code table.
    "knn_pq_append" -> ((s, dir) => {
      val path = ensurePqAppendedIndex(s, dir)
      Pq.searchPersisted(s, path, Tables(s, dir, "embeddings"), qid = 5,
        k = 10, numSub = 8, subDim = 8, shortlist = 100)
    }),

    // A47: EXTERNAL-query batch serving (r11 verdict next #5): nearly
    // every search entry queries by INDEXED ITEM (the qid is excluded at
    // serve time), but the reference's actual demo embeds a query image
    // that is NOT in the corpus (query.jpg, acorn.py __main__). Four
    // query vectors arrive as their own frame — component-wise midpoints
    // of corpus pairs (2g, 2g+1), one deterministic float round, so both
    // engines derive identical non-indexed vectors with no new table —
    // and the wide joined-ADC funnel serves them with NO self-exclusion
    // and the rerank joining the frame's raw vectors: the pin that
    // nothing in the batch machinery secretly depends on the query being
    // indexed.
    "knn_pq_batch_external" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val queries = externalMidpointQueries(e, 8)
      Pq.searchRerankBatchWideExternal(e, queries, k = 10,
        numSub = 8, subDim = 8, numCodes = 64, shortlist = 100)
    }),

    // A47b: EXTERNAL × SHARDED (r12 verdict next #6): the sharded drivers
    // all assumed indexed qids; a production query FILE is external and
    // unbounded, so the cap-and-union path must run on a non-indexed
    // frame too. 128 external midpoint queries (the A47 construction at
    // |Q|=128) split into 3 passes at cap=48 — the cross-shard duplicate
    // guard validates the WHOLE input frame before any corpus work, the
    // seeded codebook is collected once and threaded through every pass,
    // and the union is row-identical to one uncapped pass (spec-pinned).
    // Pins that the shard machinery never assumes a corpus row.
    "knn_pq_batch_external_sharded" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val queries = externalMidpointQueries(e, 256)
      Pq.searchRerankBatchShardedWideExternal(e, queries, k = 10,
        numSub = 8, subDim = 8, numCodes = 64, shortlist = 100, cap = 48)
    }),

    // A21h: the PERSISTED PQ lifecycle at the reference width (r13
    // verdict next #3): the one-time build encodes the whole derived-wide
    // corpus and stores the 16-bytes-per-row code table + the 16-subspace
    // codebook as parquet (reference acorn.py:61 add_items → serve, at
    // the d=2048 it actually builds); the timed body restores the
    // codebook, scans the STORED codes — never re-encoding — and pages
    // raw wide floats only for the ≤100-row rerank. Turns PROBE_r13's
    // "codes pre-exist from ingest in production" comment (the 15.7 s
    // residual-probe caveat) into a gated plan: at 100 TB a serving
    // session reads 16 B/row where the build read 8 KB. Query id 9 stays
    // in the corpus (the A21e convention); persistence must not change a
    // single row, so the fresh-pipeline wide oracle replays it verbatim.
    "knn_pq_persisted_2048" -> ((s, dir) => {
      val path = ensurePqWideIndex(s, dir)
      Pq.searchPersisted(s, path, HybridQueries.wideEmbeddings(s, dir),
        qid = 9, k = 10, numSub = 16, subDim = 128, shortlist = 100)
    }),

    // A52: the export contract proven FROM THE CONSUMER SIDE at the
    // reference width. The engine builds + serves exactly as A21h
    // (restore codebook, scan stored codes, rerank ≤100 raw rows) — but
    // from the FIXED export path, and the ORACLE is the consumer: DuckDB
    // `read_parquet`s the persisted codebook and code table directly (no
    // re-encode, no replayed training — the artifacts ARE its inputs),
    // derives the query's ADC table from the STORED codewords, ranks the
    // STORED codes, and reranks over the corpus. Scope is honest and
    // deliberate: artifact CORRECTNESS (stored ≡ freshly-trained) is
    // A21h's fresh-pipeline oracle; THIS oracle pins that the on-disk
    // layout alone suffices for an external engine to reproduce the
    // serve bit-for-bit — the hand-off BASELINE.json's charter names.
    // The oracle's cb CTE is vintage-GATED (schema_version must match on
    // every row): tampered or foreign-vintage artifacts empty the
    // consumer's codebook, the serve returns zero rows, and the gate
    // goes RED — refusal on the consumer path is observable, not silent.
    "knn_pq_consumer_restore_2048" -> ((s, dir) => {
      val path = ensurePqConsumerExport(s, dir)
      Pq.searchPersisted(s, path, HybridQueries.wideEmbeddings(s, dir),
        qid = 7, k = 10, numSub = 16, subDim = 128, shortlist = 100)
    }),

    // A21i: incremental ADD to the persisted WIDE index — the add_items
    // maintenance path (reference acorn.py:61) at the d=2048 it runs:
    // base = the first IvfAppendSplit wide rows build+persist, the rest
    // ARRIVE and encode with the STORED codebook (never retrained — the
    // A21f convention), appending 16 B/row of new parquet while the
    // existing code table is never rewritten. Codeword seeds (vec_id <
    // 64) all sit inside the base half and encode is per-row
    // independent, so appended-serve ≡ full-rebuild serve row-for-row
    // and the fresh wide pipeline oracle replays it at query id 5.
    "knn_pq_append_2048" -> ((s, dir) => {
      val path = ensurePqWideAppendedIndex(s, dir)
      Pq.searchPersisted(s, path, HybridQueries.wideEmbeddings(s, dir),
        qid = 5, k = 10, numSub = 16, subDim = 128, shortlist = 100)
    }),

    // A21j: SHARDED wide-batch PQ at the reference width — the past-cap
    // driver shape (A21d) over the wide frame: the same 8-query file as
    // A21g forced through THREE ≤3-query wide passes and unioned (cap
    // parameterized; production caps at WideBatchCap=4096 and this shape
    // appears only past it). Every q_id lands in exactly one shard ⇒
    // results ≡ one uncapped pass ⇒ the oracle IS the same wide batch
    // replay — the driver independently verifies the cap-and-union path
    // at d=2048 end-to-end.
    "knn_pq_batch_sharded_2048" -> ((s, dir) =>
      Pq.searchRerankBatchShardedWide(HybridQueries.wideEmbeddings(s, dir),
        qids = (0L until 8L), k = 10, numSub = 16, subDim = 128,
        numCodes = 64, shortlist = 100, cap = 3)),

    // A23d: the FILTERED wide batch at the reference width — the
    // ACORN-hybrid composition (metadata keep set prunes the encode and
    // the one code scan; queries come from the FULL table — the filter
    // qualifies candidates, never who may ask), amortized over the query
    // file with the broadcast (q_id, tds) ADC relation at d=2048. The
    // last composition of {filtered} × {wide-batch} × {width}.
    "hybrid_knn_pq_batch_wide_2048" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Pq.searchRerankBatchWide(HybridQueries.wideEmbeddings(s, dir),
        qids = (0L until 8L), k = 10, numSub = 16, subDim = 128,
        numCodes = 64, shortlist = 100, keep = Some(keep))
    }),

    // A47c: EXTERNAL queries at the REFERENCE width — the reference's
    // actual demo shape end-to-end: acorn.py `__main__` embeds a query
    // image that is NOT in the corpus (query.jpg) and serves it against
    // the d=2048 index it builds (:30–40); until now the external-query
    // machinery gated only at d=64 (A47/A47b) and the wide gates only
    // queried by indexed item. Four external midpoint queries derived
    // from WIDE vector pairs (one float round per component — both
    // engines derive identical non-indexed 2048-d vectors with no new
    // table) ride the broadcast (q_id, tds) ADC relation with NO
    // self-exclusion and the rerank joining the frame's raw vectors —
    // the pin that nothing in the wide-batch machinery secretly depends
    // on the query being indexed, at the width it runs in production.
    "knn_pq_batch_external_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      Pq.searchRerankBatchWideExternal(w, externalMidpointQueries(w, 8),
        k = 10, numSub = 16, subDim = 128, numCodes = 64, shortlist = 100)
    }),

    // A24e: SHARDED wide-batch IVF×PQ at the reference width (r14
    // verdict next #5 — A21j proved the cap-and-union shape at d=2048
    // for plain PQ only; the label-keyed coarse-quantizer family had
    // sharded drivers only at d=64). The A24d 8-query file forced
    // through THREE ≤3-query wide passes: per-query probes are
    // independent, so sharding the query file shards the probe set with
    // it and each pass scans only ITS chunk's probed-cluster union.
    // Every q_id lands in exactly one shard ⇒ union ≡ one uncapped pass
    // ⇒ the oracle IS the A24d wide batch replay.
    "knn_ivfpq_batch_sharded_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      Pq.ivfpqBatchShardedWide(e, qids = (0L until 8L), k = 10,
        numSub = 16, subDim = 128, numCodes = 64, nProbe = 2,
        shortlist = 100, cap = 3)
    }),

    // A42f: SHARDED wide-batch RESIDUAL IVF×PQ at the reference width —
    // the A42e pipeline through the cap-and-union driver: rows encode
    // against their OWN centroid (query-independent), so the encode is
    // chunk-independent too and union ≡ one uncapped pass; the oracle IS
    // the A42e replay.
    "knn_ivfpq_residual_batch_sharded_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      Pq.ivfpqResidualBatchShardedWide(e, qids = (0L until 8L), k = 10,
        numSub = 16, subDim = 128, numCodes = 16, nProbe = 2,
        shortlist = 100, cap = 3)
    }),

    // A24d: WIDE-batch IVF×PQ at the REFERENCE width (r13 verdict next
    // #2): the amortized serving plan for the reference's query-file loop
    // at the width it builds (acorn.py `__main__` serves a query FILE
    // against the d=2048 index of :30–40) — A24c's label-keyed
    // (q_id, label, tds) broadcast relation over the A45 derived-wide
    // frame. Per-query probes rank the 2048-d centroids (scaled cosine
    // desc, label asc), the ONE code scan reads only the probed clusters'
    // union, membership and ADC resolve in a single broadcast join, and
    // map-side k-heaps cut the shortlists — O(1) plan size in |Q| at the
    // width where each query's ADC table is 16×64 lookup entries of
    // 128-dim folds. Per-query results ≡ knn_ivfpq_2048 (spec-pinned).
    "knn_ivfpq_batch_wide_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      Pq.ivfpqBatchWide(e, qids = (0L until 8L), k = 10,
        numSub = 16, subDim = 128, numCodes = 64, nProbe = 2, shortlist = 100)
    }),

    // A42e: WIDE-batch RESIDUAL IVF×PQ at the reference width — the
    // FAISS-default encoding (Jégou et al. 2011 §IV-A), amortized, at
    // d=2048: the last cell of the batch×width matrix (r13 verdict next
    // #4). Residual structure is query-independent (rows encode against
    // their OWN centroid), so ONE union encode serves the whole query
    // file; per-(query, probed-cluster) ADC tables ride as the label-
    // keyed broadcast relation; integer-exact end-to-end so the oracle
    // replays probe, residual transform, encode, ADC, and the integer
    // rerank at full width. Per-query results ≡ knn_ivfpq_residual_2048
    // (spec-pinned).
    "knn_ivfpq_residual_batch_wide_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      Pq.ivfpqResidualBatchWide(e, qids = (0L until 8L), k = 10,
        numSub = 16, subDim = 128, numCodes = 16, nProbe = 2, shortlist = 100)
    }),

    // A46: PQ at the REFERENCE's dimensionality (r11 verdict "what's
    // missing" #2): the compressed family's integer ADC arithmetic — the
    // code path that actually runs at 100 TB, where raw floats never
    // page in before the rerank — HASH-gated at d=2048, not just probed
    // for timings. Same shape as the wide ScaleProbe rows (16 subspaces
    // × 128 dims, 64 seeded codewords, 100-row ADC shortlist, exact L2
    // rerank; reference acorn.py:30–40 builds at d=2048); vectors come
    // from the A45 derived-wide construction, so no new table is needed
    // and the oracle replays every one of the 2048 slots. The oracle's
    // per-subspace distance is a DuckDB list_reduce LEFT FOLD — the same
    // sequential accumulation order as the PqNearestCode kernel's loop
    // (an explicit 128-term sum exceeds DuckDB's binder recursion depth).
    "knn_pq_2048" -> ((s, dir) =>
      Pq.searchRerank(HybridQueries.wideEmbeddings(s, dir), qid = 0, k = 10,
        numSub = 16, subDim = 128, numCodes = 64, shortlist = 100)),

    // A46c: the FULL three-stage cascade funnel at the reference width —
    // the last compressed code path that ran at d=2048 only as probe
    // timings: 2048-bit packed sign codes (64 longs via the BqPackVec
    // kernel — 256 B/row always-resident vs the reference's 8 KB floats),
    // Hamming stage-1 (HammingDistLong), int8 sq-L2 stage-2 under
    // corpus-wide calibration, exact cosine stage-3. Every cut
    // integer-exact; the oracle replays packing, Hamming, sq8, and
    // cosine at full width (pre-validated in python/duckdb vs a
    // pure-python reference).
    "knn_cascade_2048" -> ((s, dir) =>
      Cascade.searchWide(HybridQueries.wideEmbeddings(s, dir), qid = 3,
        stage1 = CascStage1, stage2 = CascStage2, k = 10,
        dims = HybridQueries.WideDims)),

    // A46e: the ACORN composition at the reference width — the
    // metadata-filtered PQ search (the reference's NAMESAKE operation:
    // predicate + ANN over the one filter-agnostic index) hash-gated at
    // d=2048. The keep set prunes the code scan (the A23 convention);
    // the codebook stays whole-corpus index-build state. Closes the
    // width matrix: exact (A45), graph (A45b), PQ (A46), SQ8 (A46b),
    // funnel (A46c), recall curve (A46d), and now FILTERED.
    "hybrid_knn_pq_2048" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Pq.searchRerank(HybridQueries.wideEmbeddings(s, dir), qid = 0, k = 10,
        numSub = 16, subDim = 128, numCodes = 64, shortlist = 100,
        keep = Some(keep))
    }),

    // A46g: the IVF×CASCADE composition at the reference width (with
    // A46f this finishes the coarse-quantizer leg of the width matrix:
    // every composition class — flat, filtered, PQ, SQ8, funnel, recall,
    // IVF×PQ, IVF×funnel — is now hash-gated at d=2048): 2048-d
    // centroids, scaled-cosine probe selection (nProbe=2 of 10), then
    // the full three-stage funnel with its stage-1 Hamming BODY pruned
    // to the probed clusters' members — calibration and the query side
    // stay corpus-wide (the A43d convention at width). At 100 TB the
    // always-resident 256 B/row code scan reads only nProbe/C of the
    // corpus.
    "knn_ivf_cascade_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val lbl = Tables(s, dir, "embeddings").select("vec_id", "label")
      val probed = Ivf.probe(Ivf.centroids(w.join(lbl, "vec_id")),
        w.filter(col("vec_id") === 3).select(col("embedding").as("q_vec")),
        nProbe = 2)
      Cascade.searchWide(w, qid = 3, stage1 = IvfCascStage1,
        stage2 = CascStage2, k = 10, dims = HybridQueries.WideDims,
        restrict = _.join(lbl, "vec_id").join(broadcast(probed), "label"))
    }),

    // A21g: the WIDE-batch machinery at the reference width — every
    // d=2048 gate so far serves ONE query, but the reference's
    // evaluation loop serves a query FILE, and the O(1)-plan batch path
    // (ADC tables riding as a broadcast-joined (q_id, tds) relation,
    // map-side k-heaps) moves 16×64 lookup tables of 128-dim folds per
    // query at this width — arithmetic the d=64 batch gate never
    // exercises. One corpus encode + one code scan answer all 8 queries;
    // per-query results ≡ knn_pq_2048's single-query pipeline at qid 0
    // (same seeded codebook, same shortlist/rerank tie orders).
    "knn_pq_batch_wide_2048" -> ((s, dir) =>
      Pq.searchRerankBatchWide(HybridQueries.wideEmbeddings(s, dir),
        qids = (0L until 8L), k = 10, numSub = 16, subDim = 128,
        numCodes = 64, shortlist = 100)),

    // A44b: IVF×SQ8 at the reference width — the last coarse-quantizer
    // composition class (A46f gated IVF×PQ, A46g IVF×funnel, A42d
    // IVF×residual; the FAISS IVF_SQ shape ran at d=2048 only as the
    // funnel's stage-2): wide centroids → scaled-cosine probe selection →
    // int8 ranking of the probed clusters' members under CORPUS-WIDE
    // (mn,mx) calibration → exact cosine rerank of the 40-row shortlist.
    // Runs on the WidenVec/Sq8QuantizeVec/SqDistLong kernels.
    "knn_ivfsq_2048" -> ((s, dir) => ivfsqSearch(
      HybridQueries.wideEmbeddings(s, dir)
        .join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
        .selectExpr("vec_id", "label", "embedding",
          "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      qid = 0L)),

    // A42d: RESIDUAL IVF×PQ at the reference width — the one remaining
    // compositional arithmetic not hash-checked at d=2048 (A46f gated
    // direct-encode IVF×PQ; the FAISS-default residual encoding quantizes
    // v − centroid instead, Jégou et al. 2011 §IV-A, and its per-CLUSTER
    // ADC tables are a different serving arithmetic). The A42 integer
    // composition verbatim over the A45 derived-wide frame: quantized
    // 2048-d components, floor-mean coarse centroids, integer-sqL2 probe
    // (ties to the lower label), residual transform, seeded residual
    // codebook (16 subspaces × 128 dims), per-cluster ADC CASE, exact
    // integer rerank — every step replayed by the oracle at full width.
    "knn_ivfpq_residual_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      Pq.ivfpqResidual(e, qid = 0, k = 10,
        numSub = 16, subDim = 128, numCodes = 16, nProbe = 2, shortlist = 100)
    }),

    // A46b: flat SQ8 at the reference width — the cascade funnel's int8
    // stage-2 arithmetic (full-corpus (mn,mx) calibration, 0..255 codes,
    // integer squared-L2) hash-gated at d=2048. With A45 (exact L2),
    // A45b (HNSW), A46 (PQ ADC) and this, every distance arithmetic the
    // serving stack layers is oracle-checked at the reference's
    // dimensionality; integer sums are order-insensitive so the oracle
    // transliterates directly.
    "knn_sq8_2048" -> ((s, dir) => {
      val e = HybridQueries.wideEmbeddings(s, dir)
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      val stats = Cascade.calibrationStats(e)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val vecs = graft.functions.vectors
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)).crossJoin(broadcast(stats))
        // at d=2048 the HOF forms paid ~4096 boxed Longs per row — the
        // kernels keep the whole scan inside whole-stage codegen
        .select(col("vec_id"),
          vecs.sq8(col("v"), col("mn"), col("mx")).as("qa"),
          vecs.sq8(col("qv"), col("mn"), col("mx")).as("qb"))
        .select(col("vec_id"), vecs.sqDistLong(col("qa"), col("qb")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(10)
    }),

    // A27: quantization-loss evaluation — recall@10 of the PQ
    // shortlist+rerank path vs the exact L2 scan (completes the recall
    // family: recall_eval = IVF probing, recall_filtered = filter
    // strategies, dedup_minhash_est = sketch dedup, this = compression).
    // Both sides are deterministic TakeOrdered results; the intersection
    // count is a broadcast join of two 10-row sets.
    "recall_pq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val approx = Pq.searchRerank(e, qid = 0, k = 10, numSub = 8, subDim = 8,
        numCodes = 64, shortlist = 100).select("vec_id")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
      val exact = Knn.topK(e.filter(col("vec_id") =!= 0).select("vec_id", "embedding"),
        q, 10, Knn.L2).select("vec_id")
      approx.join(exact, "vec_id")
        .agg(count(lit(1)).as("hits"))
        .select(lit(10L).as("k"), col("hits"))
    }),

    // A23: the ACORN-hybrid composition over the compressed index —
    // metadata-filtered product-quantized search (filter prunes the code
    // scan, ADC shortlist over survivors, exact rerank)
    "hybrid_knn_pq" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Pq.searchRerank(Tables(s, dir, "embeddings"), qid = 0, k = 10,
        numSub = 8, subDim = 8, numCodes = 64, shortlist = 100,
        keep = Some(keep))
    }),

    // A24: IVF×PQ — the full 100 TB search composition: probe the 2
    // clusters nearest the query (centroids broadcast), ADC-scan ONLY the
    // probed clusters' codes, exact rerank of the shortlist. At scale this
    // reads nProbe/C of an already-32×-compressed corpus.
    "knn_ivfpq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
      val probed = Ivf.probe(Ivf.centroids(e), q, nProbe = 2)
      val keep = e.join(broadcast(probed), "label").select("vec_id")
      Pq.searchRerank(e, qid = 0, k = 10,
        numSub = 8, subDim = 8, numCodes = 64, shortlist = 100,
        keep = Some(keep))
    }),

    // A46f: IVF×PQ at the REFERENCE width (r12 verdict next #3 — the last
    // composition class not hash-checked at d=2048): probe the 2 clusters
    // nearest the wide query (2048-d centroids, model state, broadcast),
    // ADC-scan ONLY the probed clusters' codes, exact rerank. The A24
    // composition verbatim over the A45 derived-wide frame — at 100 TB
    // this is THE serving plan: nProbe/C of an already-32×-compressed
    // corpus, coarse quantizer and fine quantizer both at the width the
    // reference actually builds (acorn.py:30–40). Runs on the WidenVec/
    // PqNearestCode kernels; the oracle derives the same wide centroids,
    // replays probe selection (scaled cosine desc, label asc), and the
    // full wide ADC pipeline over the probed body.
    "knn_ivfpq_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.join(Tables(s, dir, "embeddings").select("vec_id", "label"), "vec_id")
      val q = w.filter(col("vec_id") === 0).select(col("embedding").as("q_vec"))
      val probed = Ivf.probe(Ivf.centroids(e), q, nProbe = 2)
      val keep = e.join(broadcast(probed), "label").select("vec_id")
      Pq.searchRerank(w, qid = 0, k = 10,
        numSub = 16, subDim = 128, numCodes = 64, shortlist = 100,
        keep = Some(keep))
    }),

    // A25: PQ with a TRAINED codebook, now ORACLE-CHECKED (was rows-only
    // through r2): INTEGER-EXACT per-subspace Lloyd's on a bounded sample
    // (Pq.trainedCodebookInt — quantized sub-vectors, NearestCentroidLong
    // kernel E-step, integer floor-mean M-step), then the integer ADC
    // shortlist + exact integer rerank. Every step is bit-identical in
    // any engine, so the whole train→encode→search composition replays in
    // DuckDB as unrolled CTEs. (Pq.trainedCodebook remains the library fp
    // form, spec-covered by FusionSpec.)
    "knn_pq_trained" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val cb = Pq.trainedCodebookInt(e, numSub = 8, subDim = 8, numCodes = 16,
        iters = 2, sampleMax = 256)
      Pq.searchRerankInt(e, cb, qid = 0, k = 10,
        numSub = 8, subDim = 8, shortlist = 100)
    }),

    // A25b: the TRAINED codebook at the reference width — the width
    // matrix so far gated only SEEDED codebooks at d=2048 (A46/A46f/
    // A42d); production PQ codebooks are k-means-trained (the reference's
    // hnswlib/faiss convention), and the training arithmetic itself is
    // width-dependent (E-step distances and M-step floor-means run over
    // 128-dim subspaces here, not 8). The A25 integer composition over
    // the A45 derived-wide frame: per-subspace Lloyd's on the bounded
    // 256-row sample (NearestCentroidLong E-step, integer floor-mean
    // M-step, 2 iterations), then the integer ADC shortlist + exact
    // integer rerank — train, encode, AND search all replayed by the
    // oracle at d=2048.
    "knn_pq_trained_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val cb = Pq.trainedCodebookInt(w, numSub = 16, subDim = 128, numCodes = 16,
        iters = 2, sampleMax = 256)
      Pq.searchRerankInt(w, cb, qid = 0, k = 10,
        numSub = 16, subDim = 128, shortlist = 100)
    }),

    // A37: BINARY-quantized kNN — the 1-bit member of the quantized family
    // (SQ8 = 4×, PQ = 32×, BQ = 64× scan compression: a 64-d float vector
    // becomes 8 bytes). Sign-bit codes in two 32-bit halves (the simhash
    // lo/hi convention — no 1<<63 sign-literal hazard in either engine);
    // candidate ranking is codegen'd integer bit_count(xor) Hamming — the
    // cheapest distance arithmetic that exists — 4× oversampled, then the
    // shortlist reranks with exact scaled cosine. At 100 TB the 8-byte
    // code column is the resident index; floats page in only for the
    // ≤40-row rerank.
    "knn_bq" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings").selectExpr("vec_id", "embedding",
        s"${bqHalf("embedding", 0)} AS lo", s"${bqHalf("embedding", 32)} AS hi")
      val q = e.filter(col("vec_id") === 0)
        .select(col("lo").as("q_lo"), col("hi").as("q_hi"), col("embedding").as("q_vec"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .withColumn("ham",
          expr("CAST(bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi) AS BIGINT)"))
        .orderBy(col("ham").asc, col("vec_id").asc).limit(BqShortlist)
        .withColumn("score", graft.functions.scaled(
          graft.functions.vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .orderBy(col("score").desc, col("vec_id").asc).limit(10)
        .select("vec_id", "score", "ham")
    }),

    // A37b: binary quantization at the REFERENCE width — the 64× story
    // at its real shape: a 2048-d float vector (8 KB) becomes a 64-long
    // packed code (512 B) via the BqPackVec codegen kernel (the two
    // 32-bit-half SQL form is the d=64 special case; at width the code
    // is an array and Hamming is the HammingDistLong kernel — the
    // streaming wide cascade's proven pack/distance pair, here as the
    // standalone quantized-family member). 4× oversampled Hamming
    // shortlist, exact wide cosine rerank.
    "knn_bq_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val e = w.select(col("vec_id"), col("embedding"),
        graft.functions.vectors.bqPack(col("embedding"), 64).as("p"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("p").as("qp"), col("embedding").as("q_vec"))
      require(q.limit(1).count() == 1,
        "knn_bq_2048: query id 0 absent from the corpus — the gate would " +
          "pass vacuously on two empty frames")
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .withColumn("ham", graft.functions.vectors.hammingLong(col("p"), col("qp")))
        .orderBy(col("ham").asc, col("vec_id").asc).limit(BqShortlist)
        .withColumn("score", graft.functions.scaled(
          graft.functions.vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .orderBy(col("score").desc, col("vec_id").asc).limit(10)
        .select("vec_id", "score", "ham")
    }),

    // A38: Matryoshka / truncated-dimension progressive search — the
    // DIMENSION member of the compression family (A37 cuts bits/component,
    // PQ cuts the basis, this cuts dimensions): shortlist on the first
    // MrlDims of 64 dims (half the scan arithmetic and, with a
    // prefix-ordered column layout, half the I/O), exact full-dim rerank
    // after. Works for MRL-trained embeddings where prefixes are
    // semantically ordered; here the synthetic corpus's cluster structure
    // survives half-dim truncation (spec-measured 7/10; 16 dims drops to
    // 4/10, hence the knee constants above). The prefix distance is the
    // integer-exact quantized squared-L2 (shared quantizeVec fragments),
    // so the shortlist cut is engine-reproducible.
    "knn_matryoshka" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
        graft.functions.vectors.quantize(expr(s"slice(embedding, 1, $MrlDims)")).as("p16"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("p16").as("q16"), col("embedding").as("q_vec"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .withColumn("d16", expr(graft.functions.sqDistLongSql("p16", "q16")))
        .orderBy(col("d16").asc, col("vec_id").asc).limit(MrlShortlist)
        .withColumn("score", graft.functions.scaled(
          graft.functions.vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .orderBy(col("score").desc, col("vec_id").asc).limit(10)
        .select("vec_id", "score", "d16")
    }),

    // A38b: Matryoshka at the REFERENCE width — the published MRL trade
    // (Kusupati et al. 2022: prefix-truncate for the shortlist scan,
    // full-width exact rerank after) at its real shape: the 256-slot
    // prefix of a 2048-d embedding is an 8× cut of the scan arithmetic
    // and, with a prefix-ordered column layout, 8× the I/O — at d=64 the
    // 32-dim prefix was a toy ratio. Same integer-exact quantized
    // squared-L2 shortlist cut (engine-reproducible), exact wide cosine
    // rerank.
    "knn_matryoshka_2048" -> ((s, dir) => {
      val e = HybridQueries.wideEmbeddings(s, dir)
        .select(col("vec_id"), col("embedding"),
          graft.functions.vectors.quantize(
            expr(s"slice(embedding, 1, $MrlDims2048)")).as("p16"))
      val q = e.filter(col("vec_id") === 0)
        .select(col("p16").as("q16"), col("embedding").as("q_vec"))
      e.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .withColumn("d16", expr(graft.functions.sqDistLongSql("p16", "q16")))
        .orderBy(col("d16").asc, col("vec_id").asc).limit(MrlShortlist)
        .withColumn("score", graft.functions.scaled(
          graft.functions.vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .orderBy(col("score").desc, col("vec_id").asc).limit(10)
        .select("vec_id", "score", "d16")
    }),

    // A20: int8 scalar-quantized kNN — global (mn, mx) calibration, 0..255
    // codes, integer squared-L2 over the codes
    "knn_sq8" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      val stats = Cascade.calibrationStats(e)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val vecs = graft.functions.vectors
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)).crossJoin(broadcast(stats))
        // codegen'd sq8 + integer sq-L2 kernels (token-identical to the
        // transform/aggregate HOF forms, spec-pinned)
        .select(col("vec_id"),
          vecs.sq8(col("v"), col("mn"), col("mx")).as("qa"),
          vecs.sq8(col("qv"), col("mn"), col("mx")).as("qb"))
        .select(col("vec_id"), vecs.sqDistLong(col("qa"), col("qb")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(10)
    }),

    // A44: IVF×SQ8 — the middle point of the coarse-quantizer ×
    // compression matrix (A24 = IVF×PQ at 32×, A20 = flat SQ8 at 4×,
    // this = pruning × 4×): probe the 2 clusters nearest the query
    // (centroids broadcast), int8-rank ONLY the probed clusters' rows,
    // exact-cosine rerank of the 40-row shortlist. Calibration (mn, mx)
    // is an index-BUILD property — computed once over the full corpus,
    // broadcast at query time — so probing never re-calibrates. The
    // FAISS IVF_SQ shape: the production default when PQ's codebook
    // train/ship cost or accuracy loss is unwanted but raw floats don't
    // fit the scan budget. At 100 TB this reads nProbe/C of a
    // 4×-compressed corpus; floats page in for 40 rows.
    "knn_ivfsq" -> ((s, dir) => ivfsqSearch(
      Tables(s, dir, "embeddings").selectExpr("vec_id", "label", "embedding",
        "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      qid = 0L)),

    // A43: three-stage cascade funnel — the production serving shape that
    // composes the compression family into one query (FAISS refine /
    // Vespa two-phase convention, generalized to three): stage 1 ranks
    // the WHOLE corpus by 64-bit Hamming (bit_count(xor), the cheapest
    // distance that exists — the always-resident index) to CascStage1;
    // stage 2 reranks only that shortlist by int8 scalar-quantized
    // squared-L2 (16× the bits, still integer) to CascStage2; stage 3
    // pays exact float cosine on the survivors only. Every cut is
    // integer-exact with ties to the lower id, so the whole funnel
    // replays in the oracle. At 100 TB: the 8-byte code column is the
    // only full-scan operand (TakeOrdered, no global sort); the sq8 and
    // float stages touch ≤CascStage1/≤CascStage2 rows — I/O drops by the
    // funnel ratio at each stage, which is exactly why serving stacks
    // layer their quantizers instead of picking one.
    "knn_cascade" -> ((s, dir) =>
      Cascade.search(Tables(s, dir, "embeddings").select("vec_id", "embedding"),
        qid = 3, stage1 = CascStage1, stage2 = CascStage2, k = 10)),

    // A43d: the cascade funnel BEHIND the IVF coarse quantizer — the full
    // production serving stack in one query (FAISS IndexIVF + refine
    // chain): probe the 2 clusters nearest the query, then run the A43
    // funnel (64-bit Hamming → int8 squared-L2 → exact cosine) inside the
    // probed body only. Completes the coarse × compression matrix: A24 =
    // IVF×PQ, A44 = IVF×SQ8, this = IVF×(BQ→SQ8→float). SQ8 calibration
    // stays an index-BUILD property (full-corpus mn/mx, broadcast), as in
    // A44. At 100 TB the partition-prunable probe cuts the scan to
    // nProbe/C of the corpus BEFORE the funnel's I/O ratchet — each stage
    // then reads 8 B codes / 64 B codes / raw floats for geometrically
    // fewer rows; every cut is integer-exact with ties to the lower id,
    // so the whole composition replays in the oracle.
    "knn_ivf_cascade" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val probed = Ivf.probe(Ivf.centroids(e),
        e.filter(col("vec_id") === 0).select(col("embedding").as("q_vec")),
        nProbe = 2)
      Cascade.search(e.select("vec_id", "label", "embedding"),
        qid = 0, stage1 = IvfCascStage1, stage2 = CascStage2, k = 10,
        restrict = _.join(broadcast(probed), "label"))
    }),

    // A43b: the cascade funnel BATCHED — ONE 8-byte-code scan serves the
    // whole query set (the A12b/A21b amortization applied to the funnel):
    // stage 1 is a per-q_id map-side k-heap over one corpus×broadcast-Q
    // Hamming scan (shuffle ≤ |Q|·CascStage1 rows — scored rows never
    // leave the task); the ≤|Q|·100-row shortlist then broadcasts back
    // over the float scan for stages 2/3, which rank via windows over the
    // pre-cut shortlist only (the RRF bounded-window convention). Exactly
    // two corpus scans regardless of |Q| — the code scan and the
    // shortlist's float page-in.
    "knn_cascade_batch" -> ((s, dir) =>
      Cascade.searchBatch(Tables(s, dir, "embeddings").select("vec_id", "embedding"),
        qids = (0L to 7L), stage1 = CascStage1, stage2 = CascStage2, k = 10)),

    // A43f: the batched funnel past the broadcast-Q ceiling — A21d's
    // cap-and-union recipe applied verbatim to the cascade, DRIVER-GATED:
    // 128 queries forced through four ≤32-query batch passes and unioned
    // (cap parameterized; production cap 4096). Every q_id lands in
    // exactly one shard and per-query funnels are independent, so the
    // union ≡ one whole-file pass and the oracle is the same 128-query
    // relational replay; whole-file cross-shard duplicate guard; sharded
    // ≡ batch additionally spec-pinned at cap=4.
    "knn_cascade_batch_sharded" -> ((s, dir) =>
      Cascade.searchBatchSharded(Tables(s, dir, "embeddings").select("vec_id", "embedding"),
        qids = (0L until 128L), stage1 = CascStage1, stage2 = CascStage2,
        k = 10, cap = 32)),

    // A43g: filtered AND batched — the full composition closure of the
    // funnel family (A43b amortizes, A43e filters; this does both, the
    // A23b convention): the keep-set prunes the ONE 8-byte-code scan that
    // serves all 8 queries, queries come from the full table, calibration
    // stays corpus-wide. Per-query slices ≡ hybrid_knn_cascade
    // (spec-pinned at q_id 6, the single entry's query).
    "hybrid_knn_cascade_batch" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Cascade.searchBatch(Tables(s, dir, "embeddings").select("vec_id", "embedding"),
        qids = (0L to 7L), stage1 = CascStage1, stage2 = CascStage2, k = 10,
        keep = Some(keep))
    }),

    // A43e: the ACORN-filtered funnel — the one composition hole in the
    // funnel family (r10 verdict next #5): the metadata keep-set prunes
    // the stage-1 8-byte-code body (the A23 convention — the filter
    // qualifies candidates, never who may ask), then the same three
    // integer-exact cuts. Calibration stays corpus-wide index-build
    // state — filtering never re-calibrates (the A44 probe convention).
    // At 100 TB the predicate prunes the cheapest stage: the funnel reads
    // |keep|·8 bytes, then 64 B / floats for geometrically fewer rows.
    // The keep side is selectivity-dependent (a constant fraction of the
    // corpus under a broad predicate), NOT bounded model state — so the
    // join is planner-decided, never a forced broadcast (the
    // Cascade.searchBatch / Pq.searchRerank keep convention): a forced
    // broadcast(keep) here would OOM executors at 100 TB.
    "hybrid_knn_cascade" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Cascade.search(Tables(s, dir, "embeddings").select("vec_id", "embedding"),
        qid = 6, stage1 = CascStage1, stage2 = CascStage2, k = 10,
        restrict = _.join(keep, "vec_id"))
    }),

    // A43c: the funnel's RECALL/WIDTH CURVE — what a capacity planner
    // reads before fixing CascStage1 at 100 TB (the A29 sweep applied to
    // the cascade): recall@10 vs exact cosine at stage-1 width w ∈
    // {25,50,100,200}, sq8 stage fixed at 25. The Hamming ranking is
    // computed ONCE at the widest w via per-q_id k-heaps (rank = heap
    // position), then every narrower width is a FILTER on that ranking —
    // the whole curve costs one code scan, one shortlist float page-in,
    // and one exact ground-truth scan.
    "recall_cascade" -> ((s, dir) => {
      val widths = Seq(25, 50, 100, 200)
      val wMax = widths.max
      val e = Tables(s, dir, "embeddings").selectExpr("vec_id", "embedding",
        "CAST(embedding AS ARRAY<DOUBLE>) AS v",
        s"${bqHalf("embedding", 0)} AS lo", s"${bqHalf("embedding", 32)} AS hi")
      val stats = Cascade.calibrationStats(e)
      val qs = e.filter(col("vec_id") <= 7)
        .select(col("vec_id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"),
          col("embedding").as("q_vec"), col("v").as("qd"))
        .localCheckpoint(true)
      val ranked1 = e.select("vec_id", "lo", "hi").crossJoin(broadcast(qs.select("q_id", "q_lo", "q_hi")))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("ham",
          expr("CAST(bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi) AS BIGINT)"))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("ham"), col("vec_id"), wMax, asc = true).as("hits"))
        .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("q_id"), col("hit.id").as("vec_id"),
          (col("pos") + 1).as("r1"))
      val wq = Window.partitionBy("q_id")
      val staged = broadcast(ranked1).join(e.select("vec_id", "embedding", "v"), "vec_id")
        .join(broadcast(qs.select("q_id", "q_vec", "qd")), "q_id")
        .crossJoin(broadcast(stats))
        .select(col("q_id"), col("vec_id"), col("embedding"), col("q_vec"), col("r1"),
          graft.functions.vectors.sq8(col("v"), col("mn"), col("mx")).as("qa"),
          graft.functions.vectors.sq8(col("qd"), col("mn"), col("mx")).as("qb"))
        .withColumn("d8", graft.functions.vectors.sqDistLong(col("qa"), col("qb")))
        .withColumn("score", graft.functions.scaled(
          graft.functions.vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .select("q_id", "vec_id", "r1", "d8", "score").localCheckpoint(true)
      val exact = Knn.batchKnn(
        e.select("vec_id", "embedding"),
        qs.select("q_id", "q_vec"), k = 10, Knn.Cosine)
        .select("q_id", "vec_id").localCheckpoint(true)
      widths.map { w =>
        val fun = staged.filter(col("r1") <= w)
          .withColumn("r2", row_number().over(wq.orderBy(col("d8").asc, col("vec_id").asc)))
          .filter(col("r2") <= CascStage2)
          .withColumn("r3", row_number().over(wq.orderBy(col("score").desc, col("vec_id").asc)))
          .filter(col("r3") <= 10)
        val hits = fun.join(exact, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("h"))
        // every (w, q_id) pair appears even at zero hits (the A29 contract)
        qs.select("q_id").join(hits, Seq("q_id"), "left")
          .select(lit(w.toLong).as("w"), col("q_id"),
            coalesce(col("h"), lit(0L)).as("n_hit"))
      }.reduce(_ union _)
    }),

    // A46d: the funnel's RECALL/WIDTH CURVE at the reference width — A43c
    // re-run over the derived 2048-d vectors with the r12 kernels
    // (BqPackVec codes, HammingDistLong ranking, Sq8QuantizeVec/
    // SqDistLong stage-2): what the capacity planner reads before fixing
    // CascStage1 at the dimensionality production actually runs. Same
    // one-ranking-feeds-every-width economy as A43c; exact cosine over
    // the wide vectors is the ground truth.
    "recall_cascade_2048" -> ((s, dir) => {
      val wMax = CascWidths.max
      val w = HybridQueries.wideEmbeddings(s, dir)
      val vecs = graft.functions.vectors
      val e = w.select(col("vec_id"), col("embedding"),
        expr("CAST(embedding AS ARRAY<DOUBLE>)").as("v"),
        vecs.bqPack(col("embedding"), 64).as("p"))
      val stats = Cascade.calibrationStats(e)
      val qs = e.filter(col("vec_id") <= 7)
        .select(col("vec_id").as("q_id"), col("p").as("q_p"),
          col("embedding").as("q_vec"), col("v").as("qd"))
        .localCheckpoint(true)
      val ranked1 = e.select("vec_id", "p").crossJoin(broadcast(qs.select("q_id", "q_p")))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("ham", vecs.hammingLong(col("p"), col("q_p")))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("ham"), col("vec_id"), wMax, asc = true).as("hits"))
        .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("q_id"), col("hit.id").as("vec_id"), (col("pos") + 1).as("r1"))
      val wq = Window.partitionBy("q_id")
      val staged = broadcast(ranked1).join(e.select("vec_id", "embedding", "v"), "vec_id")
        .join(broadcast(qs.select("q_id", "q_vec", "qd")), "q_id")
        .crossJoin(broadcast(stats))
        .select(col("q_id"), col("vec_id"), col("embedding"), col("q_vec"), col("r1"),
          vecs.sq8(col("v"), col("mn"), col("mx")).as("qa"),
          vecs.sq8(col("qd"), col("mn"), col("mx")).as("qb"))
        .withColumn("d8", vecs.sqDistLong(col("qa"), col("qb")))
        .withColumn("score", graft.functions.scaled(
          vecs.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .select("q_id", "vec_id", "r1", "d8", "score").localCheckpoint(true)
      val exact = Knn.batchKnn(
        w.select("vec_id", "embedding"),
        qs.select("q_id", "q_vec"), k = 10, Knn.Cosine)
        .select("q_id", "vec_id").localCheckpoint(true)
      CascWidths.map { wd =>
        val fun = staged.filter(col("r1") <= wd)
          .withColumn("r2", row_number().over(wq.orderBy(col("d8").asc, col("vec_id").asc)))
          .filter(col("r2") <= CascStage2)
          .withColumn("r3", row_number().over(wq.orderBy(col("score").desc, col("vec_id").asc)))
          .filter(col("r3") <= 10)
        val hits = fun.join(exact, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("h"))
        qs.select("q_id").join(hits, Seq("q_id"), "left")
          .select(lit(wd.toLong).as("w"), col("q_id"),
            coalesce(col("h"), lit(0L)).as("n_hit"))
      }.reduce(_ union _)
    }),

    // A42: residual IVF-PQ — the real FAISS IVFPQ encoding (Jégou et al.
    // 2011 §IV-A): PQ codes quantize the residual against the coarse
    // centroid, not the raw vector (A24 is the direct-encode baseline).
    // Integer-exact end-to-end; see operators.Pq.ivfpqResidual.
    "knn_ivfpq_residual" -> ((s, dir) =>
      Pq.ivfpqResidual(Tables(s, dir, "embeddings"), qid = 0, k = 10,
        numSub = 8, subDim = 8, numCodes = 16, nProbe = 2, shortlist = 100)),

    // A21b: BATCHED PQ search (r7 verdict "next" #2 — the reference's main
    // loop serves a query FILE, and until now only the exact/hybrid/HNSW
    // paths amortized it): ONE corpus encode + ONE code scan answer all 5
    // queries — each query is a literal 512-entry ADC table in the
    // projection and a map-side k-heap in the shortlist aggregate.
    // Per-query results are IDENTICAL to knn_pq (spec-pinned); plan audit
    // pins the one-scan shape.
    "knn_pq_batch" -> ((s, dir) =>
      Pq.searchRerankBatch(Tables(s, dir, "embeddings"), qids = (0L to 4L),
        k = 10, numSub = 8, subDim = 8, numCodes = 64, shortlist = 100)),

    // A23b: BATCHED filtered PQ — the ACORN-hybrid composition over the
    // compressed index, amortized: the metadata filter is query-
    // INDEPENDENT, so ONE keep-pruned encode + ONE code scan serve the
    // whole query file (queries need no codes — their ADC side is the raw
    // vector). Per-query results ≡ hybrid_knn_pq (spec).
    "hybrid_knn_pq_batch" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Pq.searchRerankBatch(Tables(s, dir, "embeddings"), qids = (0L to 4L),
        k = 10, numSub = 8, subDim = 8, numCodes = 64, shortlist = 100,
        keep = Some(keep))
    }),

    // A24b: BATCHED IVF×PQ — the full 100 TB composition (coarse probe
    // pruning × 32× code compression) amortized over the query file: the
    // per-query probes prune the ONE code scan to the probed clusters'
    // union, membership resolves per (q_id, label) via a broadcast join
    // of the ≤|Q|·nProbe probe pairs (label-keyed — scalable, never a
    // per-row membership list), then the shared batch machinery
    // (per-query ADC columns, k-heap shortlists, broadcast exact rerank).
    "knn_ivfpq_batch" -> ((s, dir) =>
      Pq.ivfpqBatch(Tables(s, dir, "embeddings"), qids = (0L to 4L),
        k = 10, numSub = 8, subDim = 8, numCodes = 64, nProbe = 2,
        shortlist = 100)),

    // A42b: BATCHED residual IVF-PQ — completes the batch family for the
    // last compressed path (the r7 verdict named all four: sq8 ranks
    // inside A41b's coarse stage, pq = A21b, ivfpq = A24b, residual =
    // this). The residual structure is query-independent (rows encode
    // against their OWN centroid), so ONE union encode serves every
    // query; membership lives inside each query's per-cluster ADC CASE
    // (non-probed labels → NULL adist, filtered) — zero membership joins.
    "knn_ivfpq_residual_batch" -> ((s, dir) =>
      Pq.ivfpqResidualBatch(Tables(s, dir, "embeddings"), qids = (0L to 4L),
        k = 10, numSub = 8, subDim = 8, numCodes = 16, nProbe = 2,
        shortlist = 100)),

    // A21c: WIDE-batch PQ search (r8 verdict next #1): the literal batch
    // form walls at 64 queries (each adds an ADC table to the plan); the
    // reference's evaluation loop runs UNBOUNDED query files. Here all 256
    // queries' ADC tables ride as ONE broadcast-joined (q_id, tds)
    // relation — plan size O(1) in |Q|, ONE corpus encode + ONE code scan
    // at any query-file size up to Pq.WideBatchCap=4096. Per-query results
    // are IDENTICAL to knn_pq / knn_pq_batch (spec-pinned); plan audit
    // pins one-code-scan / no per-query projection columns / k-heaps.
    "knn_pq_batch_wide" -> ((s, dir) =>
      Pq.searchRerankBatchWide(Tables(s, dir, "embeddings"),
        qids = (0L until 256L), k = 10, numSub = 8, subDim = 8,
        numCodes = 64, shortlist = 100)),

    // A23c: WIDE-batch filtered PQ (r9 verdict next #3 — the one batch
    // composition that was still literal-only at the driver surface):
    // the ACORN-hybrid metadata filter is query-INDEPENDENT, so the ONE
    // keep-pruned encode + ONE code scan serve all 128 queries exactly
    // as in the literal A23b — only the ADC side rides as the broadcast
    // joined relation instead of literal columns. Queries come from the
    // FULL table (the filter qualifies candidates, never who may ask).
    "hybrid_knn_pq_batch_wide" -> ((s, dir) => {
      val keep = docs(s, dir)
        .filter(col("lang").isNotNull && col("lang") === "en")
        .select(col("doc_id").as("vec_id"))
      Pq.searchRerankBatchWide(Tables(s, dir, "embeddings"),
        qids = (0L until 128L), k = 10, numSub = 8, subDim = 8,
        numCodes = 64, shortlist = 100, keep = Some(keep))
    }),

    // A21d: SHARDED wide-batch PQ — the >WideBatchCap driver, gated: the
    // same 128-query file as A21c's prefix but forced through FOUR ≤32-
    // query wide passes and unioned (cap parameterized; in production the
    // cap is 4096 and this shape only appears past it). Every q_id lands
    // in exactly one shard ⇒ results ≡ one wide pass ⇒ the ORACLE IS THE
    // SAME relational replay — the driver independently verifies the
    // union-of-chunks path end-to-end.
    "knn_pq_batch_sharded" -> ((s, dir) =>
      Pq.searchRerankBatchShardedWide(Tables(s, dir, "embeddings"),
        qids = (0L until 128L), k = 10, numSub = 8, subDim = 8,
        numCodes = 64, shortlist = 100, cap = 32)),

    // A24c: WIDE-batch IVF×PQ — membership and ADC resolve in ONE
    // broadcast (q_id, label, tds) join against the union-pruned code
    // scan; 128 queries, one scan, O(1) plan.
    "knn_ivfpq_batch_wide" -> ((s, dir) =>
      Pq.ivfpqBatchWide(Tables(s, dir, "embeddings"), qids = (0L until 128L),
        k = 10, numSub = 8, subDim = 8, numCodes = 64, nProbe = 2,
        shortlist = 100)),

    // A42c: WIDE-batch residual IVF-PQ — per-query probes AND ADC tables
    // computed in Spark (query vectors never collect), label-keyed
    // broadcast membership+lookup join; integer-exact end-to-end.
    "knn_ivfpq_residual_batch_wide" -> ((s, dir) =>
      Pq.ivfpqResidualBatchWide(Tables(s, dir, "embeddings"),
        qids = (0L until 128L), k = 10, numSub = 8, subDim = 8,
        numCodes = 16, nProbe = 2, shortlist = 100)),

    // A41b: BATCHED refine/rerank — the SQ8 coarse scan computes all 5
    // queries' code distances in one pass over the corpus (the coarse
    // codes of a row are shared; only the query-side codes differ), the
    // per-query top-R cut partial-aggregates map-side (TopKHits), and the
    // exact integer rerank joins ≤ |Q|·R candidate ids broadcast. The
    // refine cost stays independent of corpus size AND now amortizes the
    // scan over the query set.
    "knn_refine_rerank_batch" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val ed = e.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      val stats = Cascade.calibrationStats(ed)
      // row codes depend only on (v, mn, mx): quantize each corpus row
      // ONCE before the query fan-out (per-(row, query) quantization would
      // do |Q|× the transform work for identical values — r8 review
      // finding); the |Q| query codes quantize on the broadcast side
      val qcodes = ed.filter(col("vec_id") <= 4).crossJoin(broadcast(stats))
        .select(col("vec_id").as("q_id"),
          graft.functions.vectors.sq8(col("v"), col("mn"), col("mx")).as("cb"))
      val coarse = ed.crossJoin(broadcast(stats))
        .select(col("vec_id"),
          graft.functions.vectors.sq8(col("v"), col("mn"), col("mx")).as("ca"))
        .crossJoin(broadcast(qcodes))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.vectors.sqDistLong(col("ca"), col("cb")).as("coarse"))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("coarse"), col("vec_id"), RefineR,
          asc = true).as("hits"))
        .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("q_id"), col("hit.id").as("vec_id"), col("hit.score").as("coarse"))
      val qz = Pq.quantized(e)
      val qq = qz.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("q_id"), col("q").as("qq"))
      qz.join(broadcast(coarse), "vec_id")
        .join(broadcast(qq), "q_id")
        .selectExpr("q_id", "vec_id", "coarse",
          graft.functions.sqDistLongSql("q", "qq") + " AS score")
        .withColumn("rank", row_number().over(Window.partitionBy("q_id")
          .orderBy(col("score").asc, col("vec_id").asc)).cast("long"))
        .filter(col("rank") <= 10)
        .select("q_id", "vec_id", "rank", "coarse", "score")
    }),

    // A41: two-stage refine/rerank — the published coarse-then-refine
    // composition (FAISS's IndexRefineFlat; reference README §4 pairs the
    // compressed scan with an exact re-check the same way): the 1-byte-per-
    // dim SQ8 codes rank the WHOLE corpus (64 B/vec scanned instead of
    // 256 B), only the top RefineR=50 candidate ids join back to full-
    // precision vectors for an integer-exact rerank. At 100 TB the coarse
    // scan is the only full pass and the rerank is a broadcast join on R
    // ids — the refine cost is independent of corpus size.
    "knn_refine_rerank" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      val ed = e.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      val stats = Cascade.calibrationStats(ed)
      val q = ed.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val coarse = ed.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)).crossJoin(broadcast(stats))
        .select(col("vec_id"),
          graft.functions.vectors.sq8(col("v"), col("mn"), col("mx")).as("ca"),
          graft.functions.vectors.sq8(col("qv"), col("mn"), col("mx")).as("cb"))
        .select(col("vec_id"),
          graft.functions.vectors.sqDistLong(col("ca"), col("cb")).as("coarse"))
        .orderBy(col("coarse").asc, col("vec_id").asc).limit(RefineR)
      val qz = Pq.quantized(e)
      val qvec = qz.filter(col("vec_id") === 0).select(col("q").as("qq"))
      qz.join(broadcast(coarse), "vec_id")
        .crossJoin(broadcast(qvec))
        .selectExpr("vec_id", "coarse",
          graft.functions.sqDistLongSql("q", "qq") + " AS score")
        .orderBy(col("score").asc, col("vec_id").asc).limit(10)
    }),

    // A41c: the coarse-then-refine composition at the REFERENCE width —
    // the 4× story at its real shape: the SQ8 coarse pass scans
    // 2 KB/vec of codes where the corpus stores 8 KB of floats, and only
    // RefineR=50 ids page the full-precision wide vectors back in for
    // the integer-exact rerank. Kernel pipeline end to end (Sq8Quantize →
    // SqDistLong both ways); the refine cost stays independent of corpus
    // size at any width.
    "knn_refine_rerank_2048" -> ((s, dir) => {
      val w = HybridQueries.wideEmbeddings(s, dir)
      val ed = w.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      val stats = Cascade.calibrationStats(ed)
      val q = ed.filter(col("vec_id") === 0).select(col("v").as("qv"))
      require(q.limit(1).count() == 1,
        "knn_refine_rerank_2048: query id 0 absent from the corpus — the " +
          "gate would pass vacuously on two empty frames")
      val coarse = ed.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q)).crossJoin(broadcast(stats))
        .select(col("vec_id"),
          graft.functions.vectors.sq8(col("v"), col("mn"), col("mx")).as("ca"),
          graft.functions.vectors.sq8(col("qv"), col("mn"), col("mx")).as("cb"))
        .select(col("vec_id"),
          graft.functions.vectors.sqDistLong(col("ca"), col("cb")).as("coarse"))
        .orderBy(col("coarse").asc, col("vec_id").asc).limit(RefineR)
      val qz = Pq.quantized(w)
      val qvec = qz.filter(col("vec_id") === 0).select(col("q").as("qq"))
      qz.join(broadcast(coarse), "vec_id")
        .crossJoin(broadcast(qvec))
        .select(col("vec_id"), col("coarse"),
          graft.functions.vectors.sqDistLong(col("q"), col("qq")).as("score"))
        .orderBy(col("score").asc, col("vec_id").asc).limit(10)
    })
  )

  // ---- DuckDB oracle (same integer arithmetic, token-for-token)

  private val termList = QueryTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  private val bm25Sql =
    s"""tk AS (SELECT doc_id, $dTok AS tk FROM documents),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |              CAST(sum(len(tk)) AS BIGINT) // CAST(count(*) AS BIGINT) AS avgdl FROM tk),
       |tox AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS tok FROM tk),
       |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf FROM tox
       |       WHERE tok IN $termList GROUP BY 1, 2, 3),
       |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |  (((st.n_docs - dfx.df + 1) * 1000) // (dfx.df + 1)) AS idf,
       |  tf.tf * 1000 + (1200 * (250 + (750 * tf.dl) // st.avgdl)) // 1000 AS denom,
       |  tf.tf AS tf
       |  FROM tf JOIN dfx USING (tok) CROSS JOIN st),
       |bmall AS (SELECT doc_id, CAST(sum((idf * tf * 2200) // denom) AS BIGINT) AS bm25
       |          FROM sc GROUP BY doc_id)""".stripMargin

  private val cosSql =
    "CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"

  /** explicit left-assoc squared-L2 terms — mirrors Pq.sqDistExpr exactly
    * (same element order, same op order) so rounding is bit-identical */
  private[queries] def pqTerms(vec: String, cw: String, subDim: Int, offset: Boolean): String =
    (1 to subDim).map { i =>
      val x = if (offset) s"$vec[cb.m*$subDim+$i]" else s"$vec[$i]"
      s"(($x - $cw[$i]) * ($x - $cw[$i]))"
    }.mkString(" + ")

  /** [[pqTerms]] at widths past DuckDB's 128-deep binder recursion: the
    * per-subspace squared distance as a list_reduce LEFT FOLD, which
    * accumulates in the same sequential order as the PqNearestCode
    * kernel's loop (r14 review: this def existed in three identical
    * local copies — one drifting copy would silently desynchronize an
    * oracle family's arithmetic). */
  private[queries] def pqFold(vec: String, cw: String, subDim: Int, offset: Boolean): String = {
    val x = if (offset) s"$vec[cb.m*$subDim+i]" else s"$vec[i]"
    s"list_reduce(list_transform(range(1, ${subDim + 1}), " +
      s"i -> (($x - $cw[i]) * ($x - $cw[i]))), (a, b) -> a + b)"
  }

  val oracle: Map[String, String] = Map(
    "text_bm25" ->
      s"""WITH $bm25Sql
         |SELECT doc_id, bm25 FROM bmall ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin,

    "keyword_search" -> {
      val mustHave = QueryTerms.map(t => s"list_contains(tk, '$t')").mkString(" AND ")
      val inSet = QueryTerms.map(t => s"x = '$t'").mkString(" OR ")
      s"""WITH t AS (SELECT doc_id, $dTok AS tk FROM documents)
         |SELECT doc_id, CAST(len(list_filter(tk, x -> $inSet)) AS BIGINT) AS tf
         |FROM t WHERE $mustHave
         |ORDER BY tf DESC, doc_id LIMIT 20""".stripMargin
    },

    "phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $dTok AS tk FROM documents),
         |sh AS (SELECT doc_id, ${DuckDialect.ShinglesRaw} AS s FROM t WHERE len(tk) >= 3),
         |ex AS (SELECT unnest(s) AS p FROM sh),
         |top AS (SELECT p FROM ex GROUP BY p ORDER BY count(*) DESC, p LIMIT 1)
         |SELECT doc_id, p AS phrase,
         |  CAST(len(list_filter(s, x -> x = p)) AS BIGINT) AS n_occ,
         |  CAST(list_position(s, p) AS BIGINT) AS first_pos
         |FROM sh, top WHERE list_contains(s, p)""".stripMargin,

    "multivector_maxsim" ->
      s"""WITH t AS (SELECT doc_id, $dTok AS tk FROM documents),
         |ch AS (SELECT doc_id,
         |  unnest(range((len(tk) + ${MvChunk - 1}) // $MvChunk)) AS pos,
         |  unnest(list_transform(range((len(tk) + ${MvChunk - 1}) // $MvChunk),
         |    i -> array_to_string(tk[i * $MvChunk + 1 : i * $MvChunk + $MvChunk], ' '))) AS passage
         |  FROM t WHERE len(tk) > 0),
         |pv AS (SELECT doc_id, pos,
         |  list_transform(range($MvDims),
         |    i -> ${DuckDialect.hash(s"passage || '_' || i")} % 2001 - 1000) AS pv
         |  FROM ch),
         |mx AS (SELECT c.doc_id, q.pos AS q_pos,
         |  max(CAST(list_sum(list_transform(range($MvDims),
         |    j -> c.pv[j + 1] * q.pv[j + 1])) AS BIGINT)) AS m
         |  FROM pv c JOIN pv q ON q.doc_id = $MvQueryDoc AND c.doc_id <> $MvQueryDoc
         |  GROUP BY c.doc_id, q.pos)
         |SELECT doc_id, CAST(sum(m) AS BIGINT) AS maxsim FROM mx GROUP BY doc_id
         |ORDER BY maxsim DESC, doc_id LIMIT 10""".stripMargin,

    "knn_mmr" -> {
      def cosf(a: String, b: String) =
        s"CAST(floor(list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"
      val dl = 10000L - MmrLambda
      val steps = (1 to MmrK).map { t =>
        s"""p$t AS (SELECT sl.vec_id,
           |    $MmrLambda * sl.rel - $dl * COALESCE((SELECT max(s) FROM sim
           |      JOIN sel${t - 1} sv ON sim.bi = sv.vec_id
           |      WHERE sim.ai = sl.vec_id), 0) AS mmr
           |  FROM sl WHERE sl.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
           |  ORDER BY mmr DESC, sl.vec_id LIMIT 1),
           |sel$t AS (SELECT vec_id FROM sel${t - 1} UNION ALL SELECT vec_id FROM p$t)"""
          .stripMargin
      }.mkString(",\n")
      val out = (1 to MmrK)
        .map(t => s"SELECT CAST($t AS BIGINT) AS rank, vec_id, mmr FROM p$t")
        .mkString("\n UNION ALL ")
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |sl AS (SELECT e.vec_id, e.embedding,
         |    ${cosf("e.embedding", "q.embedding")} AS rel
         |  FROM embeddings e, q WHERE e.vec_id <> 0
         |  ORDER BY rel DESC, e.vec_id LIMIT $MmrR),
         |sim AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
         |    ${cosf("a.embedding", "b.embedding")} AS s
         |  FROM sl a JOIN sl b ON a.vec_id <> b.vec_id),
         |sel0 AS (SELECT CAST(NULL AS BIGINT) AS vec_id WHERE false),
         |$steps
         |$out""".stripMargin
    },

    // A40b: the same unrolled greedy chain with every cosine (relevance
    // shortlist + R² sim matrix) over the wide frame
    "knn_mmr_2048" -> {
      def cosf(a: String, b: String) =
        s"CAST(floor(list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"
      val dl = 10000L - MmrLambda
      val steps = (1 to MmrK).map { t =>
        s"""p$t AS (SELECT sl.vec_id,
           |    $MmrLambda * sl.rel - $dl * COALESCE((SELECT max(s) FROM sim
           |      JOIN sel${t - 1} sv ON sim.bi = sv.vec_id
           |      WHERE sim.ai = sl.vec_id), 0) AS mmr
           |  FROM sl WHERE sl.vec_id NOT IN (SELECT vec_id FROM sel${t - 1})
           |  ORDER BY mmr DESC, sl.vec_id LIMIT 1),
           |sel$t AS (SELECT vec_id FROM sel${t - 1} UNION ALL SELECT vec_id FROM p$t)"""
          .stripMargin
      }.mkString(",\n")
      val out = (1 to MmrK)
        .map(t => s"SELECT CAST($t AS BIGINT) AS rank, vec_id, mmr FROM p$t")
        .mkString("\n UNION ALL ")
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |q AS (SELECT embedding FROM wide WHERE vec_id = 0),
         |sl AS MATERIALIZED (SELECT e.vec_id, e.embedding,
         |    ${cosf("e.embedding", "q.embedding")} AS rel
         |  FROM wide e, q WHERE e.vec_id <> 0
         |  ORDER BY rel DESC, e.vec_id LIMIT $MmrR),
         |sim AS MATERIALIZED (SELECT a.vec_id AS ai, b.vec_id AS bi,
         |    ${cosf("a.embedding", "b.embedding")} AS s
         |  FROM sl a JOIN sl b ON a.vec_id <> b.vec_id),
         |sel0 AS (SELECT CAST(NULL AS BIGINT) AS vec_id WHERE false),
         |$steps
         |$out""".stripMargin
    },

    "hybrid_rrf" ->
      s"""WITH $bm25Sql,
         |bm AS (SELECT doc_id, bm25 FROM bmall ORDER BY bm25 DESC, doc_id LIMIT $FuseR),
         |kwr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_kw FROM bm),
         |vt AS (SELECT e.vec_id AS doc_id, $cosSql AS score
         |       FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |       WHERE e.vec_id <> 0 ORDER BY score DESC, doc_id LIMIT $FuseR),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_vec FROM vt)
         |SELECT COALESCE(kwr.doc_id, vr.doc_id) AS doc_id,
         |  CAST(COALESCE(1000000 // ($RrfK + rank_kw), 0)
         |     + COALESCE(1000000 // ($RrfK + rank_vec), 0) AS BIGINT) AS rrf
         |FROM kwr FULL OUTER JOIN vr ON kwr.doc_id = vr.doc_id
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "knn_pq" -> pqOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0"),

    // A21e: identical pipeline at query id 9 — the persistence round-trip
    // must not change a single row (longs through parquet are exact)
    "knn_pq_persisted" -> pqOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 9",
      qid = 9),

    // A21f: appended index == full rebuild at the same stored codebook
    // (codeword seeds all sit in the base half; encode is per-row
    // independent) — so the single-query PQ oracle replays the
    // build+append+serve composition verbatim at query id 5
    // A47: the batch PQ pipeline with an EXTERNAL query frame — the qs
    // CTE derives the four midpoint vectors (one float round per
    // component, identical construction to the entry's zip_with) and no
    // self-exclusion applies (external queries have no corpus row)
    "knn_pq_batch_external" -> pqBatchOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      qsSelect = Some(
        """SELECT a.vec_id // 2 AS q_id,
          |    list_transform(range(1, 65),
          |      i -> CAST(CAST(((CAST(a.embedding AS DOUBLE[]))[i] + (CAST(b.embedding AS DOUBLE[]))[i]) * 0.5 AS FLOAT) AS DOUBLE)) AS qv
          |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          |  WHERE a.vec_id % 2 = 0 AND a.vec_id < 8""".stripMargin),
      excludeSelf = false),

    // A47b: per-query results are shard-independent, so the UNSHARDED
    // batch pipeline over all 128 external midpoints replays the
    // 3-pass cap-and-union output row for row
    "knn_pq_batch_external_sharded" -> pqBatchOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      qsSelect = Some(
        """SELECT a.vec_id // 2 AS q_id,
          |    list_transform(range(1, 65),
          |      i -> CAST(CAST(((CAST(a.embedding AS DOUBLE[]))[i] + (CAST(b.embedding AS DOUBLE[]))[i]) * 0.5 AS FLOAT) AS DOUBLE)) AS qv
          |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          |  WHERE a.vec_id % 2 = 0 AND a.vec_id < 256""".stripMargin),
      excludeSelf = false),

    // A46: the wide PQ pipeline — see pqOracleSql2048's width adaptations
    "knn_pq_2048" -> pqOracleSql2048(qid = 0),

    // A21h: persistence must not change a single row — the FRESH wide
    // pipeline at query id 9 replays build+store+restore+serve verbatim
    // (longs and the FLOAT wide vectors round-trip parquet exactly)
    "knn_pq_persisted_2048" -> pqOracleSql2048(qid = 9),

    // A52: the CONSUMER oracle — DuckDB restores the persisted artifacts
    // themselves (read_parquet over the fixed export path; written by
    // this Verify pass before any oracle runs) instead of replaying
    // training: cb is the stored codebook vintage-gated on
    // schema_version, enc unpivots the stored 16-bytes-per-row code
    // table, and only the ADC table + rerank are computed. A tampered
    // vintage empties cb → zero rows → red gate (observable refusal).
    "knn_pq_consumer_restore_2048" -> {
      val (numSub, subDim, qid) = (16, 128, 7)
      val fold = pqFold("q.qsub", "cb.cw", subDim, offset = false)
      val codeCase = (0 until numSub).map(m => s"WHEN $m THEN code_$m").mkString(" ")
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |cbf AS (SELECT * FROM read_parquet('$PqConsumerPath/codebook/*.parquet')),
         |cb AS MATERIALIZED (SELECT m, code, cw FROM cbf
         |  WHERE (SELECT count(*) FROM cbf WHERE schema_version <> ${graft.operators.Pq.SchemaVersion}) = 0),
         |enc AS (SELECT vec_id, m.m AS m, CASE m.m $codeCase END AS code
         |  FROM read_parquet('$PqConsumerPath/codes/*.parquet'),
         |       (SELECT unnest(range($numSub)) AS m) m
         |  WHERE vec_id <> $qid),
         |q AS (SELECT m.m AS m,
         |    (CAST(e.embedding AS DOUBLE[]))[m.m*$subDim+1 : m.m*$subDim+$subDim] AS qsub
         |      FROM wide e, (SELECT unnest(range($numSub)) AS m) m WHERE e.vec_id = $qid),
         |adc AS (SELECT cb.m, cb.code,
         |  CAST(floor($fold * 10000.0) AS BIGINT) AS td
         |  FROM cb JOIN q ON cb.m = q.m),
         |short AS (SELECT enc.vec_id FROM enc JOIN adc ON enc.m = adc.m AND enc.code = adc.code
         |          GROUP BY enc.vec_id ORDER BY sum(adc.td) ASC, enc.vec_id ASC LIMIT 100)
         |SELECT e.vec_id,
         |  CAST(floor(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q2.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) AS score
         |FROM wide e JOIN short USING (vec_id)
         |CROSS JOIN (SELECT embedding FROM wide WHERE vec_id = $qid) q2
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // A24d / A42e: the batch replays at the reference width — per-query
    // probe windows over the wide centroids, union-pruned bodies,
    // membership enforced per (q_id, label), per-query window cuts
    "knn_ivfpq_batch_wide_2048" -> ivfpqBatchWideOracleSql2048(Some("vec_id < 8")),
    "knn_ivfpq_residual_batch_wide_2048" ->
      ivfpqResidualBatchWideOracleSql2048("vec_id < 8"),

    // A24e / A42f: sharding never changes per-query results, so the
    // sharded wide drivers replay the SAME wide batch oracles (the A21j
    // convention applied to the coarse-quantizer families)
    "knn_ivfpq_batch_sharded_2048" -> ivfpqBatchWideOracleSql2048(Some("vec_id < 8")),
    "knn_ivfpq_residual_batch_sharded_2048" ->
      ivfpqResidualBatchWideOracleSql2048("vec_id < 8"),

    // A46e: the same wide pipeline over the metadata-qualified body only
    // (the hybrid_knn_pq body join, at width)
    "hybrid_knn_pq_2048" -> pqOracleSql2048(qid = 0, bodySelect = Some(
      """SELECT w.vec_id, CAST(w.embedding AS DOUBLE[]) AS v
        |  FROM wide w JOIN documents d ON d.doc_id = w.vec_id
        |  WHERE w.vec_id <> 0 AND d.lang IS NOT NULL AND d.lang = 'en'""".stripMargin)),

    // A46f: the wide pipeline with probe selection in the prelude — the
    // d=64 knn_ivfpq oracle's cent/qp/probes CTEs re-derived over the
    // wide frame (centroids = per-dim avg of the 2048 wide slots, probe
    // ranking by scaled cosine desc then label asc), body = probed
    // clusters' members only
    "knn_ivfpq_2048" -> pqOracleSql2048(qid = 0,
      prelude =
        s"""${HybridQueries.wideCentDuck},
          |qp AS (SELECT embedding FROM wide WHERE vec_id = 0),
          |probes AS (
          |  SELECT c.label FROM centw c CROSS JOIN qp
          |  ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
          |    CAST(qp.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC
          |  LIMIT 2),""".stripMargin,
      bodySelect = Some(
        """SELECT w.vec_id, CAST(w.embedding AS DOUBLE[]) AS v
          |  FROM wide w JOIN embeddings e USING (vec_id)
          |  JOIN probes p ON e.label = p.label
          |  WHERE w.vec_id <> 0""".stripMargin)),

    // A46c: the full funnel at width — packing via list CASE folds (the
    // BqPackVec bit order), Hamming via bit_count(xor) over the 64
    // groups, sq8/cosine as the standard forms
    "knn_cascade_2048" -> {
      val (wideN, groups, s1, s2, qid) = (2048, 64, CascStage1, CascStage2, 3)
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |w2 AS MATERIALIZED (SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS v,
         |  list_transform(range(0, $groups), g ->
         |    list_reduce(list_transform(range(0, 32), j ->
         |      CASE WHEN embedding[g*32 + j + 1] > 0.0 THEN CAST(1 AS BIGINT) << j
         |           ELSE CAST(0 AS BIGINT) END), (a, b) -> a + b)) AS p
         |  FROM wide),
         |st AS (SELECT min(list_min(v)) AS mn, max(list_max(v)) AS mx FROM w2),
         |q AS (SELECT p AS qp, embedding AS q_emb, v AS qd FROM w2 WHERE vec_id = $qid),
         |s1 AS (SELECT b.vec_id,
         |    CAST(list_sum(list_transform(range(1, ${groups + 1}),
         |      i -> bit_count(xor(b.p[i], q.qp[i])))) AS BIGINT) AS ham
         |  FROM w2 b CROSS JOIN q WHERE b.vec_id <> $qid
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $s1),
         |s2 AS (SELECT s1.vec_id, s1.ham,
         |    CAST(list_sum(list_transform(range(1, ${wideN + 1}), i ->
         |      (CAST(floor(((b.v[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)
         |       - CAST(floor(((q.qd[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT))
         |      * (CAST(floor(((b.v[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)
         |       - CAST(floor(((q.qd[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)))) AS BIGINT) AS d8
         |  FROM s1 JOIN w2 b USING (vec_id) CROSS JOIN q CROSS JOIN st
         |  ORDER BY d8 ASC, s1.vec_id ASC LIMIT $s2)
         |SELECT s2.vec_id,
         |  CAST(floor(list_cosine_similarity(b.v, q.qd) * 10000 + 0.5) AS BIGINT) AS score,
         |  s2.d8, s2.ham
         |FROM s2 JOIN w2 b USING (vec_id) CROSS JOIN q
         |ORDER BY score DESC, s2.vec_id ASC LIMIT 10""".stripMargin
    },

    // A46g: knn_cascade_2048's oracle with the A46f wide-centroid probe
    // prelude and the stage-1 body restricted to probed clusters'
    // members; calibration (st) and the query stay corpus-wide
    "knn_ivf_cascade_2048" -> {
      val (wideN, groups, s1w, s2w, qid) = (2048, 64, IvfCascStage1, CascStage2, 3)
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |w2 AS MATERIALIZED (SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS v,
         |  list_transform(range(0, $groups), g ->
         |    list_reduce(list_transform(range(0, 32), j ->
         |      CASE WHEN embedding[g*32 + j + 1] > 0.0 THEN CAST(1 AS BIGINT) << j
         |           ELSE CAST(0 AS BIGINT) END), (a, b) -> a + b)) AS p
         |  FROM wide),
         |${HybridQueries.wideCentDuck},
         |qp0 AS (SELECT embedding FROM wide WHERE vec_id = $qid),
         |probes AS (
         |  SELECT c.label FROM centw c CROSS JOIN qp0
         |  ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
         |    CAST(qp0.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC
         |  LIMIT 2),
         |st AS (SELECT min(list_min(v)) AS mn, max(list_max(v)) AS mx FROM w2),
         |q AS (SELECT p AS qp, embedding AS q_emb, v AS qd FROM w2 WHERE vec_id = $qid),
         |s1 AS (SELECT b.vec_id,
         |    CAST(list_sum(list_transform(range(1, ${groups + 1}),
         |      i -> bit_count(xor(b.p[i], q.qp[i])))) AS BIGINT) AS ham
         |  FROM w2 b JOIN embeddings e2 ON e2.vec_id = b.vec_id
         |  JOIN probes pr ON e2.label = pr.label
         |  CROSS JOIN q WHERE b.vec_id <> $qid
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $s1w),
         |s2 AS (SELECT s1.vec_id, s1.ham,
         |    CAST(list_sum(list_transform(range(1, ${wideN + 1}), i ->
         |      (CAST(floor(((b.v[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)
         |       - CAST(floor(((q.qd[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT))
         |      * (CAST(floor(((b.v[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)
         |       - CAST(floor(((q.qd[i] - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)))) AS BIGINT) AS d8
         |  FROM s1 JOIN w2 b USING (vec_id) CROSS JOIN q CROSS JOIN st
         |  ORDER BY d8 ASC, s1.vec_id ASC LIMIT $s2w)
         |SELECT s2.vec_id,
         |  CAST(floor(list_cosine_similarity(b.v, q.qd) * 10000 + 0.5) AS BIGINT) AS score,
         |  s2.d8, s2.ham
         |FROM s2 JOIN w2 b USING (vec_id) CROSS JOIN q
         |ORDER BY score DESC, s2.vec_id ASC LIMIT 10""".stripMargin
    },

    // A21g: the pqBatchOracleSql pipeline at width — one shared wide
    // encode, per-q ADC tables (list_reduce folds), per-q window cuts
    "knn_pq_batch_wide_2048" -> pqBatchWideOracleSql2048(Some("vec_id < 8")),

    // A21i: appended wide index ≡ full rebuild at the same stored
    // codebook — the fresh single-query wide pipeline replays
    // build+append+serve verbatim at query id 5 (the A21f convention)
    "knn_pq_append_2048" -> pqOracleSql2048(qid = 5),

    // A21j: sharding never changes per-query results, so the oracle is
    // the SAME wide batch replay at the same 8-query width (the A21d
    // convention)
    "knn_pq_batch_sharded_2048" -> pqBatchWideOracleSql2048(Some("vec_id < 8")),

    // A47c: the wide batch replay with the qs CTE deriving the four
    // external midpoints from WIDE vector pairs (one float round per
    // component, the A47 construction at width) and the self-exclusion
    // dropped (external q_ids name no corpus row)
    "knn_pq_batch_external_2048" -> pqBatchWideOracleSql2048(qsWhere = None,
      qsSelect = Some(
        """SELECT a.vec_id // 2 AS q_id,
          |    list_transform(range(1, 2049),
          |      i -> CAST(CAST(((CAST(a.embedding AS DOUBLE[]))[i] + (CAST(b.embedding AS DOUBLE[]))[i]) * 0.5 AS FLOAT) AS DOUBLE)) AS qv
          |  FROM wide a JOIN wide b ON b.vec_id = a.vec_id + 1
          |  WHERE a.vec_id % 2 = 0 AND a.vec_id < 8""".stripMargin),
      excludeSelf = false),

    // A23d: the wide batch replay over the metadata-qualified body only
    // (queries still from the full wide frame — the A23b convention)
    "hybrid_knn_pq_batch_wide_2048" -> pqBatchWideOracleSql2048(Some("vec_id < 8"),
      bodySelect = Some(
        """SELECT w.vec_id, CAST(w.embedding AS DOUBLE[]) AS v
          |  FROM wide w JOIN documents d ON d.doc_id = w.vec_id
          |  WHERE d.lang IS NOT NULL AND d.lang = 'en'""".stripMargin)),

    // A44b: knn_sq8_2048's oracle with the A46f wide-centroid probe
    // prelude, the body restricted to probed clusters' members,
    // calibration corpus-wide, and the knn_ivfsq 40-row cosine rerank
    "knn_ivfsq_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM wide),
         |${HybridQueries.wideCentDuck},
         |qp AS (SELECT embedding FROM wide WHERE vec_id = 0),
         |probes AS (
         |  SELECT c.label FROM centw c CROSS JOIN qp
         |  ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
         |    CAST(qp.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC
         |  LIMIT 2),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM wide WHERE vec_id = 0),
         |b AS (SELECT w.vec_id, CAST(w.embedding AS DOUBLE[]) AS v
         |  FROM wide w JOIN embeddings e USING (vec_id)
         |  JOIN probes p ON e.label = p.label WHERE w.vec_id <> 0),
         |qz AS (SELECT vec_id, v,
         |  list_transform(v,  x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM b CROSS JOIN q CROSS JOIN st),
         |short AS (SELECT vec_id, v,
         |    CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |      i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS d8
         |  FROM qz ORDER BY d8 ASC, vec_id ASC LIMIT $IvfSqShortlist)
         |SELECT s.vec_id,
         |  CAST(floor(list_cosine_similarity(s.v, q.qv) * 10000 + 0.5) AS BIGINT) AS score,
         |  s.d8
         |FROM short s CROSS JOIN q ORDER BY score DESC, s.vec_id ASC LIMIT 10""".stripMargin,

    // A42d: the A42 residual-IVFPQ integer composition re-derived over the
    // wide frame — quantized 2048-d components, floor-mean centroids,
    // integer-sqL2 probe (asc, label asc), residual transform, 16×128
    // seeded residual codebook, argmin encode, per-cluster ADC, exact
    // integer rerank. Integer sums are order-insensitive so list_sum
    // transliterates at any width.
    "knn_ivfpq_residual_2048" -> {
      val (dims, numSub, subDim, numCodes) = (2048, 16, 128, 16)
      def sqdSub(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${subDim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      def sqdFull(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("w.embedding")
      // per-(row, m) residual sub-vectors hoisted into their own CTE
      // (r14): a slice expression INSIDE the fold lambda re-slices the
      // 128-element list per term — 128× redundant copies per (row, m,
      // code) that made this oracle take ~210 s at the gate scale;
      // pre-slicing cuts it to one slice per (row, m). Integer sums are
      // unchanged, so the replayed values are bit-identical.
      val bSlice = "s.sub"
      val qSlice = "qr.sub"
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |qe AS MATERIALIZED (SELECT w.vec_id, CAST(e.label AS BIGINT) AS label, $qz AS q
         |  FROM wide w JOIN embeddings e USING (vec_id)),
         |cent AS MATERIALIZED (SELECT label, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cent FROM (
         |    SELECT label, d.dim AS dim, sum(q[d.dim + 1]) AS s, count(*) AS cnt
         |    FROM qe CROSS JOIN range($dims) d(dim) GROUP BY label, d.dim) GROUP BY label),
         |qq AS (SELECT q FROM qe WHERE vec_id = 0),
         |probes AS (SELECT label FROM (
         |  SELECT c.label, row_number() OVER (ORDER BY ${sqdFull("c.cent", "q.q")} ASC, c.label ASC) AS rn
         |  FROM cent c CROSS JOIN qq q) WHERE rn <= 2),
         |res AS MATERIALIZED (SELECT e.vec_id, e.label,
         |  list_transform(range(1, ${dims + 1}), i -> e.q[i] - c.cent[i]) AS r, e.q AS q
         |  FROM qe e JOIN cent c USING (label)),
         |cb AS MATERIALIZED (SELECT m.m AS m, s.vec_id AS code,
         |  s.r[m.m*$subDim+1 : m.m*$subDim+$subDim] AS cw
         |  FROM res s, (SELECT unnest(range($numSub)) AS m) m WHERE s.vec_id < $numCodes),
         |body AS MATERIALIZED (SELECT b.vec_id, b.label, b.r, b.q FROM res b JOIN probes USING (label)
         |  WHERE b.vec_id <> 0),
         |bsl AS MATERIALIZED (SELECT b.vec_id, m.m AS m,
         |  b.r[m.m*$subDim+1 : m.m*$subDim+$subDim] AS sub
         |  FROM body b, (SELECT unnest(range($numSub)) AS m) m),
         |enc0 AS (SELECT s.vec_id, cb.m, cb.code,
         |  ${sqdSub(bSlice, "cb.cw")} AS d
         |  FROM bsl s JOIN cb ON cb.m = s.m),
         |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
         |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
         |  FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
         |  GROUP BY 1, 2),
         |qres0 AS (SELECT p.label,
         |  list_transform(range(1, ${dims + 1}), i -> q.q[i] - c.cent[i]) AS qr
         |  FROM probes p JOIN cent c USING (label) CROSS JOIN qq q),
         |qres AS (SELECT q0.label, m.m AS m,
         |  q0.qr[m.m*$subDim+1 : m.m*$subDim+$subDim] AS sub
         |  FROM qres0 q0, (SELECT unnest(range($numSub)) AS m) m),
         |adc AS (SELECT qr.label, cb.m, cb.code, ${sqdSub(qSlice, "cb.cw")} AS td
         |  FROM cb JOIN qres qr ON qr.m = cb.m),
         |short AS (SELECT enc.vec_id FROM enc
         |  JOIN (SELECT vec_id, label FROM body) bl USING (vec_id)
         |  JOIN adc ON adc.label = bl.label AND adc.m = enc.m AND adc.code = enc.code
         |  GROUP BY enc.vec_id ORDER BY sum(adc.td) ASC, enc.vec_id ASC LIMIT 100)
         |SELECT b.vec_id, ${sqdFull("b.q", "q2.q")} AS score
         |FROM body b JOIN short USING (vec_id) CROSS JOIN qq q2
         |ORDER BY score ASC, b.vec_id ASC LIMIT 10""".stripMargin
    },

    // A46b: knn_sq8's oracle over the derived-wide vectors; integer
    // sq-L2 sums are order-insensitive so list_sum transliterates
    "knn_sq8_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM wide),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM wide WHERE vec_id = 0),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM wide WHERE vec_id <> 0),
         |qz AS (SELECT vec_id,
         |  list_transform(v,  x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM b CROSS JOIN q CROSS JOIN st)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |    i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS dist
         |FROM qz ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

    "knn_pq_append" -> pqOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 5",
      qid = 5),

    // A21b: the batch form — one enc over ALL rows (encode is per-row
    // independent, so encode-all-then-exclude ≡ the single-query oracle's
    // exclude-then-encode), per-query ADC/shortlist/rerank via window cuts
    "knn_pq_batch" -> pqBatchOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"),

    // A23b: the same batch pipeline over the metadata-qualified body only
    "hybrid_knn_pq_batch" -> pqBatchOracleSql(
      """SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |  WHERE d.lang IS NOT NULL AND d.lang = 'en'""".stripMargin),


    // A21c: the wide form shares the batch pipeline oracle verbatim — the
    // joined-ADC relation IS the oracle's adc CTE shape; only |Q| widens
    "knn_pq_batch_wide" -> pqBatchOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      qsWhere = "vec_id < 256"),

    // A23c: the filtered wide form — the A23b body with A21c's width
    "hybrid_knn_pq_batch_wide" -> pqBatchOracleSql(
      """SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |  WHERE d.lang IS NOT NULL AND d.lang = 'en'""".stripMargin,
      qsWhere = "vec_id < 128"),

    // A21d: sharding never changes per-query results, so the oracle is
    // the wide pipeline's replay at the same 128-query width
    "knn_pq_batch_sharded" -> pqBatchOracleSql(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
      qsWhere = "vec_id < 128"),

    // A24c / A42c: same relational replay as the literal batch forms,
    // wider query set
    "knn_ivfpq_batch_wide" -> ivfpqBatchOracleSql("vec_id < 128"),
    "knn_ivfpq_residual_batch_wide" -> ivfpqResidualBatchOracleSql("vec_id < 128"),

    // A24b: per-query probes (the hybrid_knn centroid ordering, windowed
    // per q), union-label body encode, (q_id, label) membership join,
    // then the batch ADC/shortlist/rerank window cuts
    "knn_ivfpq_batch" -> ivfpqBatchOracleSql("vec_id <= 4"),

    // A41b: batched SQ8-coarse + exact integer rerank, per-query windows
    "knn_refine_rerank_batch" ->
      s"""WITH st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |       FROM embeddings WHERE vec_id <= 4),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qz AS (SELECT qs.q_id, b.vec_id,
         |  list_transform(b.v,   x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS ca,
         |  list_transform(qs.qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS cb
         |  FROM b CROSS JOIN qs CROSS JOIN st WHERE b.vec_id <> qs.q_id),
         |c0 AS (SELECT q_id, vec_id,
         |  CAST(list_sum(list_transform(range(1, len(ca) + 1),
         |    i -> (ca[i] - cb[i]) * (ca[i] - cb[i]))) AS BIGINT) AS coarse FROM qz),
         |coarse AS (SELECT q_id, vec_id, coarse FROM (SELECT q_id, vec_id, coarse,
         |    row_number() OVER (PARTITION BY q_id ORDER BY coarse ASC, vec_id ASC) AS rn
         |  FROM c0) WHERE rn <= $RefineR),
         |ex AS (SELECT vec_id, ${DuckDialect.quantizeVec("embedding")} AS eq FROM embeddings),
         |eqq AS (SELECT vec_id AS q_id, ${DuckDialect.quantizeVec("embedding")} AS qq
         |  FROM embeddings WHERE vec_id <= 4),
         |rr AS (SELECT c.q_id, c.vec_id, c.coarse,
         |    CAST(list_sum(list_transform(range(1, len(e.eq) + 1),
         |      i -> (e.eq[i] - q.qq[i]) * (e.eq[i] - q.qq[i]))) AS BIGINT) AS score
         |  FROM coarse c JOIN ex e USING (vec_id) JOIN eqq q USING (q_id))
         |SELECT q_id, vec_id, rank, coarse, score FROM (
         |  SELECT q_id, vec_id, coarse, score,
         |    CAST(row_number() OVER (PARTITION BY q_id
         |      ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank FROM rr)
         |WHERE rank <= 10""".stripMargin,

    // integer-exact per-subspace Lloyd's replayed as unrolled CTEs:
    // quantize → seed codebook (16 lowest sample ids) → [assign →
    // floor-mean codeword]×2 → integer ADC shortlist → exact integer rerank
    "knn_pq_trained" -> {
      val iters = 2; val numCodes = 16; val sampleMax = 256
      def dsq8(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 9), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      def dsq64(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      val iterCtes = (0 until iters).map { i =>
        s"""p$i AS (SELECT vec_id, m, code FROM (
           |  SELECT s.vec_id, s.m, c.code, row_number() OVER (PARTITION BY s.vec_id, s.m
           |    ORDER BY ${dsq8("s.s", "c.cw")} ASC, c.code ASC) AS rn
           |  FROM sv s JOIN cb$i c ON s.m = c.m) WHERE rn = 1),
           |u$i AS (SELECT p.m, p.code, dd.dim, sum(s.s[dd.dim + 1]) AS sm, count(*) AS cnt
           |  FROM p$i p JOIN sv s ON p.vec_id = s.vec_id AND p.m = s.m
           |  CROSS JOIN range(8) dd(dim) GROUP BY p.m, p.code, dd.dim),
           |cb${i + 1} AS (SELECT c.m, c.code, coalesce(n.cw, c.cw) AS cw FROM cb$i c LEFT JOIN (
           |  SELECT m, code, list((sm - ((sm % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cw
           |  FROM u$i GROUP BY m, code) n ON c.m = n.m AND c.code = n.code)""".stripMargin
      }.mkString(",\n")
      s"""WITH ed AS (SELECT vec_id, $qz AS q FROM embeddings),
         |sv AS (SELECT e.vec_id, mm.m, list_transform(range(1, 9), i -> e.q[mm.m * 8 + i]) AS s
         |  FROM ed e CROSS JOIN range(8) mm(m) WHERE e.vec_id < $sampleMax),
         |seeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
         |  FROM (SELECT vec_id FROM ed WHERE vec_id < $sampleMax ORDER BY vec_id LIMIT $numCodes)),
         |cb0 AS (SELECT s.m, sd.code, s.s AS cw FROM seeds sd JOIN sv s USING (vec_id)),
         |$iterCtes,
         |csv AS (SELECT e.vec_id, mm.m, list_transform(range(1, 9), i -> e.q[mm.m * 8 + i]) AS s
         |  FROM ed e CROSS JOIN range(8) mm(m) WHERE e.vec_id <> 0),
         |codes AS (SELECT vec_id, m, code FROM (
         |  SELECT s.vec_id, s.m, c.code, row_number() OVER (PARTITION BY s.vec_id, s.m
         |    ORDER BY ${dsq8("s.s", "c.cw")} ASC, c.code ASC) AS rn
         |  FROM csv s JOIN cb$iters c ON s.m = c.m) WHERE rn = 1),
         |qsv AS (SELECT mm.m, list_transform(range(1, 9), i -> e.q[mm.m * 8 + i]) AS s
         |  FROM ed e CROSS JOIN range(8) mm(m) WHERE e.vec_id = 0),
         |adc AS (SELECT c.m, c.code, ${dsq8("q.s", "c.cw")} AS td
         |  FROM cb$iters c JOIN qsv q ON c.m = q.m),
         |short AS (SELECT codes.vec_id FROM codes JOIN adc USING (m, code)
         |  GROUP BY codes.vec_id ORDER BY CAST(sum(adc.td) AS BIGINT) ASC, codes.vec_id ASC
         |  LIMIT 100)
         |SELECT e.vec_id, ${dsq64("e.q", "qq.q")} AS score
         |FROM ed e JOIN short USING (vec_id)
         |CROSS JOIN (SELECT q FROM ed WHERE vec_id = 0) qq
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // A25b: the knn_pq_trained composition re-derived over the wide frame
    // — quantized 2048-d components, per-subspace Lloyd's (128-dim
    // E-step distances, integer floor-mean M-step) unrolled as CTEs,
    // integer ADC shortlist, exact integer rerank.
    "knn_pq_trained_2048" -> {
      val (dims, numSub, subDim) = (2048, 16, 128)
      val iters = 2; val numCodes = 16; val sampleMax = 256
      def dsqSub(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${subDim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      def dsqFull(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      val iterCtes = (0 until iters).map { i =>
        s"""p$i AS (SELECT vec_id, m, code FROM (
           |  SELECT s.vec_id, s.m, c.code, row_number() OVER (PARTITION BY s.vec_id, s.m
           |    ORDER BY ${dsqSub("s.s", "c.cw")} ASC, c.code ASC) AS rn
           |  FROM sv s JOIN cb$i c ON s.m = c.m) WHERE rn = 1),
           |u$i AS (SELECT p.m, p.code, dd.dim, sum(s.s[dd.dim + 1]) AS sm, count(*) AS cnt
           |  FROM p$i p JOIN sv s ON p.vec_id = s.vec_id AND p.m = s.m
           |  CROSS JOIN range($subDim) dd(dim) GROUP BY p.m, p.code, dd.dim),
           |cb${i + 1} AS (SELECT c.m, c.code, coalesce(n.cw, c.cw) AS cw FROM cb$i c LEFT JOIN (
           |  SELECT m, code, list((sm - ((sm % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cw
           |  FROM u$i GROUP BY m, code) n ON c.m = n.m AND c.code = n.code)""".stripMargin
      }.mkString(",\n")
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |ed AS MATERIALIZED (SELECT vec_id, $qz AS q FROM wide),
         |sv AS MATERIALIZED (SELECT e.vec_id, mm.m,
         |  list_transform(range(1, ${subDim + 1}), i -> e.q[mm.m * $subDim + i]) AS s
         |  FROM ed e CROSS JOIN range($numSub) mm(m) WHERE e.vec_id < $sampleMax),
         |seeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code
         |  FROM (SELECT vec_id FROM ed WHERE vec_id < $sampleMax ORDER BY vec_id LIMIT $numCodes)),
         |cb0 AS (SELECT s.m, sd.code, s.s AS cw FROM seeds sd JOIN sv s USING (vec_id)),
         |$iterCtes,
         |csv AS (SELECT e.vec_id, mm.m,
         |  list_transform(range(1, ${subDim + 1}), i -> e.q[mm.m * $subDim + i]) AS s
         |  FROM ed e CROSS JOIN range($numSub) mm(m) WHERE e.vec_id <> 0),
         |codes AS (SELECT vec_id, m, code FROM (
         |  SELECT s.vec_id, s.m, c.code, row_number() OVER (PARTITION BY s.vec_id, s.m
         |    ORDER BY ${dsqSub("s.s", "c.cw")} ASC, c.code ASC) AS rn
         |  FROM csv s JOIN cb$iters c ON s.m = c.m) WHERE rn = 1),
         |qsv AS (SELECT mm.m,
         |  list_transform(range(1, ${subDim + 1}), i -> e.q[mm.m * $subDim + i]) AS s
         |  FROM ed e CROSS JOIN range($numSub) mm(m) WHERE e.vec_id = 0),
         |adc AS (SELECT c.m, c.code, ${dsqSub("q.s", "c.cw")} AS td
         |  FROM cb$iters c JOIN qsv q ON c.m = q.m),
         |short AS (SELECT codes.vec_id FROM codes JOIN adc USING (m, code)
         |  GROUP BY codes.vec_id ORDER BY CAST(sum(adc.td) AS BIGINT) ASC, codes.vec_id ASC
         |  LIMIT 100)
         |SELECT e.vec_id, ${dsqFull("e.q", "qq.q")} AS score
         |FROM ed e JOIN short USING (vec_id)
         |CROSS JOIN (SELECT q FROM ed WHERE vec_id = 0) qq
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    "recall_pq" -> {
      val pq = pqOracleSql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0")
      s"""WITH pqr AS ($pq),
         |ex AS (SELECT e.vec_id
         |  FROM embeddings e
         |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
         |  WHERE e.vec_id <> 0
         |  ORDER BY CAST(floor(list_distance(CAST(e.embedding AS DOUBLE[]),
         |    CAST(q.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) ASC, e.vec_id ASC
         |  LIMIT 10)
         |SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS hits
         |FROM pqr JOIN ex USING (vec_id)""".stripMargin
    },

    "hybrid_knn_pq" -> pqOracleSql(
      """SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
        |       FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |       WHERE e.vec_id <> 0 AND d.lang IS NOT NULL AND d.lang = 'en'""".stripMargin),

    // probe ordering identical to hybrid_knn's oracle (scaled cosine desc,
    // label asc); the PQ body then sees only the probed clusters' rows
    "knn_ivfpq" -> pqOracleSql(
      """SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
        |       FROM embeddings e JOIN probes p ON e.label = p.label
        |       WHERE e.vec_id <> 0""".stripMargin,
      prelude =
        s"""cent AS (${DuckDialect.centSql("embeddings")}),
           |qp AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
           |probes AS (
           |  SELECT c.label FROM cent c CROSS JOIN qp
           |  ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
           |    CAST(qp.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC
           |  LIMIT 2),
           |""".stripMargin),

    // A38b: the A38 replay over the wide CTE at the 256-slot prefix
    "knn_matryoshka_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  ${DuckDialect.quantizeVec(s"embedding[1:$MrlDims2048]")} AS p16 FROM wide),
         |q AS (SELECT p16 AS q16, v AS q_vec FROM b WHERE vec_id = 0),
         |short AS (SELECT b.vec_id, b.v,
         |    CAST(list_sum(list_transform(range(1, ${MrlDims2048 + 1}),
         |      i -> (b.p16[i] - q.q16[i]) * (b.p16[i] - q.q16[i]))) AS BIGINT) AS d16
         |  FROM b CROSS JOIN q WHERE b.vec_id <> 0
         |  ORDER BY d16 ASC, b.vec_id ASC LIMIT $MrlShortlist)
         |SELECT s.vec_id,
         |  CAST(floor(list_cosine_similarity(s.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s.d16
         |FROM short s CROSS JOIN q ORDER BY score DESC, s.vec_id ASC LIMIT 10""".stripMargin,

    "knn_matryoshka" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  ${DuckDialect.quantizeVec(s"embedding[1:$MrlDims]")} AS p16 FROM embeddings),
         |q AS (SELECT p16 AS q16, v AS q_vec FROM b WHERE vec_id = 0),
         |short AS (SELECT b.vec_id, b.v,
         |    CAST(list_sum(list_transform(range(1, ${MrlDims + 1}),
         |      i -> (b.p16[i] - q.q16[i]) * (b.p16[i] - q.q16[i]))) AS BIGINT) AS d16
         |  FROM b CROSS JOIN q WHERE b.vec_id <> 0
         |  ORDER BY d16 ASC, b.vec_id ASC LIMIT $MrlShortlist)
         |SELECT s.vec_id,
         |  CAST(floor(list_cosine_similarity(s.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s.d16
         |FROM short s CROSS JOIN q ORDER BY score DESC, s.vec_id ASC LIMIT 10""".stripMargin,

    "knn_bq" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  ${bqHalfDuck("embedding", 0)} AS lo,
         |  ${bqHalfDuck("embedding", 32)} AS hi FROM embeddings),
         |q AS (SELECT lo AS q_lo, hi AS q_hi, v AS q_vec FROM b WHERE vec_id = 0),
         |short AS (SELECT b.vec_id, b.v,
         |    CAST(bit_count(xor(b.lo, q.q_lo)) + bit_count(xor(b.hi, q.q_hi)) AS BIGINT) AS ham
         |  FROM b CROSS JOIN q WHERE b.vec_id <> 0
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $BqShortlist)
         |SELECT s.vec_id,
         |  CAST(floor(list_cosine_similarity(s.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s.ham
         |FROM short s CROSS JOIN q ORDER BY score DESC, s.vec_id ASC LIMIT 10""".stripMargin,

    // A37b: the wide pack replay — the cascBaseDuckWide 64-word bit-order
    // fold (float > 0.0 sign test, bit j of word g ⟵ component g·32+j)
    // mirrors BqPackVec exactly; Hamming is the 64-term bit_count sum
    "knn_bq_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |b AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  list_transform(range(0, 64), g ->
         |    list_reduce(list_transform(range(0, 32), j ->
         |      CASE WHEN embedding[g*32 + j + 1] > 0.0 THEN CAST(1 AS BIGINT) << j
         |           ELSE CAST(0 AS BIGINT) END), (x, y) -> x + y)) AS p
         |  FROM wide),
         |q AS (SELECT p AS q_p, v AS q_vec FROM b WHERE vec_id = 0),
         |short AS (SELECT b.vec_id, b.v,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> bit_count(xor(b.p[i], q.q_p[i])))) AS BIGINT) AS ham
         |  FROM b CROSS JOIN q WHERE b.vec_id <> 0
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $BqShortlist)
         |SELECT s.vec_id,
         |  CAST(floor(list_cosine_similarity(s.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s.ham
         |FROM short s CROSS JOIN q ORDER BY score DESC, s.vec_id ASC LIMIT 10""".stripMargin,

    "knn_sq8" ->
      s"""WITH st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
         |qz AS (SELECT vec_id,
         |  list_transform(v,  x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM b CROSS JOIN q CROSS JOIN st)
         |SELECT vec_id,
         |  CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |    i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS dist
         |FROM qz ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

    // A44: knn_sq8's quantization restricted to knn_ivfpq's probe set,
    // plus the exact rerank — probe ordering identical to the ivfpq
    // oracle (scaled cosine desc, label asc)
    "knn_ivfsq" ->
      s"""WITH st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |cent AS (${DuckDialect.centSql("embeddings")}),
         |qp AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN qp
         |  ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
         |    CAST(qp.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC
         |  LIMIT 2),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |b AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
         |  FROM embeddings e JOIN probes p ON e.label = p.label WHERE e.vec_id <> 0),
         |qz AS (SELECT vec_id, v,
         |  list_transform(v,  x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM b CROSS JOIN q CROSS JOIN st),
         |short AS (SELECT vec_id, v,
         |    CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |      i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS d8
         |  FROM qz ORDER BY d8 ASC, vec_id ASC LIMIT $IvfSqShortlist)
         |SELECT s.vec_id,
         |  CAST(floor(list_cosine_similarity(s.v, q.qv) * 10000 + 0.5) AS BIGINT) AS score,
         |  s.d8
         |FROM short s CROSS JOIN q ORDER BY score DESC, s.vec_id ASC LIMIT 10""".stripMargin,

    // A43: the cascade funnel replayed stage by stage — hamming cut, sq8
    // cut, exact-cosine final, each with the engine's exact tie order
    "knn_cascade" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  ${bqHalfDuck("embedding", 0)} AS lo,
         |  ${bqHalfDuck("embedding", 32)} AS hi FROM embeddings),
         |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |              max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |q AS (SELECT lo AS q_lo, hi AS q_hi, v AS q_vec FROM b WHERE vec_id = 3),
         |s1 AS (SELECT b.vec_id, b.v,
         |    CAST(bit_count(xor(b.lo, q.q_lo)) + bit_count(xor(b.hi, q.q_hi)) AS BIGINT) AS ham
         |  FROM b CROSS JOIN q WHERE b.vec_id <> 3
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $CascStage1),
         |s1z AS (SELECT s1.vec_id, s1.v, s1.ham,
         |  list_transform(s1.v,    x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(q.q_vec, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM s1 CROSS JOIN q CROSS JOIN st),
         |s2 AS (SELECT vec_id, v, ham,
         |    CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |      i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS d8
         |  FROM s1z ORDER BY d8 ASC, vec_id ASC LIMIT $CascStage2)
         |SELECT s2.vec_id,
         |  CAST(floor(list_cosine_similarity(s2.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s2.d8, s2.ham
         |FROM s2 CROSS JOIN q ORDER BY score DESC, s2.vec_id ASC LIMIT 10""".stripMargin,

    // A43d: the ivfsq probe prelude feeding the cascade funnel — probed
    // body, then the same three cuts with the engine's exact tie order
    "knn_ivf_cascade" ->
      s"""WITH cent AS (${DuckDialect.centSql("embeddings")}),
         |qp AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN qp
         |  ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
         |    CAST(qp.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC
         |  LIMIT 2),
         |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |              max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |b AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
         |  ${bqHalfDuck("e.embedding", 0)} AS lo, ${bqHalfDuck("e.embedding", 32)} AS hi
         |  FROM embeddings e JOIN probes p ON e.label = p.label WHERE e.vec_id <> 0),
         |q AS (SELECT ${bqHalfDuck("embedding", 0)} AS q_lo,
         |  ${bqHalfDuck("embedding", 32)} AS q_hi,
         |  CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings WHERE vec_id = 0),
         |s1 AS (SELECT b.vec_id, b.v,
         |    CAST(bit_count(xor(b.lo, q.q_lo)) + bit_count(xor(b.hi, q.q_hi)) AS BIGINT) AS ham
         |  FROM b CROSS JOIN q
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $IvfCascStage1),
         |s1z AS (SELECT s1.vec_id, s1.v, s1.ham,
         |  list_transform(s1.v,    x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(q.q_vec, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM s1 CROSS JOIN q CROSS JOIN st),
         |s2 AS (SELECT vec_id, v, ham,
         |    CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |      i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS d8
         |  FROM s1z ORDER BY d8 ASC, vec_id ASC LIMIT $CascStage2)
         |SELECT s2.vec_id,
         |  CAST(floor(list_cosine_similarity(s2.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s2.d8, s2.ham
         |FROM s2 CROSS JOIN q ORDER BY score DESC, s2.vec_id ASC LIMIT 10""".stripMargin,

    // A43b: the batched funnel — per-q_id replay of the same three cuts
    "knn_cascade_batch" ->
      s"""WITH ${cascBaseDuck()},
         |${cascFunnelDuck(CascStage1, "a")}
         |SELECT q_id, vec_id, score, d8, ham FROM r3a WHERE rn3 <= 10""".stripMargin,

    // A43g: the batched funnel CTEs with the keep-join in the Hamming
    // body — queries still come from the full table (A23b convention)
    "hybrid_knn_cascade_batch" ->
      s"""WITH ${cascBaseDuck(7, "JOIN documents d ON d.doc_id = b.vec_id AND d.lang IS NOT NULL AND d.lang = 'en'")},
         |${cascFunnelDuck(CascStage1, "a")}
         |SELECT q_id, vec_id, score, d8, ham FROM r3a WHERE rn3 <= 10""".stripMargin,

    // A43f: union-of-shards ≡ one whole-file pass (every q_id in exactly
    // one chunk, per-query funnels independent) — so the oracle is the
    // SAME relational replay at 128 queries, independently verifying the
    // cap-and-union driver end-to-end
    "knn_cascade_batch_sharded" ->
      s"""WITH ${cascBaseDuck(127)},
         |${cascFunnelDuck(CascStage1, "a")}
         |SELECT q_id, vec_id, score, d8, ham FROM r3a WHERE rn3 <= 10""".stripMargin,

    // A43e: the filtered funnel — stage-1 body restricted to the
    // metadata-qualified ids (queries come from the full table), the
    // same three integer-exact cuts, calibration corpus-wide
    "hybrid_knn_cascade" ->
      s"""WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |  ${bqHalfDuck("embedding", 0)} AS lo,
         |  ${bqHalfDuck("embedding", 32)} AS hi FROM embeddings),
         |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |              max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |q AS (SELECT lo AS q_lo, hi AS q_hi, v AS q_vec FROM b WHERE vec_id = 6),
         |s1 AS (SELECT b.vec_id, b.v,
         |    CAST(bit_count(xor(b.lo, q.q_lo)) + bit_count(xor(b.hi, q.q_hi)) AS BIGINT) AS ham
         |  FROM b JOIN documents d ON d.doc_id = b.vec_id CROSS JOIN q
         |  WHERE b.vec_id <> 6 AND d.lang IS NOT NULL AND d.lang = 'en'
         |  ORDER BY ham ASC, b.vec_id ASC LIMIT $CascStage1),
         |s1z AS (SELECT s1.vec_id, s1.v, s1.ham,
         |  list_transform(s1.v,    x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qa,
         |  list_transform(q.q_vec, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS qb
         |  FROM s1 CROSS JOIN q CROSS JOIN st),
         |s2 AS (SELECT vec_id, v, ham,
         |    CAST(list_sum(list_transform(range(1, len(qa) + 1),
         |      i -> (qa[i] - qb[i]) * (qa[i] - qb[i]))) AS BIGINT) AS d8
         |  FROM s1z ORDER BY d8 ASC, vec_id ASC LIMIT $CascStage2)
         |SELECT s2.vec_id,
         |  CAST(floor(list_cosine_similarity(s2.v, q.q_vec) * 10000 + 0.5) AS BIGINT) AS score,
         |  s2.d8, s2.ham
         |FROM s2 CROSS JOIN q ORDER BY score DESC, s2.vec_id ASC LIMIT 10""".stripMargin,

    // A43c: the width sweep — one shared Hamming ranking, one exact
    // ground truth, each width a filter on the ranking
    "recall_cascade" -> {
      val chains = CascWidths.map(w => cascFunnelDuck(w, s"w$w")).mkString(",\n")
      val perW = CascWidths.map { w =>
        s"""SELECT CAST($w AS BIGINT) AS w, q.q_id, CAST(coalesce(t.h, 0) AS BIGINT) AS n_hit
           |FROM qs q LEFT JOIN (
           |  SELECT a.q_id, count(*) AS h
           |  FROM (SELECT q_id, vec_id FROM r3w$w WHERE rn3 <= 10) a
           |  JOIN ex ON a.q_id = ex.q_id AND a.vec_id = ex.vec_id
           |  GROUP BY a.q_id) t ON q.q_id = t.q_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${cascBaseDuck()},
         |$chains,
         |ex AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, b.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY CAST(floor(list_cosine_similarity(b.v, q.q_vec) * 10000 + 0.5) AS BIGINT) DESC,
         |               b.vec_id ASC) AS rn
         |  FROM b CROSS JOIN qs q WHERE b.vec_id <> q.q_id) WHERE rn <= 10)
         |$perW""".stripMargin
    },

    // A46d: the A43c recall oracle over the wide base CTEs — the funnel
    // chains are width-generic, only the base swaps (packed arrays +
    // bit_count(xor) fold; exact cosine ground truth over the wide v)
    "recall_cascade_2048" -> {
      val chains = CascWidths.map(w => cascFunnelDuck(w, s"w$w")).mkString(",\n")
      val perW = CascWidths.map { w =>
        s"""SELECT CAST($w AS BIGINT) AS w, q.q_id, CAST(coalesce(t.h, 0) AS BIGINT) AS n_hit
           |FROM qs q LEFT JOIN (
           |  SELECT a.q_id, count(*) AS h
           |  FROM (SELECT q_id, vec_id FROM r3w$w WHERE rn3 <= 10) a
           |  JOIN ex ON a.q_id = ex.q_id AND a.vec_id = ex.vec_id
           |  GROUP BY a.q_id) t ON q.q_id = t.q_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ${cascBaseDuckWide()},
         |$chains,
         |ex AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, b.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY CAST(floor(list_cosine_similarity(b.v, q.q_vec) * 10000 + 0.5) AS BIGINT) DESC,
         |               b.vec_id ASC) AS rn
         |  FROM b CROSS JOIN qs q WHERE b.vec_id <> q.q_id) WHERE rn <= 10)
         |$perW""".stripMargin
    },

    // A42: the full residual-IVFPQ composition in integer CTEs — floor-mean
    // centroids, probe, residual transform, seeded residual codebook,
    // argmin encode, per-cluster ADC, shortlist, exact rerank
    "knn_ivfpq_residual" -> {
      def sqd8(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 9), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      def sqd64(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      s"""WITH qe AS (SELECT vec_id, CAST(label AS BIGINT) AS label, $qz AS q FROM embeddings),
         |cent AS (SELECT label, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cent FROM (
         |    SELECT label, d.dim AS dim, sum(q[d.dim + 1]) AS s, count(*) AS cnt
         |    FROM qe CROSS JOIN range(64) d(dim) GROUP BY label, d.dim) GROUP BY label),
         |qq AS (SELECT q FROM qe WHERE vec_id = 0),
         |probes AS (SELECT label FROM (
         |  SELECT c.label, row_number() OVER (ORDER BY ${sqd64("c.cent", "q.q")} ASC, c.label ASC) AS rn
         |  FROM cent c CROSS JOIN qq q) WHERE rn <= 2),
         |res AS (SELECT e.vec_id, e.label,
         |  list_transform(range(1, 65), i -> e.q[i] - c.cent[i]) AS r, e.q AS q
         |  FROM qe e JOIN cent c USING (label)),
         |cb AS (SELECT m.m AS m, s.vec_id AS code, s.r[m.m*8+1 : m.m*8+8] AS cw
         |  FROM res s, (SELECT unnest(range(8)) AS m) m WHERE s.vec_id < 16),
         |body AS (SELECT b.vec_id, b.label, b.r, b.q FROM res b JOIN probes USING (label)
         |  WHERE b.vec_id <> 0),
         |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
         |  ${sqd8("(b.r[cb.m*8+1 : cb.m*8+8])", "cb.cw")} AS d
         |  FROM body b CROSS JOIN cb),
         |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
         |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
         |  FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
         |  GROUP BY 1, 2),
         |qres AS (SELECT p.label, list_transform(range(1, 65), i -> q.q[i] - c.cent[i]) AS qr
         |  FROM probes p JOIN cent c USING (label) CROSS JOIN qq q),
         |adc AS (SELECT qr.label, cb.m, cb.code, ${sqd8("(qr.qr[cb.m*8+1 : cb.m*8+8])", "cb.cw")} AS td
         |  FROM cb CROSS JOIN qres qr),
         |short AS (SELECT enc.vec_id FROM enc
         |  JOIN (SELECT vec_id, label FROM body) bl USING (vec_id)
         |  JOIN adc ON adc.label = bl.label AND adc.m = enc.m AND adc.code = enc.code
         |  GROUP BY enc.vec_id ORDER BY sum(adc.td) ASC, enc.vec_id ASC LIMIT 100)
         |SELECT b.vec_id, ${sqd64("b.q", "q2.q")} AS score
         |FROM body b JOIN short USING (vec_id) CROSS JOIN qq q2
         |ORDER BY score ASC, b.vec_id ASC LIMIT 10""".stripMargin
    },

    // A42b: the residual composition per query — per-q integer probes,
    // union-label residual body, query-independent codebook/encode, the
    // per-(q, cluster) ADC join enforcing membership, per-q window cuts
    "knn_ivfpq_residual_batch" -> ivfpqResidualBatchOracleSql("vec_id <= 4"),

    // A41: the same SQ8 coarse CTE feeding the top-R cut, then the exact
    // quantized-integer rerank over the candidate ids only
    "knn_refine_rerank" ->
      s"""WITH st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM embeddings),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0),
         |qz AS (SELECT vec_id,
         |  list_transform(v,  x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS ca,
         |  list_transform(qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS cb
         |  FROM b CROSS JOIN q CROSS JOIN st),
         |coarse AS (SELECT vec_id,
         |  CAST(list_sum(list_transform(range(1, len(ca) + 1),
         |    i -> (ca[i] - cb[i]) * (ca[i] - cb[i]))) AS BIGINT) AS coarse
         |  FROM qz ORDER BY coarse ASC, vec_id ASC LIMIT $RefineR),
         |ex AS (SELECT vec_id, ${DuckDialect.quantizeVec("embedding")} AS eq FROM embeddings),
         |eq0 AS (SELECT ${DuckDialect.quantizeVec("embedding")} AS qq
         |  FROM embeddings WHERE vec_id = 0)
         |SELECT c.vec_id, c.coarse,
         |  CAST(list_sum(list_transform(range(1, len(e.eq) + 1),
         |    i -> (e.eq[i] - q.qq[i]) * (e.eq[i] - q.qq[i]))) AS BIGINT) AS score
         |FROM coarse c JOIN ex e USING (vec_id) CROSS JOIN eq0 q
         |ORDER BY score ASC, c.vec_id ASC LIMIT 10""".stripMargin,

    // A41c: the refine replay over the wide frame — SQ8 calibration from
    // the wide min/max, 2048-term integer sums via list_transform folds
    "knn_refine_rerank_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id,
         |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
         |st AS (SELECT min(list_min(CAST(embedding AS DOUBLE[]))) AS mn,
         |                   max(list_max(CAST(embedding AS DOUBLE[]))) AS mx FROM wide),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM wide WHERE vec_id = 0),
         |b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM wide WHERE vec_id <> 0),
         |qz AS (SELECT vec_id,
         |  list_transform(v,  x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS ca,
         |  list_transform(qv, x -> CAST(floor(((x - st.mn) * 255.0) / (st.mx - st.mn)) AS BIGINT)) AS cb
         |  FROM b CROSS JOIN q CROSS JOIN st),
         |coarse AS (SELECT vec_id,
         |  CAST(list_sum(list_transform(range(1, len(ca) + 1),
         |    i -> (ca[i] - cb[i]) * (ca[i] - cb[i]))) AS BIGINT) AS coarse
         |  FROM qz ORDER BY coarse ASC, vec_id ASC LIMIT $RefineR),
         |ex AS (SELECT vec_id, ${DuckDialect.quantizeVec("embedding")} AS eq FROM wide),
         |eq0 AS (SELECT ${DuckDialect.quantizeVec("embedding")} AS qq
         |  FROM wide WHERE vec_id = 0)
         |SELECT c.vec_id, c.coarse,
         |  CAST(list_sum(list_transform(range(1, len(e.eq) + 1),
         |    i -> (e.eq[i] - q.qq[i]) * (e.eq[i] - q.qq[i]))) AS BIGINT) AS score
         |FROM coarse c JOIN ex e USING (vec_id) CROSS JOIN eq0 q
         |ORDER BY score ASC, c.vec_id ASC LIMIT 10""".stripMargin
  )

  /** The BATCH PQ pipeline oracle, parameterized by the body CTE — the
    * unfiltered (A21b) and metadata-filtered (A23b) batch entries share
    * everything else: one enc over the body, per-query ADC, k-heap-
    * equivalent window cuts, per-query exact rerank. Queries always come
    * from the FULL embeddings table (the filter applies to candidates,
    * never to who may ask). */
  private def pqBatchOracleSql(bodySelect: String,
                               qsWhere: String = "vec_id <= 4",
                               qsSelect: Option[String] = None,
                               excludeSelf: Boolean = true): String =
    s"""WITH cb AS (SELECT m.m AS m, e.vec_id AS code,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*8+1 : m.m*8+8] AS cw
       |  FROM embeddings e, (SELECT unnest(range(8)) AS m) m WHERE e.vec_id < 64),
       |body AS ($bodySelect),
       |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
       |  CAST(floor((${pqTerms("b.v", "cb.cw", 8, offset = true)}) * 10000.0) AS BIGINT) AS d
       |  FROM body b CROSS JOIN cb),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |        FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |        GROUP BY 1, 2),
       |qs AS (${qsSelect.getOrElse(
                  s"SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv " +
                    s"FROM embeddings WHERE $qsWhere")}),
       |q AS (SELECT qs.q_id, m.m AS m, qv[m.m*8+1 : m.m*8+8] AS qsub
       |      FROM qs, (SELECT unnest(range(8)) AS m) m),
       |adc AS (SELECT q.q_id, cb.m, cb.code,
       |  CAST(floor((${pqTerms("q.qsub", "cb.cw", 8, offset = false)}) * 10000.0) AS BIGINT) AS td
       |  FROM cb JOIN q ON cb.m = q.m),
       |sums AS (SELECT adc.q_id, enc.vec_id, CAST(sum(adc.td) AS BIGINT) AS adist
       |  FROM enc JOIN adc ON enc.m = adc.m AND enc.code = adc.code
       |  ${if (excludeSelf) "WHERE enc.vec_id <> adc.q_id " else ""}GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rn
       |  FROM sums) WHERE rn <= 100),
       |rr AS (SELECT s.q_id, s.vec_id,
       |    CAST(floor(list_distance(b.v, qs.qv) * 10000 + 0.5) AS BIGINT) AS score
       |  FROM short s JOIN body b ON b.vec_id = s.vec_id JOIN qs ON qs.q_id = s.q_id)
       |SELECT q_id, vec_id, rank, score FROM (
       |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM rr)
       |WHERE rank <= 10""".stripMargin

  /** The BATCH IVF×PQ oracle, parameterized by the query-set predicate —
    * the literal (A24b, 5 queries) and joined-wide (A24c, 128 queries)
    * entries replay the SAME relational pipeline: per-query probes,
    * union-label body encode, (q_id, label) membership join, per-query
    * ADC/shortlist/rerank window cuts. */
  private def ivfpqBatchOracleSql(qsWhere: String): String =
    s"""WITH cent AS (${DuckDialect.centSql("embeddings")}),
       |qs AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv,
       |         embedding AS qemb
       |       FROM embeddings WHERE $qsWhere),
       |probes AS (SELECT q_id, label FROM (
       |  SELECT qs.q_id, c.label, row_number() OVER (PARTITION BY qs.q_id
       |    ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
       |      CAST(qs.qemb AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC) AS rn
       |  FROM cent c CROSS JOIN qs) WHERE rn <= 2),
       |ul AS (SELECT DISTINCT label FROM probes),
       |cb AS (SELECT m.m AS m, e.vec_id AS code,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*8+1 : m.m*8+8] AS cw
       |  FROM embeddings e, (SELECT unnest(range(8)) AS m) m WHERE e.vec_id < 64),
       |body AS (SELECT e.vec_id, e.label, CAST(e.embedding AS DOUBLE[]) AS v
       |  FROM embeddings e JOIN ul USING (label)),
       |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
       |  CAST(floor((${pqTerms("b.v", "cb.cw", 8, offset = true)}) * 10000.0) AS BIGINT) AS d
       |  FROM body b CROSS JOIN cb),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |        FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |        GROUP BY 1, 2),
       |q8 AS (SELECT qs.q_id, m.m AS m, qv[m.m*8+1 : m.m*8+8] AS qsub
       |      FROM qs, (SELECT unnest(range(8)) AS m) m),
       |adc AS (SELECT q8.q_id, cb.m, cb.code,
       |  CAST(floor((${pqTerms("q8.qsub", "cb.cw", 8, offset = false)}) * 10000.0) AS BIGINT) AS td
       |  FROM cb JOIN q8 ON cb.m = q8.m),
       |sums AS (SELECT p.q_id, b.vec_id, CAST(sum(adc.td) AS BIGINT) AS adist
       |  FROM enc JOIN body b USING (vec_id)
       |  JOIN probes p ON p.label = b.label
       |  JOIN adc ON adc.q_id = p.q_id AND adc.m = enc.m AND adc.code = enc.code
       |  WHERE b.vec_id <> p.q_id GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rn
       |  FROM sums) WHERE rn <= 100),
       |rr AS (SELECT s.q_id, s.vec_id,
       |    CAST(floor(list_distance(CAST(e.embedding AS DOUBLE[]), qs.qv) * 10000 + 0.5) AS BIGINT) AS score
       |  FROM short s JOIN embeddings e ON e.vec_id = s.vec_id JOIN qs ON qs.q_id = s.q_id)
       |SELECT q_id, vec_id, rank, score FROM (
       |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM rr)
       |WHERE rank <= 10""".stripMargin

  /** The BATCH residual-IVFPQ oracle, parameterized by the query-set
    * predicate — shared by the literal (A42b) and joined-wide (A42c)
    * entries: per-q integer probes, union-label residual body,
    * query-independent codebook/encode, the per-(q, cluster) ADC join
    * enforcing membership, per-q window cuts. */
  private def ivfpqResidualBatchOracleSql(qsWhere: String): String = {
    def sqd8(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, 9), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    def sqd64(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    val qz = DuckDialect.quantizeVec("embedding")
    s"""WITH qe AS (SELECT vec_id, CAST(label AS BIGINT) AS label, $qz AS q FROM embeddings),
       |cent AS (SELECT label, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cent FROM (
       |    SELECT label, d.dim AS dim, sum(q[d.dim + 1]) AS s, count(*) AS cnt
       |    FROM qe CROSS JOIN range(64) d(dim) GROUP BY label, d.dim) GROUP BY label),
       |qs AS (SELECT vec_id AS q_id, q FROM qe WHERE $qsWhere),
       |probes AS (SELECT q_id, label FROM (
       |  SELECT qs.q_id, c.label, row_number() OVER (PARTITION BY qs.q_id
       |    ORDER BY ${sqd64("c.cent", "qs.q")} ASC, c.label ASC) AS rn
       |  FROM cent c CROSS JOIN qs) WHERE rn <= 2),
       |ul AS (SELECT DISTINCT label FROM probes),
       |res AS (SELECT e.vec_id, e.label,
       |  list_transform(range(1, 65), i -> e.q[i] - c.cent[i]) AS r, e.q AS q
       |  FROM qe e JOIN cent c USING (label)),
       |cb AS (SELECT m.m AS m, s.vec_id AS code, s.r[m.m*8+1 : m.m*8+8] AS cw
       |  FROM res s, (SELECT unnest(range(8)) AS m) m WHERE s.vec_id < 16),
       |body AS (SELECT b.vec_id, b.label, b.r, b.q FROM res b JOIN ul USING (label)),
       |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
       |  ${sqd8("(b.r[cb.m*8+1 : cb.m*8+8])", "cb.cw")} AS d
       |  FROM body b CROSS JOIN cb),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |  FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |  GROUP BY 1, 2),
       |qres AS (SELECT p.q_id, p.label,
       |  list_transform(range(1, 65), i -> qs.q[i] - c.cent[i]) AS qr
       |  FROM probes p JOIN cent c USING (label) JOIN qs ON qs.q_id = p.q_id),
       |adc AS (SELECT qr.q_id, qr.label, cb.m, cb.code,
       |  ${sqd8("(qr.qr[cb.m*8+1 : cb.m*8+8])", "cb.cw")} AS td
       |  FROM cb CROSS JOIN qres qr),
       |sums AS (SELECT adc.q_id, enc.vec_id, CAST(sum(adc.td) AS BIGINT) AS adist
       |  FROM enc JOIN (SELECT vec_id, label FROM body) bl USING (vec_id)
       |  JOIN adc ON adc.label = bl.label AND adc.m = enc.m AND adc.code = enc.code
       |  WHERE bl.vec_id <> adc.q_id GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rn
       |  FROM sums) WHERE rn <= 100),
       |rr AS (SELECT s.q_id, s.vec_id, ${sqd64("b.q", "qs.q")} AS score
       |  FROM short s JOIN body b USING (vec_id) JOIN qs ON qs.q_id = s.q_id)
       |SELECT q_id, vec_id, rank, score FROM (
       |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM rr)
       |WHERE rank <= 10""".stripMargin
  }

  /** A21g/A21j/A23d: the batch PQ pipeline oracle at the reference width
    * — one shared wide encode (over `bodySelect`, defaulting to the whole
    * wide frame; the filtered entry passes the metadata-qualified body),
    * per-q ADC tables as list_reduce folds, per-q window cuts. Sharded
    * and unsharded wide entries share it verbatim (sharding never changes
    * per-query results — the A21d convention). `adcOnly` stops the
    * replay at the ADC ranking (no shortlist/rerank) and emits
    * (q_id, rank, vec_id, adist) — the streaming wide serve's contract
    * (C66's "ADC-ranked serving" at width; pqServeDuck is its d=64
    * twin). */
  private[queries] def pqBatchWideOracleSql2048(qsWhere: Option[String],
                                       bodySelect: Option[String] = None,
                                       qsSelect: Option[String] = None,
                                       excludeSelf: Boolean = true,
                                       adcOnly: Boolean = false): String = {
    // exactly ONE query-set source: a WHERE over the wide frame, or a
    // whole replacement CTE (ADVICE r14: a sentinel string silently
    // ignored when qsSelect was given invited the next caller to pass a
    // real predicate and have it dropped)
    require(qsWhere.isDefined != qsSelect.isDefined,
      "pqBatchWideOracleSql2048: pass exactly one of qsWhere / qsSelect")
    val (numSub, subDim, numCodes) = (16, 128, 64)
    def fold(vec: String, cw: String, offset: Boolean): String =
      pqFold(vec, cw, subDim, offset)
    val body = bodySelect.getOrElse(
      "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM wide")
    val qsCte = qsSelect.getOrElse(
      s"""SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
         |       FROM wide WHERE ${qsWhere.get}""".stripMargin)
    val excl = if (excludeSelf) "\n  WHERE enc.vec_id <> adc.q_id" else ""
    s"""WITH wide AS MATERIALIZED (SELECT vec_id,
       |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
       |cb AS MATERIALIZED (SELECT m.m AS m, e.vec_id AS code,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*$subDim+1 : m.m*$subDim+$subDim] AS cw
       |  FROM wide e, (SELECT unnest(range($numSub)) AS m) m WHERE e.vec_id < $numCodes),
       |body AS MATERIALIZED ($body),
       |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
       |  CAST(floor(${fold("b.v", "cb.cw", offset = true)} * 10000.0) AS BIGINT) AS d
       |  FROM body b CROSS JOIN cb),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |        FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |        GROUP BY 1, 2),
       |qs AS ($qsCte),
       |q AS (SELECT qs.q_id, m.m AS m, qv[m.m*$subDim+1 : m.m*$subDim+$subDim] AS qsub
       |      FROM qs, (SELECT unnest(range($numSub)) AS m) m),
       |adc AS (SELECT q.q_id, cb.m, cb.code,
       |  CAST(floor(${fold("q.qsub", "cb.cw", offset = false)} * 10000.0) AS BIGINT) AS td
       |  FROM cb JOIN q ON cb.m = q.m),
       |sums AS (SELECT adc.q_id, enc.vec_id, CAST(sum(adc.td) AS BIGINT) AS adist
       |  FROM enc JOIN adc ON enc.m = adc.m AND enc.code = adc.code$excl
       |  GROUP BY 1, 2)""".stripMargin + (if (adcOnly)
      """
        |SELECT q_id, rank, vec_id, adist FROM (
        |  SELECT q_id, vec_id, adist, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY adist ASC, vec_id ASC) AS BIGINT) AS rank FROM sums)
        |WHERE rank <= 10""".stripMargin
    else
      """,
        |short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rn
        |  FROM sums) WHERE rn <= 100),
        |rr AS (SELECT s.q_id, s.vec_id,
        |    CAST(floor(list_distance(b.v, qs.qv) * 10000 + 0.5) AS BIGINT) AS score
        |  FROM short s JOIN body b ON b.vec_id = s.vec_id JOIN qs ON qs.q_id = s.q_id)
        |SELECT q_id, vec_id, rank, score FROM (
        |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM rr)
        |WHERE rank <= 10""".stripMargin)
  }

  /** A24d: the wide-batch pipeline oracle at the reference width — the
    * knn_pq_batch_wide_2048 replay with the A46f wide-centroid probe
    * prelude made per-query (scaled cosine desc, label asc, top 2 per
    * q_id) and a label-membership join restricting each query's sums to
    * its own probed clusters' members. Encode runs over the probed-UNION
    * body only (the entry's pruned one-scan shape — per-query results
    * are unchanged since every scored row is membership-checked).
    * `adcOnly` stops at the probe-restricted ADC ranking and emits
    * (q_id, rank, vec_id, adist) — the streaming wide IVF×PQ serve's
    * contract (the pqBatchWideOracleSql2048 convention). `qsSelect`
    * replaces the whole query CTE (must yield q_id, qv DOUBLE[], qemb —
    * the C66h external serve derives non-indexed wide queries) and
    * `excludeSelf` drops the self-exclusion (external q_ids name no
    * corpus row) — exactly one of qsWhere / qsSelect, the
    * pqBatchWideOracleSql2048 rule. */
  private[queries] def ivfpqBatchWideOracleSql2048(qsWhere: Option[String],
                                                   adcOnly: Boolean = false,
                                                   qsSelect: Option[String] = None,
                                                   excludeSelf: Boolean = true): String = {
    require(qsWhere.isDefined != qsSelect.isDefined,
      "ivfpqBatchWideOracleSql2048: pass exactly one of qsWhere / qsSelect")
    val (numSub, subDim, numCodes) = (16, 128, 64)
    def fold(vec: String, cw: String, offset: Boolean): String =
      pqFold(vec, cw, subDim, offset)
    val qsCte = qsSelect.getOrElse(
      s"""SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv,
         |         embedding AS qemb
         |       FROM wide WHERE ${qsWhere.get}""".stripMargin)
    val excl = if (excludeSelf) "\n  WHERE b.vec_id <> p.q_id" else ""
    s"""WITH wide AS MATERIALIZED (SELECT vec_id,
       |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
       |${HybridQueries.wideCentDuck},
       |qs AS ($qsCte),
       |probes AS (SELECT q_id, label FROM (
       |  SELECT qs.q_id, c.label, row_number() OVER (PARTITION BY qs.q_id
       |    ORDER BY CAST(floor(list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
       |      CAST(qs.qemb AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) DESC, c.label ASC) AS rn
       |  FROM centw c CROSS JOIN qs) WHERE rn <= 2),
       |ul AS (SELECT DISTINCT label FROM probes),
       |cb AS MATERIALIZED (SELECT m.m AS m, e.vec_id AS code,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*$subDim+1 : m.m*$subDim+$subDim] AS cw
       |  FROM wide e, (SELECT unnest(range($numSub)) AS m) m WHERE e.vec_id < $numCodes),
       |body AS MATERIALIZED (SELECT w.vec_id, e.label, CAST(w.embedding AS DOUBLE[]) AS v
       |  FROM wide w JOIN embeddings e USING (vec_id) JOIN ul ON e.label = ul.label),
       |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
       |  CAST(floor(${fold("b.v", "cb.cw", offset = true)} * 10000.0) AS BIGINT) AS d
       |  FROM body b CROSS JOIN cb),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |        FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |        GROUP BY 1, 2),
       |q8 AS (SELECT qs.q_id, m.m AS m, qv[m.m*$subDim+1 : m.m*$subDim+$subDim] AS qsub
       |      FROM qs, (SELECT unnest(range($numSub)) AS m) m),
       |adc AS (SELECT q8.q_id, cb.m, cb.code,
       |  CAST(floor(${fold("q8.qsub", "cb.cw", offset = false)} * 10000.0) AS BIGINT) AS td
       |  FROM cb JOIN q8 ON cb.m = q8.m),
       |sums AS (SELECT p.q_id, b.vec_id, CAST(sum(adc.td) AS BIGINT) AS adist
       |  FROM enc JOIN body b USING (vec_id)
       |  JOIN probes p ON p.label = b.label
       |  JOIN adc ON adc.q_id = p.q_id AND adc.m = enc.m AND adc.code = enc.code$excl
       |  GROUP BY 1, 2)""".stripMargin + (if (adcOnly)
      """
        |SELECT q_id, rank, vec_id, adist FROM (
        |  SELECT q_id, vec_id, adist, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY adist ASC, vec_id ASC) AS BIGINT) AS rank FROM sums)
        |WHERE rank <= 10""".stripMargin
    else
      """,
        |short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rn
        |  FROM sums) WHERE rn <= 100),
        |rr AS (SELECT s.q_id, s.vec_id,
        |    CAST(floor(list_distance(b.v, qs.qv) * 10000 + 0.5) AS BIGINT) AS score
        |  FROM short s JOIN body b ON b.vec_id = s.vec_id JOIN qs ON qs.q_id = s.q_id)
        |SELECT q_id, vec_id, rank, score FROM (
        |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
        |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM rr)
        |WHERE rank <= 10""".stripMargin)
  }

  /** A42e: the batch residual-IVFPQ oracle at the reference width — the
    * knn_ivfpq_residual_2048 integer composition (quantized 2048-d
    * components, floor-mean coarse centroids, integer-sqL2 probes,
    * residual transform, 16×128 seeded residual codebook, per-cluster
    * ADC, exact integer rerank) with ivfpqResidualBatchOracleSql's
    * per-query structure: per-q probe windows, union-label body, the
    * (q_id, label)-keyed ADC join enforcing membership, per-q window
    * cuts. Integer sums are order-insensitive so list_sum transliterates
    * at any width. */
  private def ivfpqResidualBatchWideOracleSql2048(qsWhere: String): String = {
    val (dims, numSub, subDim, numCodes) = (2048, 16, 128, 16)
    def sqdSub(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, ${subDim + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    def sqdFull(a: String, b: String) =
      s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
    val qz = DuckDialect.quantizeVec("w.embedding")
    // per-(row, m) sub-vectors pre-sliced (the knn_ivfpq_residual_2048
    // hoist — a slice inside the fold lambda re-slices per term)
    val bSlice = "s.sub"
    val qSlice = "qr.sub"
    s"""WITH wide AS MATERIALIZED (SELECT vec_id,
       |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
       |qe AS MATERIALIZED (SELECT w.vec_id, CAST(e.label AS BIGINT) AS label, $qz AS q
       |  FROM wide w JOIN embeddings e USING (vec_id)),
       |cent AS MATERIALIZED (SELECT label, list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cent FROM (
       |    SELECT label, d.dim AS dim, sum(q[d.dim + 1]) AS s, count(*) AS cnt
       |    FROM qe CROSS JOIN range($dims) d(dim) GROUP BY label, d.dim) GROUP BY label),
       |qs AS (SELECT vec_id AS q_id, q FROM qe WHERE $qsWhere),
       |probes AS (SELECT q_id, label FROM (
       |  SELECT qs.q_id, c.label, row_number() OVER (PARTITION BY qs.q_id
       |    ORDER BY ${sqdFull("c.cent", "qs.q")} ASC, c.label ASC) AS rn
       |  FROM cent c CROSS JOIN qs) WHERE rn <= 2),
       |ul AS (SELECT DISTINCT label FROM probes),
       |res AS MATERIALIZED (SELECT e.vec_id, e.label,
       |  list_transform(range(1, ${dims + 1}), i -> e.q[i] - c.cent[i]) AS r, e.q AS q
       |  FROM qe e JOIN cent c USING (label)),
       |cb AS MATERIALIZED (SELECT m.m AS m, s.vec_id AS code,
       |  s.r[m.m*$subDim+1 : m.m*$subDim+$subDim] AS cw
       |  FROM res s, (SELECT unnest(range($numSub)) AS m) m WHERE s.vec_id < $numCodes),
       |body AS MATERIALIZED (SELECT b.vec_id, b.label, b.r, b.q FROM res b JOIN ul USING (label)),
       |bsl AS MATERIALIZED (SELECT b.vec_id, m.m AS m,
       |  b.r[m.m*$subDim+1 : m.m*$subDim+$subDim] AS sub
       |  FROM body b, (SELECT unnest(range($numSub)) AS m) m),
       |enc0 AS (SELECT s.vec_id, cb.m, cb.code,
       |  ${sqdSub(bSlice, "cb.cw")} AS d
       |  FROM bsl s JOIN cb ON cb.m = s.m),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |  FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |  GROUP BY 1, 2),
       |qres0 AS (SELECT p.q_id, p.label,
       |  list_transform(range(1, ${dims + 1}), i -> qs.q[i] - c.cent[i]) AS qr
       |  FROM probes p JOIN cent c USING (label) JOIN qs ON qs.q_id = p.q_id),
       |qres AS (SELECT q0.q_id, q0.label, m.m AS m,
       |  q0.qr[m.m*$subDim+1 : m.m*$subDim+$subDim] AS sub
       |  FROM qres0 q0, (SELECT unnest(range($numSub)) AS m) m),
       |adc AS (SELECT qr.q_id, qr.label, cb.m, cb.code,
       |  ${sqdSub(qSlice, "cb.cw")} AS td
       |  FROM cb JOIN qres qr ON qr.m = cb.m),
       |sums AS (SELECT adc.q_id, enc.vec_id, CAST(sum(adc.td) AS BIGINT) AS adist
       |  FROM enc JOIN (SELECT vec_id, label FROM body) bl USING (vec_id)
       |  JOIN adc ON adc.label = bl.label AND adc.m = enc.m AND adc.code = enc.code
       |  WHERE bl.vec_id <> adc.q_id GROUP BY 1, 2),
       |short AS (SELECT q_id, vec_id FROM (SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adist ASC, vec_id ASC) AS rn
       |  FROM sums) WHERE rn <= 100),
       |rr AS (SELECT s.q_id, s.vec_id, ${sqdFull("b.q", "qs.q")} AS score
       |  FROM short s JOIN body b USING (vec_id) JOIN qs ON qs.q_id = s.q_id)
       |SELECT q_id, vec_id, rank, score FROM (
       |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
       |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM rr)
       |WHERE rank <= 10""".stripMargin
  }

  /** A46: the PQ pipeline oracle at d=2048 over the A45 derived-wide
    * vectors. Structure mirrors [[pqOracleSql]] with three width
    * adaptations: the `wide` prelude CTE derives the 2048-d vectors
    * (MATERIALIZED — it is referenced five times and DuckDB's CTE
    * inlining would re-derive per reference), the per-subspace squared
    * distance is a list_reduce LEFT FOLD (an explicit 128-term sum
    * exceeds DuckDB's 128-deep binder recursion; the fold accumulates in
    * the same sequential order as the PqNearestCode kernel loop), and
    * the codebook slices run m·128+1 … m·128+128. */
  private def pqOracleSql2048(qid: Int, bodySelect: Option[String] = None,
                              prelude: String = ""): String = {
    val (numSub, subDim, numCodes) = (16, 128, 64)
    def fold(vec: String, cw: String, offset: Boolean): String =
      pqFold(vec, cw, subDim, offset)
    val body = bodySelect.getOrElse(
      s"SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM wide WHERE vec_id <> $qid")
    s"""WITH wide AS MATERIALIZED (SELECT vec_id,
       |    ${HybridQueries.wideDuck} AS embedding FROM embeddings),
       |$prelude
       |cb AS MATERIALIZED (SELECT m.m AS m, e.vec_id AS code,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*$subDim+1 : m.m*$subDim+$subDim] AS cw
       |  FROM wide e, (SELECT unnest(range($numSub)) AS m) m WHERE e.vec_id < $numCodes),
       |body AS MATERIALIZED ($body),
       |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
       |  CAST(floor(${fold("b.v", "cb.cw", offset = true)} * 10000.0) AS BIGINT) AS d
       |  FROM body b CROSS JOIN cb),
       |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
       |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
       |        FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
       |        GROUP BY 1, 2),
       |q AS (SELECT m.m AS m,
       |    (CAST(e.embedding AS DOUBLE[]))[m.m*$subDim+1 : m.m*$subDim+$subDim] AS qsub
       |      FROM wide e, (SELECT unnest(range($numSub)) AS m) m WHERE e.vec_id = $qid),
       |adc AS (SELECT cb.m, cb.code,
       |  CAST(floor(${fold("q.qsub", "cb.cw", offset = false)} * 10000.0) AS BIGINT) AS td
       |  FROM cb JOIN q ON cb.m = q.m),
       |short AS (SELECT enc.vec_id FROM enc JOIN adc ON enc.m = adc.m AND enc.code = adc.code
       |          GROUP BY enc.vec_id ORDER BY sum(adc.td) ASC, enc.vec_id ASC LIMIT 100)
       |SELECT e.vec_id,
       |  CAST(floor(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q2.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) AS score
       |FROM wide e JOIN short USING (vec_id)
       |CROSS JOIN (SELECT embedding FROM wide WHERE vec_id = $qid) q2
       |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
  }

  /** The full PQ pipeline oracle, parameterized by the body (corpus) CTE —
    * the unfiltered, metadata-filtered, and IVF-probed entries share
    * everything else. `prelude` injects extra CTEs the body references. */
  private def pqOracleSql(bodySelect: String, prelude: String = "",
                          qid: Int = 0): String =
      s"""WITH $prelude cb AS (SELECT m.m AS m, e.vec_id AS code,
         |    (CAST(e.embedding AS DOUBLE[]))[m.m*8+1 : m.m*8+8] AS cw
         |  FROM embeddings e, (SELECT unnest(range(8)) AS m) m WHERE e.vec_id < 64),
         |body AS ($bodySelect),
         |enc0 AS (SELECT b.vec_id, cb.m, cb.code,
         |  CAST(floor((${pqTerms("b.v", "cb.cw", 8, offset = true)}) * 10000.0) AS BIGINT) AS d
         |  FROM body b CROSS JOIN cb),
         |dmin AS (SELECT vec_id, m, min(d) AS d0 FROM enc0 GROUP BY 1, 2),
         |enc AS (SELECT e.vec_id, e.m, min(e.code) AS code
         |        FROM enc0 e JOIN dmin ON e.vec_id = dmin.vec_id AND e.m = dmin.m AND e.d = dmin.d0
         |        GROUP BY 1, 2),
         |q AS (SELECT m.m AS m, (CAST(e.embedding AS DOUBLE[]))[m.m*8+1 : m.m*8+8] AS qsub
         |      FROM embeddings e, (SELECT unnest(range(8)) AS m) m WHERE e.vec_id = $qid),
         |adc AS (SELECT cb.m, cb.code,
         |  CAST(floor((${pqTerms("q.qsub", "cb.cw", 8, offset = false)}) * 10000.0) AS BIGINT) AS td
         |  FROM cb JOIN q ON cb.m = q.m),
         |short AS (SELECT enc.vec_id FROM enc JOIN adc ON enc.m = adc.m AND enc.code = adc.code
         |          GROUP BY enc.vec_id ORDER BY sum(adc.td) ASC, enc.vec_id ASC LIMIT 100)
         |SELECT e.vec_id,
         |  CAST(floor(list_distance(CAST(e.embedding AS DOUBLE[]), CAST(q2.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) AS score
         |FROM embeddings e JOIN short USING (vec_id)
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = $qid) q2
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
}
