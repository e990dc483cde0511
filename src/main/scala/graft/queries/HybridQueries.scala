package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{scaled, vectors}
import graft.operators.{Hnsw, Ivf, KMeans, Knn, Lsh, MetaPredicate}

/** §2.A10/A11/A13/A14/A15/A16 + B6 — clustered (IVF) hybrid search, the
  * ACORN analogue, plus LSH ANN and the evaluation/ingest surface. */
object HybridQueries {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "embeddings")
  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  private def cosSql(a: String, b: String) =
    s"CAST(floor(list_cosine_similarity(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"

  private def l2Sql(a: String, b: String) =
    s"CAST(floor(list_distance(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"

  private def centSql(src: String) = DuckDialect.centSql(src)

  private val NumPlanes = 4
  private val Dims = 64
  // A30: "the first 400 indexed vectors" — every sf has ≥500 embeddings,
  // so existing and arriving are both non-empty at any gate scale
  private[queries] val IvfAppendSplit = 400L

  private def bucketSql(vec: String): String = DuckDialect.bucketSql(vec, NumPlanes, Dims)

  // the persisted-HNSW "ingest" (A35c): graphs build+serialize once per
  // (JVM, sfDir) — the one-time index cost the repeated searches amortize,
  // same contract as bucketed_join's layout memo. Memo AND on-disk path
  // both key on the FULL dir (ADVICE r5: a basename-derived path under a
  // full-dir memo let two dirs sharing a basename alternate into one
  // location, silently rebuilding per switch — and a concurrent session
  // could observe a mid-overwrite index).
  private val hnswIndexFor = scala.collection.mutable.Map.empty[String, String]
  private def dirKey(dir: String): String = graft.TmpDirs.dirKey(dir)
  private def ensureHnswIndex(s: SparkSession, dir: String): String = synchronized {
    hnswIndexFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("hnsw_index_" + dirKey(dir))
      Hnsw.buildAndWrite(emb(s, dir).select("vec_id", "embedding"),
        path, dims = Dims, numParts = 8)
      path
    })
  }

  // A45: the 2048-d GATE construction — the reference's actual
  // dimensionality (reference acorn.py:30–40 builds at d=2048). The gate
  // tables carry 64-d synthetic embeddings, so the r10 verdict's "does the
  // scoring machinery survive d=2048" question was answered only with
  // ScaleProbe timings; this derives a deterministic 2048-d FLOAT vector
  // per row — wide[j] = base[((j%64)+(j div 64))%64] · ((j div 64)%5 +
  // (j%64)%3 + 1), one float round — IDENTICALLY in both engines (integer
  // index/multiplier arithmetic + IEEE round-to-nearest float cast), so
  // the kernels are HASH-checked at the reference's width. Honest scope:
  // values derive from 64-d data (no new gate table exists), but every one
  // of the 2048 slots is computed, stored, and scored for real.
  private[graft] val WideDims = 2048
  private[graft] def wideEmbeddings(s: SparkSession, dir: String): DataFrame =
    wideEmb(emb(s, dir))
  // the derivation runs as the codegen'd WidenVec kernel (r12: the
  // transform(sequence(0, 2047), ...) HOF form paid ~2048 boxed lambda
  // calls per row per derivation, and every 2048-d entry derives the
  // wide frame in several plan branches; arithmetic identical — float→
  // double widen, integer multiplier, one float round — spec-pinned
  // kernel ≡ HOF)
  private def wideEmb(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      graft.functions.vectors.widen(col("embedding"), Dims, WideDims).as("embedding"))
  /** The per-cluster WIDE centroid CTE (per-dim avg of the 2048 slots,
    * cast to FLOAT[] — the Ivf.centroids contract at width) — ONE copy
    * shared by every wide oracle with a probe prelude (A46f/A46g/A44b).
    * Expects a `wide` CTE in scope. */
  private[queries] val wideCentDuck: String =
    """centw AS MATERIALIZED (
      |  SELECT label, CAST(list(cv ORDER BY dim) AS FLOAT[]) AS cent FROM (
      |    SELECT e.label AS label, d.dim AS dim,
      |           avg(CAST(w.embedding[d.dim + 1] AS DOUBLE)) AS cv
      |    FROM wide w JOIN embeddings e USING (vec_id) CROSS JOIN range(2048) d(dim)
      |    GROUP BY e.label, d.dim)
      |  GROUP BY label)""".stripMargin

  /** The same construction as a DuckDB expression over `embedding`. */
  private[queries] def wideDuck: String =
    s"CAST(list_transform(range(0, $WideDims), j -> " +
      s"CAST((CAST(embedding AS DOUBLE[]))[((j % $Dims) + (j // $Dims)) % $Dims + 1]" +
      s" * CAST((j // $Dims) % 5 + (j % $Dims) % 3 + 1 AS DOUBLE) AS FLOAT)) AS FLOAT[])"

  // A45b: persisted-HNSW lifecycle at the reference's width — graphs
  // build+serialize once per (JVM, sfDir) over the WIDE vectors
  private val hnswWideFor = scala.collection.mutable.Map.empty[String, String]
  private def ensureHnswWideIndex(s: SparkSession, dir: String): String = synchronized {
    hnswWideFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("hnsw_wide_index_" + dirKey(dir))
      Hnsw.buildAndWrite(wideEmb(emb(s, dir)).select("vec_id", "embedding"),
        path, dims = WideDims, numParts = 8)
      path
    })
  }

  /** The ACORN corpus shape: every row indexed, the predicate as ONE
    * relationally-computed bit (shared by the filtered entries and their
    * recall row so they can never desynchronize). */
  /** Pass-bit corpus for the filtered (ACORN) walks: the predicate's
    * verdict rides WITH each (vec_id, embedding) row into its partition's
    * graph. ONE construction path for any embedding frame — the d=64
    * walks pass the base corpus, the A45c/A45d wide walks the derived
    * 2048-d frame (the repartition(8) count is part of the per-partition
    * graph contract, so it must not diverge between them). */
  private def passBitFrom(src: DataFrame, s: SparkSession, dir: String,
                          pred: org.apache.spark.sql.Column, exclId: Long): DataFrame =
    src.filter(col("vec_id") =!= exclId).select("vec_id", "embedding")
      .join(docs(s, dir).filter(pred).select(col("doc_id"), lit(true).as("pass")),
        col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"), col("embedding"),
        coalesce(col("pass"), lit(false)).as("pass"))
      .repartition(8, col("vec_id"))

  private def withPassBit(s: SparkSession, dir: String,
                          pred: org.apache.spark.sql.Column, exclId: Long): DataFrame =
    passBitFrom(emb(s, dir), s, dir, pred, exclId)

  private def widePassBit(s: SparkSession, dir: String,
                          pred: org.apache.spark.sql.Column, exclId: Long): DataFrame =
    passBitFrom(wideEmb(emb(s, dir)), s, dir, pred, exclId)

  /** The wide frame re-joined with its cluster column — the Spark twin of
    * the oracle-side `wideLabeledCtes` `wl` CTE: every IVF-family width
    * gate (probe/centroid arithmetic at d=2048) reads
    * (vec_id, 2048-slot embedding, label). The cluster ASSIGNMENT is data
    * (the corpus's label column), not derived from the wide vectors, so
    * the join is a narrow broadcast-free id join against the base scan. */
  private def wideLabeled(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    wideEmb(e).join(e.select("vec_id", "label"), "vec_id")
      .select("vec_id", "embedding", "label")
  }

  /** The r13 vacuous-gate rule as ONE helper (r14 review: the guard was
    * hand-inlined into a single entry while its twins stayed unguarded):
    * a qid-parameterized entry whose query frame comes back empty would
    * silently empty BOTH the entry and its oracle, and the hash gate
    * would pass while checking nothing. Refuse loudly instead. Returns
    * the frame so call sites stay expression-shaped. */
  /** The collected-query-file form of the same rule (r15 review: the
    * batch drivers hand-rolled this message three times). `expected` pins
    * the FULL query-file size (ADVICE r15: a nonEmpty-only guard let a
    * partially absent query file — 5 of 8 qids — silently shrink the gate
    * on both entry and oracle sides; the single-qid requireQueryPresent
    * convention refuses exactly this). */
  private def requireQueriesPresent[T](qs: Seq[T], expected: Int,
                                       who: String): Seq[T] = {
    require(qs.length == expected,
      s"$who: query file holds ${qs.length} of $expected expected queries " +
        "— a shrunken set would gate fewer rows on both entry and oracle " +
        "sides (empty would pass vacuously); regenerate the corpus or fix " +
        "the qid list")
    qs
  }

  private def requireQueryPresent(q: DataFrame, who: String): DataFrame = {
    require(q.limit(1).count() == 1,
      s"$who: query vector absent from the corpus — the gate would pass " +
        "vacuously on two empty frames")
    q
  }

  /** The README §3 evaluation-matrix body shared by the d=64 (A35h) and
    * d=2048 (A48) gates (r14 review: the two entries duplicated ~55
    * lines — the drift hazard pqServeDuck closes on the oracle side):
    * selectivity class 1/2/3 × strategy {beam, acorn, post} at the
    * reference's REAL constants (ef=200, largeK=200, metaSearch=100 —
    * acorn.py:150–162) against the given persisted index, 8 queries per
    * class, recall@10 hits SUMMED per (class, strategy) so one unlucky
    * query cannot flip the gate, emitted as least(n_hit, floor) so the
    * oracle's literal-floor assertion goes red exactly when measured
    * recall drops below its knee. `frame` is the embedding frame the
    * index was built over (base or derived-wide) — ground truths,
    * queries, and walks all read it. */
  private def recallBeamMatrix(s: SparkSession, dir: String, frame: DataFrame,
                               path: String,
                               floors: Map[(String, String), Long]): DataFrame = {
    val classes = Seq(
      ("c1", MetaPredicate("source" -> ("exact", "src1")),
        Seq(3L, 7L, 13L, 17L, 23L, 29L, 31L, 37L)),
      ("c2", MetaPredicate("lang" -> ("exact", "zh")),
        Seq(41L, 43L, 47L, 53L, 59L, 61L, 67L, 71L)),
      ("c3", MetaPredicate("n_chars" -> ("leq", 300)),
        Seq(73L, 79L, 83L, 89L, 97L, 101L, 103L, 107L)))
      .map { case (cls, pred, qids) =>
        (cls, docs(s, dir).filter(pred).select(col("doc_id").as("vec_id")), qids)
      }
    recallCells(s, frame, path, classes, floors,
      Seq("beam", "acorn", "post"), "recall_beam_matrix")
  }

  /** The per-(class, strategy) recall-floor cell body the evaluation
    * matrices share (r17: recallBeamMatrix hardcoded its classes as
    * docs-predicate pass sets, so the PIPELINE matrix — pass sets from
    * the PARSED listing attributes, A50d — would have duplicated ~50
    * lines): each class brings its own `passing` relation and query-id
    * file; each requested strategy contributes one
    * (cls, strategy, least(n_hit, floor)) row at the reference's real
    * constants (ef=200, largeK=200, metaSearch=100 — acorn.py:150–162).
    * Ground truths are lazy so a matrix that skips `beam` never pays the
    * unfiltered exact pass; `acorn` and `post` share one filtered
    * ground truth per class. Queries stay IN the corpus — rank 1 is the
    * self-hit on both sides, the persisted-serving convention — and the
    * collected query file is exact-count guarded (query vectors are
    * driver-side model state, the clustered_probe contract). */
  private def recallCells(s: SparkSession, frame: DataFrame, path: String,
                          classes: Seq[(String, DataFrame, Seq[Long])],
                          floors: Map[(String, String), Long],
                          strategies: Seq[String], who: String): DataFrame = {
    // classes are independent measurement cells: build them CONCURRENTLY
    // (guide §2.6) — each class's construction blocks on a query-file
    // collect plus up to two eager ground-truth localCheckpoints, and the
    // sequential form left the executors idle between those small jobs.
    // The union order below is the input order, so results are identical.
    val rows = graft.Par.ordered(classes) { case (cls, passing, qids) =>
      val qs = requireQueriesPresent(
        frame.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1),
        qids.length, s"$who class $cls")
      val qDf = frame.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      lazy val exactU = Knn.batchKnn(frame.select("vec_id", "embedding"), qDf, 10,
          Knn.L2, excludeSelf = false)
        .select("q_id", "vec_id").localCheckpoint(true)
      lazy val exactF = Knn.batchKnn(
          frame.select("vec_id", "embedding").join(passing, "vec_id"),
          qDf, 10, Knn.L2, excludeSelf = false)
        .select("q_id", "vec_id").localCheckpoint(true)
      strategies.map {
        case "beam" =>
          Hnsw.searchPersistedBatch(s, path, qs, 10, ef = 200)
            .select("q_id", "vec_id")
            .join(exactU, Seq("q_id", "vec_id"))
            .agg(count(lit(1)).as("n_hit"))
            .select(lit(cls).as("cls"), lit("beam").as("strategy"),
              least(col("n_hit"), lit(floors((cls, "beam")))).as("n_hit_floor"))
        case "acorn" =>
          Hnsw.searchFilteredPersistedBatch(s, path, passing,
              numParts = 8, qs, 10, metaSearch = 100, ef = 200, largeK = 200)
            .select("q_id", "vec_id")
            .join(exactF, Seq("q_id", "vec_id"))
            .agg(count(lit(1)).as("n_hit"))
            .select(lit(cls).as("cls"), lit("acorn").as("strategy"),
              least(col("n_hit"), lit(floors((cls, "acorn")))).as("n_hit_floor"))
        // post-filter baseline (post-filter.py): unfiltered top-largeK
        // beam, predicate applied afterwards, best 10 survivors per query
        case "post" =>
          Hnsw.searchPersistedBatch(s, path, qs, 200, ef = 200)
            .join(passing, Seq("vec_id"))
            .groupBy("q_id")
            .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), 10,
              asc = true).as("hits"))
            .select(col("q_id"), explode(col("hits")).as("hit"))
            .select(col("q_id"), col("hit.id").as("vec_id"))
            .join(exactF, Seq("q_id", "vec_id"))
            .agg(count(lit(1)).as("n_hit"))
            .select(lit(cls).as("cls"), lit("post").as("strategy"),
              least(col("n_hit"), lit(floors((cls, "post")))).as("n_hit_floor"))
        case other =>
          throw new IllegalArgumentException(
            s"$who: unknown recall-matrix strategy '$other'")
      }
    }
    rows.flatten.reduce(_ union _)
  }

  /** A48 floor matrix — ONE copy shared by the entry and Wide2048Spec
    * (ADVICE r14: the literals were triplicated; the oracle VALUES stays
    * an independent replica by design — updating a floor means touching
    * this Map AND the recall_hnsw_beam_2048 oracle). Floors sit 4–7 hits
    * under the tri-scale min (sf0.001/0.01/0.1 measurements in SURVEY
    * §8q): beam 80/80/80 all classes; acorn c1 80/80/53, c2 80/80/64,
    * c3 80/80/62; post c1 73/77/74, c2 80/80/80, c3 80/80/80 — the
    * metaSearch=100 budget knee (it bites at sf0.1's 250-row partitions,
    * where the budget is finally smaller than the partition) and the
    * post-filter collapse on the selective class both reproduce at the
    * reference width. */
  private[graft] val RecallBeam2048Floors: Map[(String, String), Long] = Map(
    ("c1", "beam") -> 76L, ("c1", "acorn") -> 48L, ("c1", "post") -> 68L,
    ("c2", "beam") -> 76L, ("c2", "acorn") -> 58L, ("c2", "post") -> 76L,
    ("c3", "beam") -> 76L, ("c3", "acorn") -> 56L, ("c3", "post") -> 76L)

  /** A51 budget grid: (metaSearch budget, one-hop floor, two-hop floor,
    * gain floor) — floors sit under the tri-scale min (sf0.001/0.01/0.1
    * measurements in SURVEY §8r) with ≥2-hit margin where the min allows;
    * gain floors pin two-hop ≥ one-hop (0 = "never loses", ≥1 = a
    * measured strict win). ONE copy shared by the entry and HnswSpec;
    * the oracle VALUES stays an independent replica by design. */
  // measured (sf0.001/0.01/0.1, one ≡ two unless noted): b4 1/1/1,
  // b8 1/1/1, b16 2/2/3, b32 6/5/3 (two-hop 6/6/3 — the one strict win,
  // sf0.01), b64 9/10/5. Gain tri-scale min is 0 at every budget, so the
  // gain floors pin the NEVER-LOSES half of the spec's claim (the strict
  // win stays spec-level at its fixed corpus — a tri-scale floor above 0
  // would be dishonest).
  private[graft] val TwoHopBudgets: Seq[(Int, Long, Long, Long)] = Seq(
    (4, 0L, 0L, 0L),
    (8, 0L, 0L, 0L),
    (16, 1L, 1L, 0L),
    (32, 2L, 2L, 0L),
    (64, 4L, 4L, 0L))

  /** A51b budget grid at d=2048 — same (budget, one-hop floor, two-hop
    * floor, gain floor) semantics as [[TwoHopBudgets]], re-measured
    * tri-scale AT the wide configuration (SURVEY §8s — the r15 lesson:
    * the two-hop gain is configuration-specific, so the width claim
    * needs its own measured grid). ONE copy shared by the entry and
    * Wide2048Spec; the oracle VALUES stays an independent replica. */
  // measured (sf0.001/0.01/0.1, one ≡ two unless noted): b4 0/1/1,
  // b8 0/1/1, b16 2/2/3, b32 6/5/3 (two-hop 6/6/3 — the one strict win,
  // sf0.01 b32, the SAME cell that won at d=64), b64 9/9/5. Gain
  // tri-scale min is 0 at every budget, so the gain floors pin the
  // never-loses half (the TwoHopBudgets convention). Floors = tri-scale
  // min − 1 where the min allows.
  private[graft] val TwoHopBudgets2048: Seq[(Int, Long, Long, Long)] = Seq(
    (4, 0L, 0L, 0L),
    (8, 0L, 0L, 0L),
    (16, 1L, 1L, 0L),
    (32, 2L, 2L, 0L),
    (64, 4L, 4L, 0L))

  /** The A33/A33b hot-split body shared by both widths over any
    * (vec_id, embedding, label) frame: 3 hottest clusters by count, the
    * lowest/highest member ids as the two sub-centroid seeds, every
    * member re-assigned to its nearer seed (scaled L2, ties to lo). */
  private def ivfSplitHot(src: DataFrame): DataFrame = {
    val hot = src.groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label")).limit(3).select("label")
    val seedIds = src.join(broadcast(hot), "label")
      .groupBy("label").agg(min("vec_id").as("lo_id"), max("vec_id").as("hi_id"))
    val vecs = src.select(col("vec_id"), col("embedding"))
    val seeds = seedIds
      .join(vecs.toDF("lo_id", "lo_vec"), "lo_id")
      .join(vecs.toDF("hi_id", "hi_vec"), "hi_id")
    src.join(broadcast(seeds), "label")
      .withColumn("d_lo", scaled(vectors.l2(col("embedding"), col("lo_vec")), Knn.ScoreDigits))
      .withColumn("d_hi", scaled(vectors.l2(col("embedding"), col("hi_vec")), Knn.ScoreDigits))
      .selectExpr("CAST(label AS BIGINT) AS label", "vec_id",
        "CAST(CASE WHEN d_lo <= d_hi THEN 0 ELSE 1 END AS BIGINT) AS sub")
      .groupBy("label", "sub")
      .agg(count(lit(1)).as("n"), min("vec_id").as("min_member"))
  }

  /** The A30b/A30c drift-rebuild body shared by both widths over any
    * (vec_id, embedding, label) frame: base centroids, one narrow
    * assignment projection for the arrivals, two label-keyed dispersion
    * aggregates, the integer threshold verdict, and ONE conditional
    * re-centering pass over only the verdict-rebuilt clusters' members
    * (served_mean reads fresh centroids exactly where rebuild=1). */
  private def ivfDriftRebuild(src: DataFrame): DataFrame = {
    val base = src.filter(col("vec_id") < IvfAppendSplit)
    val cent = Ivf.centroids(base)
    val centL = cent.select(col("label").cast("long").as("label"), col("cent"))
    val arrA = Ivf.assignToNearest(src.filter(col("vec_id") >= IvfAppendSplit), cent)
      .select(col("vec_id"), col("label").cast("long").as("label"), col("d"))
    val baseD = base
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding"))
      .join(broadcast(centL), "label")
      .select(col("vec_id"), col("label"),
        scaled(vectors.l2(col("embedding"), col("cent")), Knn.ScoreDigits).as("d"))
    val sb = baseD.groupBy("label")
      .agg(count(lit(1)).as("n_base"), sum("d").as("sd_base"))
    val sn = arrA.groupBy("label")
      .agg(count(lit(1)).as("n_new"), sum("d").as("sd_new"))
    val verd = sb.join(sn, Seq("label"), "left")
      .selectExpr("label", "n_base", "coalesce(n_new, 0L) AS n_new",
        "sd_base div n_base AS mean_base",
        "CASE WHEN coalesce(n_new, 0L) = 0 THEN 0L ELSE sd_new div n_new END AS mean_new")
      .selectExpr("label", "n_base", "n_new", "mean_base", "mean_new",
        "CAST(mean_new * 10 > mean_base * 12 OR n_new * 5 >= n_base + n_new AS BIGINT) AS rebuild")
    val members = base
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding"))
      .union(arrA.select("vec_id", "label")
        .join(src.select("vec_id", "embedding"), "vec_id")
        .select(col("vec_id"), col("label"), col("embedding")))
    // Re-center ONLY the rebuilt clusters' members (r12 verdict note):
    // the fresh frame's non-rebuilt rows were never read by the CASE
    // dispatch below, so restricting the aggregate to verdict-rebuilt
    // labels skips the pass entirely on drift-free days — output hash
    // unchanged, the "one conditional re-centering pass" claim literal.
    // The fresh join becomes LEFT (fcent null ⇔ rebuild=0, never read).
    val fresh = Ivf.centroids(members
        .join(broadcast(verd.filter(col("rebuild") === 1).select("label")), "label")
        .select("vec_id", "label", "embedding"))
      .select(col("label"), col("cent").as("fcent"))
    val served = members
      .join(broadcast(verd.select("label", "rebuild")), "label")
      .join(broadcast(centL.select(col("label"), col("cent").as("scent"))), "label")
      .join(broadcast(fresh), Seq("label"), "left")
      .withColumn("dsv", scaled(vectors.l2(col("embedding"),
        when(col("rebuild") === 1, col("fcent")).otherwise(col("scent"))), Knn.ScoreDigits))
      .groupBy("label")
      .agg(expr("sum(dsv) div count(*)").as("served_mean"))
    verd.join(served, "label")
      .select("label", "n_base", "n_new", "mean_base", "mean_new", "rebuild", "served_mean")
  }

  /** The A51/A51b curve body shared by both widths: pass-bit corpus from
    * the given embedding frame, exact prefilter ground truth over the
    * same frame, ONE sweep pass (each partition's graph builds once and
    * serves every (budget, flag) cell — r15 review: the per-call form
    * rebuilt the graphs 10×), counts left-joined onto the literal grid
    * (a zero-hit cell must still emit its row), least(n_hit, floor) mode
    * rows plus per-budget least(two − one, gain_floor) `gain` rows. */
  private def twoHopRecallCurve(s: SparkSession, dir: String, src: DataFrame,
                                budgets: Seq[(Int, Long, Long, Long)],
                                who: String): DataFrame = {
    import s.implicits._
    val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
    val qv = requireQueryPresent(src.filter(col("vec_id") === 17), who)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val corpus = passBitFrom(src, s, dir, pred, 17).localCheckpoint(true)
    val exact = Knn.prefilterKnn(
        src.filter(col("vec_id") =!= 17).select("vec_id", "embedding"),
        docs(s, dir), pred,
        src.filter(col("vec_id") === 17).select(col("embedding").as("q_vec")),
        10, Knn.L2)
      .select("vec_id").localCheckpoint(true)
    val sweep = Hnsw.searchFilteredPerPartitionSweep(corpus, qv, 10,
      budgets.flatMap { case (b, _, _, _) => Seq((b, false), (b, true)) })
    val hc = sweep.select("budget", "two_hop", "vec_id")
      .join(exact, Seq("vec_id"))
      .groupBy("budget", "two_hop").agg(count(lit(1)).as("hits"))
    val grid = budgets.flatMap { case (b, oneF, twoF, _) =>
        Seq((b.toLong, false, oneF), (b.toLong, true, twoF)) }
      .toDF("budget", "two_hop", "floor")
    val counts = grid.join(hc, Seq("budget", "two_hop"), "left")
      .select(col("budget"), col("two_hop"),
        coalesce(col("hits"), lit(0L)).as("n_hit"), col("floor"))
      .localCheckpoint(true)
    val modeRows = counts.select(col("budget"),
      when(col("two_hop"), lit("two")).otherwise(lit("one")).as("mode"),
      least(col("n_hit"), col("floor")).as("n_hit_floor"))
    val gainFloors = budgets.map { case (b, _, _, gF) => (b.toLong, gF) }
      .toDF("budget", "gain_floor")
    val gainRows = counts.filter(col("two_hop"))
      .select(col("budget"), col("n_hit").as("n2"))
      .join(counts.filter(!col("two_hop"))
        .select(col("budget"), col("n_hit").as("n1")), "budget")
      .join(gainFloors, "budget")
      .select(col("budget"), lit("gain").as("mode"),
        least(col("n2") - col("n1"), col("gain_floor")).as("n_hit_floor"))
    modeRows.union(gainRows)
  }

  /** A50b floor per class — tri-scale min − margin (SURVEY §8r: measured
    * c1 80/80/53, c2 80/80/64, c3 80/80/61 — the metaSearch=100 budget
    * knee bites at sf0.1's 250-row partitions, the A48 pattern through
    * the PARSED-attr pass sets); shared by the entry and Wide2048Spec,
    * oracle VALUES independent. */
  private[graft] val PipelineRecallFloors: Map[String, Long] = Map(
    "c1" -> 48L, "c2" -> 58L, "c3" -> 55L)

  /** The pipeline evaluation's per-class query files — ONE copy shared by
    * acorn_pipeline_recall (A50b) and the A50d strategy matrix so the
    * acorn cells of both entries stay the SAME measurement (and the A50b
    * floors stay valid for both). */
  private[graft] val PipelineRecallQids: Seq[(String, Seq[Long])] = Seq(
    "c1" -> Seq(3L, 7L, 13L, 17L, 23L, 29L, 31L, 37L),
    "c2" -> Seq(41L, 43L, 47L, 53L, 59L, 61L, 67L, 71L),
    "c3" -> Seq(73L, 79L, 83L, 89L, 97L, 101L, 103L, 107L))

  /** A50d floors — the README §3 table THROUGH the parsed pipeline:
    * acorn cells reuse the A50b measurement (same index, pass sets,
    * queries, constants — [[PipelineRecallFloors]], one copy); post
    * cells measured tri-scale over the parsed-attr pass sets (§8t:
    * c1 73/77/74, c2 80/80/80, c3 80/80/80 — the post-filter dip bites
    * only on the selective class-1 brand predicate, and its measured
    * values COINCIDE with the A48 post row's c1 because the parsed
    * brand attribute equals `source` wherever it is present — the
    * parse-composition consistency the matrix is meant to pin). Floors
    * sit under the tri-scale min with the A48 margins (c1 68, c2/c3 76
    * — deliberately the same constants as RecallBeam2048Floors' post
    * row); the oracle VALUES stays an independent replica by design. */
  private[graft] val PipelineMatrixFloors: Map[(String, String), Long] = Map(
    ("c1", "acorn") -> PipelineRecallFloors("c1"),
    ("c2", "acorn") -> PipelineRecallFloors("c2"),
    ("c3", "acorn") -> PipelineRecallFloors("c3"),
    ("c1", "post") -> 68L,
    ("c2", "post") -> 76L,
    ("c3", "post") -> 76L)

  /** The A15b ABO-shaped JSONL synthesis (nested value-structs, optional
    * brand, optional other_image_id), deterministic from `documents` —
    * ONE construction shared by listings_parse and the A50 end-to-end
    * pipeline so their parse inputs can never desynchronize.
    * The synthesis constants (doc_id % 5 brand gate, % 25 model_year,
    * the coalesce defaults) live in THREE places by design — here, the
    * acorn_pipeline_e2e oracle's SQL literals, and Wide2048Spec's
    * plain-Scala reconstruction (oracle independence) — a change that
    * misses one replica flips the gate red without a code bug, so edit
    * all three in lockstep. */
  private def listingsJsonl(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(concat(
      lit("{\"item_id\":\"item_"), col("doc_id"),
      lit("\",\"main_image_id\":\"img_"), col("doc_id"), lit("_0\""),
      when(col("doc_id") % 3 =!= 0,
        concat(lit(",\"other_image_id\":[\"img_"), col("doc_id"), lit("_1\"]")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 =!= 0,
        concat(lit(",\"brand\":[{\"value\":\""),
          coalesce(col("source"), lit("unknown")), lit("\"}]")))
        .otherwise(lit("")),
      lit(",\"color\":[{\"value\":\""), coalesce(col("lang"), lit("und")), lit("\"}]"),
      lit(",\"model_year\":[{\"value\":"), lit(2000) + col("doc_id") % 25,
      lit("}],\"item_weight\":[{\"normalized_value\":{\"unit\":\"g\",\"value\":"),
      coalesce(col("n_chars"), lit(0L)),
      lit("}}],\"country\":\"C"), col("doc_id") % 7, lit("\"}")
    ).as("value"))

  /** The A50 parse→attr stage shared by the capstone and its recall row:
    * JSONL → typed parse → image-id explode → per-listing attr frame
    * keyed back to the embedding id. Parse runs ONCE per entry (the
    * frame is materialized): three class predicates read it, and without
    * materialization each passing-set filter would re-run the whole
    * JSONL parse — at 100 TB that is 3 corpus parses for 1 needed. */
  private def parsedListingAttrs(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.materialize(
      graft.sources.Listings.imageMetadata(
          graft.sources.Listings.parseListings(listingsJsonl(s, dir)))
        .filter(col("image_id").endsWith("_0"))
        .select(regexp_extract(col("image_id"), "^img_(\\d+)_0$", 1)
            .cast("long").as("vec_id"),
          col("brand"), col("color"), col("model_year")))

  /** The notebook's three query_metadata classes over the PARSED
    * attributes — one copy shared by acorn_pipeline_e2e and its recall
    * row so their pass sets can never desynchronize. */
  private def pipelineClassPred(cls: String): org.apache.spark.sql.Column =
    cls match {
      case "c1" => col("brand").isNotNull && col("brand") === "src1"
      case "c2" => col("color").isNotNull && col("color") === "zh"
      case "c3" => col("model_year").isNotNull && col("model_year") <= 2010
    }

  /** A14h: the clustered-layout export at a FIXED path (the A52
    * convention — the DuckDB oracle read_parquets the layout itself, so
    * the path must be static in the oracle SQL and must outlive this
    * JVM, ruling out TmpDirs). Rebuilt whenever the (JVM, sfDir) pair
    * changes so a scale switch never serves a stale corpus' layout. */
  private[queries] val ClusteredConsumerPath =
    "/root/repo/target/ivf_consumer/layout"
  private var clusteredConsumerBuiltFor: Option[String] = None
  private def ensureClusteredConsumerExport(s: SparkSession, dir: String): String =
    synchronized {
      if (!clusteredConsumerBuiltFor.contains(dir)) {
        Ivf.writeClustered(emb(s, dir), ClusteredConsumerPath)
        clusteredConsumerBuiltFor = Some(dir)
      }
      ClusteredConsumerPath
    }

  // base-half index for the append entry (first IvfAppendSplit ids only)
  private val hnswBaseFor = scala.collection.mutable.Map.empty[String, String]
  private[queries] def ensureHnswBase(s: SparkSession, dir: String): String = synchronized {
    hnswBaseFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("hnsw_base_" + dirKey(dir))
      Hnsw.buildAndWrite(
        emb(s, dir).filter(col("vec_id") < IvfAppendSplit).select("vec_id", "embedding"),
        path, dims = Dims, numParts = 8)
      path
    })
  }

  // base-half WIDE index for the streaming wide append entry (C58f) —
  // the ensureHnswBase construction over the derived 2048-d frame
  private val hnswWideBaseFor = scala.collection.mutable.Map.empty[String, String]
  private[queries] def ensureHnswWideBase(s: SparkSession, dir: String): String = synchronized {
    hnswWideBaseFor.getOrElseUpdate(dir, {
      val path = graft.TmpDirs.path("hnsw_wide_base_" + dirKey(dir))
      Hnsw.buildAndWrite(
        wideEmb(emb(s, dir)).filter(col("vec_id") < IvfAppendSplit)
          .select("vec_id", "embedding"),
        path, dims = WideDims, numParts = 8)
      path
    })
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A14: IVF index build — per-cluster centroids, one shuffle on (label,dim)
    "ivf_build" -> ((s, dir) =>
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(avg(col("v").cast("double")).as("cv"), count(lit(1)).as("n"))
        .select(col("label"), col("dim").cast("long").as("dim"),
          scaled(col("cv"), 4).as("cvs"), col("n"))),

    // A14c: the trained-index composition, now ORACLE-CHECKED (was
    // rows-only through r2): INTEGER-EXACT Lloyd's (KMeans.fitInt —
    // components quantized to floor(x·10⁴+0.5), NearestCentroidLong
    // kernel E-step, integer floor-mean M-step) is bit-identical in any
    // engine, so the whole composition — train k=10 / 3 iters → assign →
    // probe 3 by integer squared L2 → pruned exact integer search —
    // replays in DuckDB as unrolled per-iteration CTEs. The probe ranks
    // clusters driver-side over the k·d model state (same as
    // AnnIndexRegistry.probedClusters); members of the probed clusters
    // score by exact integer squared L2, ties to the lower id. L2
    // end-to-end: the train, probe and search metrics must agree
    // (an L2 index probed by cosine silently costs recall).
    "knn_ivf_trained" -> ((s, dir) => {
      val corpus = emb(s, dir).select("vec_id", "embedding")
        .filter(col("vec_id") =!= 7)
      val (cent, qemb) = KMeans.fitInt(corpus, k = 10, iters = 3)
      val qv = graft.operators.Pq.quantized(emb(s, dir).filter(col("vec_id") === 7))
        .select("q").head.getSeq[Long](0).toArray
      def sqTo(c: Array[Long]): Long = {
        var acc = 0L; var i = 0
        while (i < c.length) { val d = c(i) - qv(i); acc += d * d; i += 1 }
        acc
      }
      val probed = cent.map { case (cl, v) => (cl, sqTo(v)) }
        .sortBy { case (cl, d) => (d, cl) }.take(3).map(_._1)
      val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
      qemb.select(col("vec_id"),
          graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"), col("q"))
        .filter(col("cluster").isin(probed: _*))
        .selectExpr("vec_id", graft.functions.sqDistLongSql("q", qLit) + " AS score")
        .orderBy(col("score").asc, col("vec_id").asc).limit(10)
    }),

    // A14d: IVF with an HNSW COARSE QUANTIZER — the FAISS IVF_HNSW shape
    // (faiss IndexHNSW as the coarse quantizer of an IndexIVF; Douze et
    // al., The Faiss library, 2024 §4.3). At 100 TB the centroid table
    // itself is search-scale (√n ≈ 10⁶ centroids of a 10¹² corpus):
    // ranking ALL centroids per query — what A14c's driver-side probe and
    // C9's nearestLong kernel both do — becomes the bottleneck, so probe
    // selection runs as a graph walk over per-partition HNSW graphs built
    // on the CENTROID frame (O(log C) per query vs O(C)). Here ef=0 is
    // the saturating sentinel (exact at any sf, the A35 contract), and
    // the oracle replays the probe ranking under the HNSW score contract
    // — floor(sqrt(d²)·10⁴+0.5), ties to the lower label — which can
    // collapse near-tied centroids a raw-d² ranking would split, so the
    // oracle ranks by the SAME scaled score, not raw d². Quantized
    // integer coords (≤~10⁵) are exact in Float and their Double
    // distance sums exact (< 2⁵³), so the graph's float math IS the
    // integer ranking. Members of the probed clusters then score by
    // exact integer squared L2 (the A14c tail).
    "knn_ivf_hnsw" -> ((s, dir) => {
      import s.implicits._
      val corpus = emb(s, dir).select("vec_id", "embedding")
        .filter(col("vec_id") =!= 21)
      val (cent, qemb) = KMeans.fitInt(corpus, k = 10, iters = 3)
      val qv = graft.operators.Pq.quantized(requireQueryPresent(
          emb(s, dir).filter(col("vec_id") === 21), "knn_ivf_hnsw"))
        .select("q").head.getSeq[Long](0).toArray
      // the k·d model state as a SEARCHABLE frame — at 10⁶ centroids this
      // is a real table and the per-partition graphs are the index
      val centDf = cent.map { case (cl, v) => (cl, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding").repartition(1)
      val probed = Hnsw.searchPerPartition(centDf, qv.map(_.toFloat), k = 3, ef = 0)
        .select("vec_id").collect().map(_.getLong(0))  // ≤ nProbe rows
      val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
      qemb.select(col("vec_id"),
          graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"), col("q"))
        .filter(col("cluster").isin(probed: _*))
        .selectExpr("vec_id", graft.functions.sqDistLongSql("q", qLit) + " AS score")
        .orderBy(col("score").asc, col("vec_id").asc).limit(10)
    }),

    // A14f: the IVF×HNSW coarse quantizer BATCHED (r14 verdict "also
    // open" — the one serving family composition without a batch form):
    // the reference's query-file loop against the graph-searched coarse
    // quantizer. The index trains ONCE over the FULL corpus (queries
    // arrive later — the persisted-serving convention, self-hits
    // included, unlike A14d's single-query exclude-then-train), the
    // centroid frame's per-partition graphs answer the WHOLE broadcast
    // query file in one pass (searchPerPartitionBatch — at 10⁶ centroids
    // a per-query graph rebuild would dominate the serve), and ONE
    // pruned scan joins the (q_id, cluster) probe relation against the
    // assigned members with per-query map-side k-heaps. Saturating beam
    // ⇒ the probe ranking is exact and the oracle replays Lloyd's, the
    // per-query probe windows, and the pruned integer scan.
    "knn_ivf_hnsw_batch" -> ((s, dir) => {
      import s.implicits._
      val e = emb(s, dir)
      val (cent, qemb) = KMeans.fitInt(e.select("vec_id", "embedding"),
        k = 10, iters = 3)
      val qids = (0L until 8L)
      val qFrame = graft.operators.Pq.quantized(
          e.filter(col("vec_id").isin(qids: _*)))
        .select(col("vec_id").as("q_id"), col("q").as("qq"))
      val qvs = requireQueriesPresent(
        qFrame.collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).map(_.toFloat).toArray))
          .toSeq.sortBy(_._1),
        qids.length, "knn_ivf_hnsw_batch")
      val centDf = cent.map { case (cl, v) => (cl, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding").repartition(1)
      // ≤ |Q|·nProbe rows of model state — the A14d probed-label contract
      val probeRel = Hnsw.searchPerPartitionBatch(centDf, qvs, k = 3, ef = 0)
        .select(col("q_id"), col("vec_id").as("cluster"))
      qemb.select(col("vec_id"),
          graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"), col("q"))
        .join(broadcast(probeRel), "cluster")
        .join(broadcast(qFrame), "q_id")
        .withColumn("score", graft.functions.vectors.sqDistLong(col("q"), col("qq")))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), 10,
          asc = true).as("hits"))
        .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("q_id"), col("hit.id").as("vec_id"),
          (col("pos") + 1).cast("long").as("rank"), col("hit.score").as("score"))
    }),

    // A14e: IVF×HNSW at the REFERENCE width — the A14d composition (the
    // coarse quantizer ITSELF is graph-searched: at 10⁶ centroids the
    // probe step is its own ANN problem, faiss's IVF_HNSW/quantizer
    // pattern) with every distance at d=2048: integer Lloyd's over the
    // wide frame (NearestCentroidLong E-step, floor-mean M-step), the
    // k·d centroid table walked by the HNSW graph at the saturating beam
    // (exact ⇒ oracle-replayable), then pruned exact integer search over
    // the probed clusters' members. The kmeans/graph/scan arithmetic is
    // width-dependent end to end; the oracle unrolls the wide Lloyd
    // chain (lloydChain at dims=2048) and replays probe + scan.
    "knn_ivf_hnsw_2048" -> ((s, dir) => {
      import s.implicits._
      val w = wideEmb(emb(s, dir))
      val corpus = w.filter(col("vec_id") =!= 21).select("vec_id", "embedding")
      val (cent, qemb) = KMeans.fitInt(corpus, k = 10, iters = 3)
      val qv = graft.operators.Pq.quantized(requireQueryPresent(
          w.filter(col("vec_id") === 21), "knn_ivf_hnsw_2048"))
        .select("q").head.getSeq[Long](0).toArray
      // quantized components stay < 10⁵ ⇒ exactly representable as Float
      val centDf = cent.map { case (cl, v) => (cl, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding").repartition(1)
      val probed = Hnsw.searchPerPartition(centDf, qv.map(_.toFloat), k = 3, ef = 0)
        .select("vec_id").collect().map(_.getLong(0))
      val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
      qemb.select(col("vec_id"),
          graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"), col("q"))
        .filter(col("cluster").isin(probed: _*))
        .selectExpr("vec_id", graft.functions.sqDistLongSql("q", qLit) + " AS score")
        .orderBy(col("score").asc, col("vec_id").asc).limit(10)
    }),

    // A14g: the batched graph-searched coarse quantizer AT THE REFERENCE
    // WIDTH (r15 verdict next #2 — A14f × A14e: the reference's query-file
    // loop, acorn.py `__main__`, runs against the d=2048 index it builds
    // at :35–49, and the batched-probe arithmetic — per-partition centroid
    // walks + per-query probe windows — is width-dependent end to end).
    // The wide integer Lloyd's chain trains ONCE over the FULL derived
    // corpus (the A14f persisted-serving convention — queries are indexed,
    // self-hits included), the d=2048 centroid frame's per-partition
    // graphs answer the whole broadcast query file in one pass
    // (searchPerPartitionBatch at the saturating beam — exact ⇒ the probe
    // ranking is oracle-replayable), and ONE pruned scan joins the
    // (q_id, cluster) probe relation against the assigned members with
    // per-query map-side k-heaps — ≤ |Q|·k rows cross the shuffle. The
    // oracle unrolls the wide Lloyd chain (lloydChain at dims=2048),
    // replays the per-query probe windows under the HNSW score contract,
    // and re-runs the pruned integer scan.
    "knn_ivf_hnsw_batch_2048" -> ((s, dir) => {
      import s.implicits._
      val w = wideEmb(emb(s, dir))
      val (cent, qemb) = KMeans.fitInt(w.select("vec_id", "embedding"),
        k = 10, iters = 3)
      val qids = (0L until 8L)
      val qFrame = graft.operators.Pq.quantized(
          w.filter(col("vec_id").isin(qids: _*)))
        .select(col("vec_id").as("q_id"), col("q").as("qq"))
      val qvs = requireQueriesPresent(
        qFrame.collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).map(_.toFloat).toArray))
          .toSeq.sortBy(_._1),
        qids.length, "knn_ivf_hnsw_batch_2048")
      // quantized wide components stay < 7·10⁴ ⇒ exactly representable as
      // Float (the A14e contract); the k·2048 model state as a frame
      val centDf = cent.map { case (cl, v) => (cl, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding").repartition(1)
      // ≤ |Q|·nProbe rows of model state — the A14d probed-label contract
      val probeRel = Hnsw.searchPerPartitionBatch(centDf, qvs, k = 3, ef = 0)
        .select(col("q_id"), col("vec_id").as("cluster"))
      qemb.select(col("vec_id"),
          graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"), col("q"))
        .join(broadcast(probeRel), "cluster")
        .join(broadcast(qFrame), "q_id")
        .withColumn("score", graft.functions.vectors.sqDistLong(col("q"), col("qq")))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), 10,
          asc = true).as("hits"))
        .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
        .select(col("q_id"), col("hit.id").as("vec_id"),
          (col("pos") + 1).cast("long").as("rank"), col("hit.score").as("score"))
    }),

    // A10: ACORN-style hybrid search — probe 2 nearest clusters, metadata
    // predicate pushed into the pruned scan
    "hybrid_knn" -> ((s, dir) => {
      val q = emb(s, dir).filter(col("vec_id") === 5).select(col("embedding").as("q_vec"))
      Ivf.hybridKnn(
        emb(s, dir), docs(s, dir),
        MetaPredicate("n_chars" -> ("leq", 400)) && (col("doc_id") =!= 5),
        q, k = 5, nProbe = 2)
        .select("vec_id", "score")
    }),

    // A12b: the reference's per-query main loop as ONE batched plan —
    // per-query probes and per-query top-k both via TopKHits k-heaps
    "hybrid_knn_batch" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Ivf.hybridBatchKnn(e, docs(s, dir),
        MetaPredicate("n_chars" -> ("leq", 400)), qs, k = 5, nProbe = 2)
    }),

    // A11: attribute-specific index — the clustered index is built ONLY
    // over rows possessing the attribute (reference: model_year subset)
    "attr_specific_knn" -> ((s, dir) => {
      val sub = emb(s, dir)
        .join(docs(s, dir).filter(MetaPredicate("lang" -> ("exact", "zh"))),
          col("vec_id") === col("doc_id"))
        .select("vec_id", "embedding", "label")
      val q = emb(s, dir).filter(col("vec_id") === 7).select(col("embedding").as("q_vec"))
      Ivf.hybridKnn(sub, docs(s, dir), col("doc_id") =!= 7, q, k = 5, nProbe = 2)
        .select("vec_id", "score")
    }),

    // B6: LSH-bucketed ANN — deterministic hyperplanes, in-bucket search
    "ann_lsh" -> ((s, dir) => {
      val corpus = emb(s, dir).filter(col("vec_id") =!= 3).select("vec_id", "embedding")
      val q = requireQueryPresent(
        emb(s, dir).filter(col("vec_id") === 3).select(col("embedding").as("q_vec")),
        "ann_lsh")
      Lsh.annSearch(corpus, q, 5, NumPlanes, Dims).select("vec_id", "score")
    }),

    // A31: multi-probe LSH — probe the query's bucket AND every 1-flip
    // Hamming neighbor (Lv et al.): recovers the neighbors a single-bucket
    // probe loses across one hyperplane, without more hash tables. The
    // probe set is (numPlanes+1) buckets via an integer bit_count test.
    "ann_lsh_multiprobe" -> ((s, dir) => {
      val corpus = emb(s, dir).filter(col("vec_id") =!= 3).select("vec_id", "embedding")
      val q = requireQueryPresent(
        emb(s, dir).filter(col("vec_id") === 3).select(col("embedding").as("q_vec")),
        "ann_lsh_multiprobe")
      Lsh.multiProbeSearch(corpus, q, 5, NumPlanes, Dims, maxFlips = 1)
        .select("vec_id", "score")
    }),

    // A31b: multi-probe LSH at the REFERENCE width (r13 verdict next #5):
    // the hyperplane/recall trade is width-dependent — each plane test
    // pays a 2048-term dot product and the hash geometry changes with
    // dimensionality, so the d=64 gate never exercises the wide sign
    // arithmetic. Same deterministic integer plane weights (md5-derived,
    // exactly representable as Float) derived AT d=2048 over the A45
    // wide frame; the 1-flip Hamming ball still prunes the scan to
    // (numPlanes+1) of 2^numPlanes buckets. The oracle re-derives the
    // buckets from the identical plane constants embedded as literals.
    // Wide2048Spec pins the candidate-superset law at width.
    "ann_lsh_multiprobe_2048" -> ((s, dir) => {
      val w = wideEmb(emb(s, dir))
      val corpus = w.filter(col("vec_id") =!= 3).select("vec_id", "embedding")
      val q = requireQueryPresent(
        w.filter(col("vec_id") === 3).select(col("embedding").as("q_vec")),
        "ann_lsh_multiprobe_2048")
      Lsh.multiProbeSearch(corpus, q, 5, NumPlanes, WideDims, maxFlips = 1)
        .select("vec_id", "score")
    }),

    // A13: recall@10 of the probe-2 IVF search vs exact kNN, queries 0..4.
    // Both rankings use the TopKHits aggregate (map-side k-heaps) — no
    // full-shuffle window over the scored corpus on either path.
    "recall_eval" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = Knn.batchKnn(e.select("vec_id", "embedding"), qs, 10, Knn.Cosine)
      val cent = Ivf.centroids(e)
      val probes = cent.crossJoin(broadcast(qs))
        .withColumn("cscore", scaled(vectors.cosine(col("cent"), col("q_vec")), Knn.ScoreDigits))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("cscore"), col("label"), 2, asc = false).as("hits"))
        .select(col("q_id"), explode(col("hits.id")).as("label"))
      val pruned = e.select("vec_id", "embedding", "label").join(broadcast(probes), "label")
        .join(broadcast(qs), "q_id")
        .filter(col("vec_id") =!= col("q_id"))
      val approx = pruned
        .withColumn("score", scaled(vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), 10, asc = false).as("hits"))
        .select(col("q_id"), explode(col("hits.id")).as("vec_id"))
      val hits = approx.join(exact.select("q_id", "vec_id"), Seq("q_id", "vec_id"))
        .groupBy("q_id").agg(count(lit(1)).as("h"))
      qs.select("q_id").join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("h"), lit(0L)).as("n_hit"))
    }),

    // A34: embedding drift / domain-dispersion monitor — per metadata
    // group (source), the embedding centroid and the members' mean/max
    // SQUARED L2 to it: the dashboard a training pipeline watches to catch
    // a domain collapsing to near-duplicates or a crawler's embedding
    // distribution shifting between snapshots. INTEGER-EXACT end to end
    // (the r2 hash-red fix): components quantize to scaled integers BEFORE
    // averaging, the centroid is an element-wise integer floor-mean
    // (VecSumLong — order-independent, unlike float accumulation), and the
    // dispersion is the squared L2 in quantized units (no libm sqrt).
    // Shape: one VecSumLong centroid aggregate (groups×d values cross the
    // shuffle, never n×d rows), centroids broadcast back, one narrow
    // integer distance scan; the mean is an integer sum-div-count.
    "embedding_drift" -> ((s, dir) => {
      val ed = emb(s, dir).join(docs(s, dir), col("vec_id") === col("doc_id"))
        .select(col("source"),
          graft.functions.vectors.quantize(col("embedding")).as("q"))
      val cent = ed.groupBy("source")
        .agg(graft.functions.aggs.vecSumLong(col("q")).as("sv"), count(lit(1)).as("cnt"))
        // element-wise floor-mean; components can be negative, so floor
        // division is spelled via the pmod identity (div truncates)
        .select(col("source"),
          expr(graft.functions.floorMeanVecSql("sv", "cnt")).as("cent"))
      ed.join(broadcast(cent), "source")
        .withColumn("d", expr(graft.functions.sqDistLongSql("q", "cent")))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), expr("sum(d) div count(*)").as("mean_dist"),
          max("d").as("max_dist"))
    }),

    // B31: dominant embedding direction — integer-exact power iteration
    // (operators/Pca.scala has the full scale + overflow rationale): per
    // iteration ONE narrow projection + ONE VecSumLong aggregate (a
    // d-vector crosses the shuffle, never rows or a d² matrix), model-
    // state collects only. The spectral sibling of embedding_drift: drift
    // watches dispersion, this watches the AXIS the corpus varies along —
    // the monitor that catches a collapsing or rotating embedding space.
    // Oracle unrolls the 4 iterations as CTEs (all-BIGINT, pmod floor-div
    // everywhere ⇒ bit-identical loadings). This corpus's spectrum is
    // near-flat (λ2/λ1 ≈ 0.93), so full eigenvector convergence would
    // need ~40 rounds; 4 capture 85% of the top eigenvalue's variance
    // (measured knee: 67/76/81/85% at t = 1..4) — the monitoring contract
    // is variance capture, PcaSpec asserts it against a float reference.
    "embedding_pca" -> ((s, dir) => {
      import s.implicits._
      val v = graft.operators.Pca.topComponentInt(
        emb(s, dir).select("embedding"), iters = 4, dims = 64)
      v.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
        .toDF("dim", "loading")
    }),

    // A33: index maintenance — split the hottest clusters (the rebalance
    // sibling of A30's append): the top-3 most-populated clusters are
    // split in place, each member reassigned to the nearer of two
    // deterministic seed members (the cluster's min-id and max-id vectors
    // — a seeded stand-in for one k=2 Lloyd's step, the ivf_build
    // determinism trade). One size aggregate + a broadcast of 3×2 seed
    // vectors + one narrow argmin over ONLY the hot clusters' members. At
    // 100 TB this is the periodic rebalance that keeps probe fan-out
    // uniform while the append path (A30) keeps ingesting.
    "ivf_split_hot" -> ((s, dir) => ivfSplitHot(emb(s, dir))),

    // A33b: hot-cluster splitting at the REFERENCE WIDTH — the last
    // maintenance-family member gated only at d=64 (A30c/A30d closed the
    // other two this round): the seed distances and the two-way re-
    // assignment are width-dependent, so the wide geometry can split a
    // hot cluster DIFFERENTLY than the 64-d frame does. Same body via
    // the shared helper; the oracle replays hot selection, min/max seeds,
    // and the tie-to-lo assignment over the wide CTEs.
    "ivf_split_hot_2048" -> ((s, dir) => {
      val e = emb(s, dir)
      ivfSplitHot(wideEmb(e).join(e.select("vec_id", "label"), "vec_id"))
    }),

    // A32: recall of single-bucket vs 1-flip multi-probe LSH against the
    // exact top-10 — the hash-probing member of the recall family
    // (recall_eval = IVF probing, recall_pq = compression, probe sweep =
    // the IVF knob curve). Per query, the multi-probe candidate set is a
    // superset of the single-bucket set sharing one exact ground truth, so
    // n_hit_multi ≥ n_hit_single row-wise (spec-asserted) — the measured
    // form of "1-flip probing only recovers recall". Both hit counts reuse
    // the TopKHits k-heaps; the bucket tests are codegen'd integer
    // bit_count against a broadcast 5-row query table.
    "recall_multiprobe" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val exact = Knn.batchKnn(e.select("vec_id", "embedding"), qs, 10, Knn.Cosine)
      val bucketed = Lsh.withBucket(e.select("vec_id", "embedding"), NumPlanes, Dims)
      val qb = Lsh.withBucket(qs, NumPlanes, Dims, "q_vec", "q_bucket")
      def hitsOf(maxFlips: Int, out: String): DataFrame = {
        val approx = bucketed.crossJoin(broadcast(qb))
          .filter(expr(s"bit_count(bucket ^ q_bucket) <= $maxFlips") &&
            col("vec_id") =!= col("q_id"))
          .withColumn("score", scaled(vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
          .groupBy("q_id")
          .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), 10, asc = false).as("hits"))
          .select(col("q_id"), explode(col("hits.id")).as("vec_id"))
        approx.join(exact.select("q_id", "vec_id"), Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as(out))
      }
      qs.select("q_id")
        .join(hitsOf(0, "h0"), Seq("q_id"), "left")
        .join(hitsOf(1, "h1"), Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("h0"), lit(0L)).as("n_hit_single"),
          coalesce(col("h1"), lit(0L)).as("n_hit_multi"))
    }),

    // A30: incremental index APPEND (FAISS add() analogue, the vector
    // sibling of B24): arriving vectors (vec_id ≥ 400) are assigned to the
    // nearest centroid of the EXISTING index — no retrain; the k·d
    // centroid table compiles into the `NearestCentroid` codegen kernel,
    // so assignment is ONE NARROW PROJECTION (zero shuffle — the r2 form
    // crossJoined to n·k rows and shuffled them through an argmin
    // aggregate). Integer-scaled distance, label tie-break — same
    // determinism contract as every ranked oracle. At 100 TB this is the
    // ingest path: batch arrives, assigns, appends to its cluster's
    // partition; centroid drift is handled by periodic rebuild (A14c)
    "knn_ivf_append" -> ((s, dir) => {
      val e = emb(s, dir)
      val cent = Ivf.centroids(e.filter(col("vec_id") < IvfAppendSplit))
      Ivf.assignToNearest(e.filter(col("vec_id") >= IvfAppendSplit), cent)
        .select(col("vec_id"), col("label").cast("long").as("label"), col("d"))
    }),

    // A30d: the A30 ingest path at the REFERENCE WIDTH — the other half
    // of the r15 verdict's maintenance-at-width leftover (A30c gates the
    // rebuild DECISION; this gates the plain add_items assignment,
    // acorn.py:40–49, at the d=2048 the reference runs it). The
    // NearestCentroid kernel compiles the 10×2048 centroid table as
    // literal state, so assignment stays ONE narrow projection — width
    // grows the literal, not the plan.
    "knn_ivf_append_2048" -> ((s, dir) => {
      val e = emb(s, dir)
      val w = wideEmb(e).join(e.select("vec_id", "label"), "vec_id")
      val cent = Ivf.centroids(w.filter(col("vec_id") < IvfAppendSplit))
      Ivf.assignToNearest(w.filter(col("vec_id") >= IvfAppendSplit), cent)
        .select(col("vec_id"), col("label").cast("long").as("label"), col("d"))
    }),

    // A30b: DRIFT-TRIGGERED REBUILD (r11 verdict next #6): A30/A21f/A35d
    // all say "drift is handled by periodic rebuild" — this entry DECIDES
    // one, composing A34's dispersion monitor over the appended index.
    // Per stale cluster: base members' mean scaled-L2 to the stale
    // centroid vs the arriving members' (assigned by the A30 kernel);
    // verdict REBUILD when arrivals disperse >1.2× the base (integer
    // cross-multiplication — no division) OR make up ≥20% of the cluster.
    // The decision is CONSEQUENTIAL in the output: `served_mean` is every
    // member's mean distance to the centroid the verdict serves (fresh
    // = recomputed over base ∪ arrivals for rebuilt clusters, stale
    // otherwise) — the oracle replays threshold AND dispatch. Both arms
    // fire at the gate scales (6/10 rebuilt at sf0.001, 5/10 at sf0.01).
    // At 100 TB this is the maintenance planner's query: one narrow
    // assignment projection, two label-keyed aggregates, one conditional
    // re-centering pass over only the members' vectors.
    "ivf_drift_rebuild" -> ((s, dir) => ivfDriftRebuild(emb(s, dir))),

    // A30c: the drift-triggered rebuild AT THE REFERENCE WIDTH (r15
    // verdict next #6 — the maintenance family's kernels are
    // width-parametric, but the add-while-serving path the reference
    // actually runs, acorn.py:40–49 add_items, happens at the d=2048 it
    // builds; this gates the assign kernel, the dispersion monitor, and
    // the conditional re-centering over 2048-slot vectors). Same body as
    // A30b through the shared helper; the oracle re-derives the
    // assignment CTEs, drift stats, verdict, and dispatch over the wide
    // frame (centSql at dims=2048). Both dispatch arms fire at the gate
    // scales (measured in SURVEY §8s).
    "ivf_drift_rebuild_2048" -> ((s, dir) => {
      val e = emb(s, dir)
      // the derived-wide frame carries no cluster column — join the
      // seeded label back (the C66f convention)
      ivfDriftRebuild(wideEmb(e).join(e.select("vec_id", "label"), "vec_id"))
    }),

    // A28: the recall/cost KNOB curve (reference acorn.py trades nprobe/
    // max_visits against recall): recall@10 at nProbe ∈ {1,2,4,8} in ONE
    // entry. Centroids, probe RANKS (TopKHits is best-first with the
    // lower-id tie-break — posexplode position = probe rank), and the
    // exact ground truth are each computed once and reused across the
    // sweep; each sweep point only re-filters the rank table and re-runs
    // the pruned scan. Recall must be monotone in nProbe (asserted in
    // EngineSpec) — the curve a capacity planner reads before fixing
    // nProbe at 100 TB.
    "recall_probe_sweep" -> ((s, dir) => {
      val e = emb(s, dir)
      val qs = e.filter(col("vec_id") <= 4)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        .localCheckpoint(true)
      val exact = Knn.batchKnn(e.select("vec_id", "embedding"), qs, 10, Knn.Cosine)
        .select("q_id", "vec_id").localCheckpoint(true)
      val ranked = Ivf.centroids(e).crossJoin(broadcast(qs))
        .withColumn("cscore", scaled(vectors.cosine(col("cent"), col("q_vec")), Knn.ScoreDigits))
        .groupBy("q_id")
        .agg(graft.functions.aggs.topK(col("cscore"), col("label"), 8, asc = false).as("hits"))
        .select(col("q_id"), posexplode(col("hits.id")).as(Seq("pr0", "label")))
        .select(col("q_id"), (col("pr0") + 1).as("pr"), col("label"))
        .localCheckpoint(true)
      Seq(1, 2, 4, 8).map { np =>
        val probes = ranked.filter(col("pr") <= np).select("q_id", "label")
        val approx = e.select("vec_id", "embedding", "label")
          .join(broadcast(probes), "label")
          .join(broadcast(qs), "q_id")
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("score", scaled(vectors.cosine(col("embedding"), col("q_vec")), Knn.ScoreDigits))
          .groupBy("q_id")
          .agg(graft.functions.aggs.topK(col("score"), col("vec_id"), 10, asc = false).as("hits"))
          .select(col("q_id"), explode(col("hits.id")).as("vec_id"))
        val hits = approx.join(exact, Seq("q_id", "vec_id"))
          .groupBy("q_id").agg(count(lit(1)).as("h"))
        qs.select("q_id").join(hits, Seq("q_id"), "left")
          .select(lit(np.toLong).as("n_probe"), col("q_id"),
            coalesce(col("h"), lit(0L)).as("n_hit"))
      }.reduce(_ union _)
    }),

    // A13b: the reference's HEADLINE experiment (README §3 evaluation table):
    // recall of post-filter and hybrid search vs the exact PRE-FILTER ground
    // truth, under one predicate per selectivity class. The expected shape is
    // the reference's: post-filter recall collapses as the filter gets more
    // selective; hybrid holds up by pushing the predicate into the probe.
    "recall_filtered" -> ((s, dir) => {
      val all = emb(s, dir)
      val e = all.filter(col("vec_id") =!= 11)
      val q = all.filter(col("vec_id") === 11).select(col("embedding").as("q_vec"))
      val d = docs(s, dir)
      val classes = Seq(
        ("class1_selective",
          MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))),
        ("class2_mid", MetaPredicate("lang" -> ("exact", "zh"))),
        ("class3_broad", MetaPredicate("n_chars" -> ("leq", 400))))
      // the IVF index is class-independent: build its centroids ONCE (C
      // tiny rows, eagerly materialized) instead of once per class
      val cent = Ivf.centroids(e).localCheckpoint(true)
      classes.map { case (cls, pred) =>
        // ≤10-row ground truth, materialized once and reused by both
        // strategies' hit joins (localCheckpoint avoids re-running the
        // pre-filter scan per reference)
        val exact = Knn.prefilterKnn(e, d, pred, q, 10, Knn.Cosine).select("vec_id")
          .localCheckpoint(true)
        val strategies = Seq(
          "post" -> Knn.postfilterKnn(e, d, pred, q, 10, 50, Knn.Cosine).select("vec_id"),
          "hybrid" -> Ivf.searchProbed(cent, e, d, pred, q, 10, 2, Knn.Cosine,
            "vec_id", "doc_id", "embedding", "label").select("vec_id"))
        strategies.map { case (strat, approx) =>
          // single pass over approx: left-join the ground truth, count
          // returned rows and hits in one aggregate
          approx.join(exact.withColumn("_hit", lit(1)), Seq("vec_id"), "left")
            .agg(count(lit(1)).as("n_ret"), count(col("_hit")).as("n_hit"))
            .select(lit(cls).as("cls"), lit(strat).as("strategy"),
              col("n_ret"), col("n_hit"))
        }.reduce(_ union _)
      }.reduce(_ union _)
    }),

    // A10b: the reference's adaptive widening loop (acorn.py:162
    // `while visits <= meta_search`): double the probed cluster count until
    // >= k filter-passing survivors. lang='fr' leaves ~6 survivors per
    // cluster at sf0.01, so probe-1 genuinely fails and the loop widens.
    "hybrid_knn_adaptive" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") === 3).select(col("embedding").as("q_vec"))
      Ivf.adaptiveHybridKnn(e, docs(s, dir),
        MetaPredicate("lang" -> ("exact", "fr")) && (col("doc_id") =!= 3),
        q, k = 10)
        .select("vec_id", "score")
    }),

    // A14b: the 100 TB index LAYOUT, driver-verified end-to-end — write the
    // corpus partitioned by cluster id, probe the 2 nearest clusters, and
    // read back through partition pruning (the scan's PartitionFilters skip
    // the other C-2 directories before any IO; asserted in
    // ClusteredLayoutSpec over this very entry).
    "clustered_probe" -> ((s, dir) => {
      val e = emb(s, dir)
      val path = "/root/repo/target/clustered/" + new java.io.File(dir).getName
      Ivf.writeClustered(e, path)
      val q = e.filter(col("vec_id") === 4).select(col("embedding").as("q_vec"))
      // 2 probed labels are k·1 driver-side model state (same contract as
      // buildAndRegisterIndex), not a data collect
      val probed = Ivf.probe(Ivf.centroids(e), q, 2).collect().map(_.getInt(0)).toSeq
      val pruned = Ivf.readProbed(s, path, probed).filter(col("vec_id") =!= 4)
      Knn.topK(pruned.select("vec_id", "embedding"), q, 10, Knn.Cosine)
        .select("vec_id", "score")
    }),

    // A14h: the clustered layout's export contract proven FROM THE
    // CONSUMER SIDE (the A52 symmetry for the second persisted-artifact
    // family): the engine writes the partitioned layout + `_graft_meta`
    // sidecar to the fixed export path and serves through readProbed
    // (producer-side validation); the ORACLE is the consumer — DuckDB
    // read_parquets the layout itself (hive partitioning recovers the
    // cluster column from the directory names — the on-disk convention
    // the sidecar records), validates the sidecar's (schema_version,
    // cluster_col) row, replays the probe ranking from the LAYOUT's own
    // rows, and serves the probed clusters. A missing/foreign/mis-keyed
    // sidecar empties the oracle's gate CTE → zero rows → red gate:
    // refusal on the consumer path is observable for this family too.
    "clustered_probe_consumer" -> ((s, dir) => {
      val e = emb(s, dir)
      val path = ensureClusteredConsumerExport(s, dir)
      val q = requireQueryPresent(e.filter(col("vec_id") === 6),
          "clustered_probe_consumer")
        .select(col("embedding").as("q_vec"))
      val probed = Ivf.probe(Ivf.centroids(e), q, 2).collect().map(_.getInt(0)).toSeq
      val pruned = Ivf.readProbed(s, path, probed).filter(col("vec_id") =!= 6)
      Knn.topK(pruned.select("vec_id", "embedding"), q, 10, Knn.Cosine)
        .select("vec_id", "score")
    }),

    // A16: per-predicate selectivity classing (README query classes 1/2/3)
    "selectivity_classes" -> ((s, dir) =>
      docs(s, dir)
        .agg(
          sum(when(col("lang").isNotNull && col("lang") === "en", 1L).otherwise(0L)).as("m1"),
          sum(when(col("source").isNotNull && col("source").contains("src1"), 1L).otherwise(0L)).as("m2"),
          sum(when(col("n_chars").isNotNull && col("n_chars") < 200, 1L).otherwise(0L)).as("m3"),
          sum(when(col("n_chars").isNotNull && col("n_chars") < 120, 1L).otherwise(0L)).as("m4"),
          count(lit(1)).as("total"))
        .selectExpr(
          "stack(4, 'lang_en', m1, 'src1_substr', m2, 'nchars_lt200', m3, 'nchars_lt120', m4) AS (pred, n_match)",
          "total")
        .selectExpr("pred", "n_match", "(n_match * 1000000) div total AS sel",
          """CASE WHEN (n_match * 1000000) div total >= 300000 THEN 'class3_broad'
            |     WHEN (n_match * 1000000) div total >= 50000 THEN 'class2_mid'
            |     ELSE 'class1_selective' END AS cls""".stripMargin)),

    // A28: selectivity-dispatched search — one query per reference class,
    // each routed by Ivf.autoKnn: c1 (src1, ~5%) must pre-filter, c2
    // (zh, ~15%) must probe the hybrid path, c3 (n_chars≤300, ~49%) must
    // post-filter. The oracle recomputes the per-mille selectivity and
    // guards each strategy branch with it, so the DISPATCH DECISION is
    // hash-verified, not just the result rows.
    "knn_auto" -> ((s, dir) => {
      val e = emb(s, dir)
      val d = docs(s, dir)
      val corpus = e.filter(col("vec_id") =!= 5)
      val q = e.filter(col("vec_id") === 5).select(col("embedding").as("q_vec"))
      val cases = Seq(
        ("c1", MetaPredicate("source" -> ("exact", "src1"))),
        ("c2", MetaPredicate("lang" -> ("exact", "zh"))),
        ("c3", MetaPredicate("n_chars" -> ("leq", 300))))
      // each case's dispatch runs two selectivity counts at construction:
      // build the independent cases concurrently (guide §2.6), union in
      // input order
      graft.Par.ordered(cases) { case (cls, pred) =>
        Ivf.autoKnn(corpus, d, pred, q, k = 5)
          .select(lit(cls).as("cls"), col("strategy"), col("vec_id"), col("score"))
      }.reduce(_ union _)
    }),

    // A28b: the selectivity DISPATCH at the REFERENCE width (the r16
    // verdict's #6 named adaptive-or-auto; adaptive landed first, this
    // closes the other arm so no A-row BEHAVIOR gates only at d=64):
    // the routing decision itself is metadata-side (width-independent
    // counts), but every strategy BODY it dispatches into — prefilter
    // scan, probed hybrid, post-filter funnel — scores at d=2048 over
    // the wide labeled frame. The oracle recomputes the per-mille
    // selectivity and guards each strategy branch with it, so a wrong
    // routing decision hash-fails at width exactly as at d=64.
    "knn_auto_2048" -> ((s, dir) => {
      val all = wideLabeled(s, dir)
      val d = docs(s, dir)
      val corpus = all.filter(col("vec_id") =!= 5)
      val q = requireQueryPresent(all.filter(col("vec_id") === 5), "knn_auto_2048")
        .select(col("embedding").as("q_vec"))
      val cases = Seq(
        ("c1", MetaPredicate("source" -> ("exact", "src1"))),
        ("c2", MetaPredicate("lang" -> ("exact", "zh"))),
        ("c3", MetaPredicate("n_chars" -> ("leq", 300))))
      // each case's dispatch runs two selectivity counts at construction:
      // build the independent cases concurrently (guide §2.6), union in
      // input order
      graft.Par.ordered(cases) { case (cls, pred) =>
        Ivf.autoKnn(corpus, d, pred, q, k = 5)
          .select(lit(cls).as("cls"), col("strategy"), col("vec_id"), col("score"))
      }.reduce(_ union _)
    }),

    // A17: the whole kNN expressed in plain SQL against the registered
    // vec_cosine function — proves the SQL surface is first-class
    "sql_knn" -> ((s, dir) => {
      graft.GraftExtensions.register(s)
      emb(s, dir).createOrReplaceTempView("g_emb")
      s.sql(
        """SELECT e.vec_id,
          |  CAST(floor(vec_cosine(e.embedding, q.embedding) * 10000 + 0.5) AS BIGINT) AS score
          |FROM g_emb e CROSS JOIN (SELECT embedding FROM g_emb WHERE vec_id = 9) q
          |WHERE e.vec_id <> 9
          |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin)
    }),

    // C16 driver-verified: the AnnProbeRewrite Catalyst rule end-to-end.
    // A sibling session carries the graft extensions; an IVF index is
    // built+registered (session-scoped) and the rewrite enabled; then the
    // user-facing query is PLAIN brute-force SQL — `ORDER BY vec_cosine
    // DESC LIMIT k` — which the rule turns into a probed scan (asserted on
    // the plan in PlanAuditSpec). The oracle computes top-k within the 2
    // clusters whose centroids are nearest the query, i.e. what the
    // rewritten plan must return.
    "sql_knn_indexed" -> ((s, dir) => {
      val ext = org.apache.spark.sql.graftbridge.Bridge
        .newSessionWithExtensions(s, e => new graft.GraftExtensions().apply(e))
      val e = Tables(ext, dir, "embeddings")
      Ivf.buildAndRegisterIndex(e, nProbe = 2)
      ext.conf.set(graft.plans.AnnIndexRegistry.EnabledConf, "true")
      e.createOrReplaceTempView("g_emb_ix")
      // query vector inlined as a foldable literal (CAST of the exact
      // Float.toString round-trips bit-exactly)
      val qv = e.filter(col("vec_id") === 9).select("embedding")
        .collect().head.getSeq[Float](0)
      val qLit = qv.map(f => s"CAST('$f' AS FLOAT)").mkString("array(", ", ", ")")
      // ORDER BY carries the kernel expression itself (not the alias):
      // the rule rewrites sorts whose key IS a distance over the corpus
      ext.sql(
        s"""SELECT vec_id,
           |  CAST(floor(vec_cosine(embedding, $qLit) * 10000 + 0.5) AS BIGINT) AS score
           |FROM g_emb_ix
           |ORDER BY CAST(floor(vec_cosine(embedding, $qLit) * 10000 + 0.5) AS BIGINT) DESC,
           |  vec_id ASC
           |LIMIT 10""".stripMargin)
    }),

    // C16b: the rewrite's OTHER probe-able metric, driver-verified — same
    // contract as sql_knn_indexed but `ORDER BY vec_l2 ASC`: the rule
    // probes by centroid L2 (not cosine) and must still inject the filter.
    "sql_knn_indexed_l2" -> ((s, dir) => {
      val ext = org.apache.spark.sql.graftbridge.Bridge
        .newSessionWithExtensions(s, e => new graft.GraftExtensions().apply(e))
      val e = Tables(ext, dir, "embeddings")
      Ivf.buildAndRegisterIndex(e, nProbe = 2)
      ext.conf.set(graft.plans.AnnIndexRegistry.EnabledConf, "true")
      e.createOrReplaceTempView("g_emb_ixl2")
      val qv = e.filter(col("vec_id") === 6).select("embedding")
        .collect().head.getSeq[Float](0)
      val qLit = qv.map(f => s"CAST('$f' AS FLOAT)").mkString("array(", ", ", ")")
      ext.sql(
        s"""SELECT vec_id,
           |  CAST(floor(vec_l2(embedding, $qLit) * 10000 + 0.5) AS BIGINT) AS score
           |FROM g_emb_ixl2
           |ORDER BY CAST(floor(vec_l2(embedding, $qLit) * 10000 + 0.5) AS BIGINT) ASC,
           |  vec_id ASC
           |LIMIT 10""".stripMargin)
    }),

    // A15b: the FULL ABO listings ingest, driver-verified — ABO-shaped JSONL
    // (nested value-structs, optional brand, optional other_image_id) is
    // synthesized deterministically from `documents`, then round-tripped
    // through the real parse path: sources.Listings typed from_json →
    // image-id explode → flattened attrs (parse-json.py:41's image join).
    // The oracle computes the expected projection directly, so any parse,
    // explode, or null-handling defect hash-mismatches. Nullable source
    // columns are coalesced IDENTICALLY on both sides (concat would
    // otherwise null out the whole JSON line while the oracle kept the
    // row); lang/source are alphanumeric by the testdata contract, so no
    // JSON string escaping is needed.
    "listings_parse" -> ((s, dir) => {
      val jsonl = listingsJsonl(s, dir)
      val im = graft.sources.Listings.imageMetadata(
        graft.sources.Listings.parseListings(jsonl))
      im.select(col("image_id"), col("brand"), col("color"), col("model_year"),
        col("item_weight").cast("long").as("item_weight"), col("country"))
    }),

    // A50: the reference's WHOLE notebook flow as ONE gated plan (r13
    // verdict next #7; reference 6400Project.ipynb end-to-end): ABO-shaped
    // listings JSONL → sources.Listings typed parse → image-id explode →
    // the per-listing embed slot at the reference width (the A45
    // derived-wide frame keyed by the PARSED main-image ids — the honest
    // d=2048 stand-in for ResNet-50, scope declared at wideEmbeddings) →
    // the ONE persisted filter-agnostic wide HNSW index → class-1/2/3
    // metadata predicates over the PARSED attributes (brand / color /
    // model_year — the notebook's query_metadata classes) answered by the
    // ACORN filtered walk, composed with zero driver-side glue between
    // stages: the pass sets flow from the parse output into the cogrouped
    // walk as relations. Saturating sentinel ⇒ each class's top-10 is
    // exact, so the oracle replays the COMPOSITION: attribute derivation,
    // predicate, wide vectors, prefilter top-k. Queries stay in the
    // corpus (persisted-serving convention) — whether a query's own
    // listing passes its class predicate is decided identically on both
    // sides.
    "acorn_pipeline_e2e" -> ((s, dir) => {
      val attrs = parsedListingAttrs(s, dir)
      val path = ensureHnswWideIndex(s, dir)
      val w = wideEmb(emb(s, dir))
      val classes = Seq(
        ("c1", pipelineClassPred("c1"), 3L),
        ("c2", pipelineClassPred("c2"), 11L),
        ("c3", pipelineClassPred("c3"), 17L))
      // independent per-class cells: construct concurrently (guide §2.6,
      // the recallCells convention) — union order is the input order
      graft.Par.ordered(classes) { case (cls, pred, qid) =>
        val qv = w.filter(col("vec_id") === qid).select("embedding")
          .collect().head.getSeq[Float](0).toArray
        val passing = attrs.filter(pred).select("vec_id")
        // per-class vacuous-gate guard (r14 review): a class predicate
        // matching zero listings would emit zero rows on BOTH sides and
        // that cell of the matrix would gate nothing — refuse loudly
        // (cheap: attrs is materialized, this scans the cached frame)
        require(passing.limit(1).count() >= 1,
          s"acorn_pipeline_e2e: class $cls predicate matches no parsed " +
            "listings — its cell would gate vacuously")
        Hnsw.searchFilteredPersisted(s, path, passing, numParts = 8, qv, 10,
          metaSearch = 0)
          .select(lit(cls).as("cls"), col("vec_id"), col("score"))
      }.reduce(_ union _)
    }),

    // A50b: the capstone's RECALL row (r14 verdict next #6 — README §3's
    // per-class recall@10 numbers are the one notebook output the e2e
    // entry didn't emit from parsed attrs): the SAME parse→attr pass
    // sets and persisted wide index, walked at the reference's REAL
    // constants (metaSearch=100, ef=200, largeK=200 — acorn.py:150–162),
    // 8 queries per class, recall@10 hits SUMMED per class vs the exact
    // prefilter ground truth computed over the PARSED attributes, emitted
    // as least(n_hit, FLOOR) — the oracle asserts the literal floors
    // (the A35h convention), so the row goes red exactly when the
    // composed pipeline's realistic-budget recall drops below its
    // measured knee.
    "acorn_pipeline_recall" -> ((s, dir) => {
      val attrs = parsedListingAttrs(s, dir)
      val path = ensureHnswWideIndex(s, dir)
      val w = wideEmb(emb(s, dir))
      // independent per-class cells: construct concurrently (guide §2.6,
      // the recallCells convention) — union order is the input order
      graft.Par.ordered(PipelineRecallQids) { case (cls, qids) =>
        val passing = attrs.filter(pipelineClassPred(cls)).select("vec_id")
        require(passing.limit(1).count() >= 1,
          s"acorn_pipeline_recall: class $cls predicate matches no parsed " +
            "listings — its row would gate vacuously")
        val qs = requireQueriesPresent(
          w.filter(col("vec_id").isin(qids: _*))
            .select(col("vec_id"), col("embedding")).collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
            .sortBy(_._1),
          qids.length, s"acorn_pipeline_recall class $cls")
        val qDf = w.filter(col("vec_id").isin(qids: _*))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
        val exactF = Knn.batchKnn(
            w.select("vec_id", "embedding").join(passing, "vec_id"),
            qDf, 10, Knn.L2, excludeSelf = false)
          .select("q_id", "vec_id").localCheckpoint(true)
        Hnsw.searchFilteredPersistedBatch(s, path, passing, numParts = 8,
            qs, 10, metaSearch = 100, ef = 200, largeK = 200)
          .select("q_id", "vec_id")
          .join(exactF, Seq("q_id", "vec_id"))
          .agg(count(lit(1)).as("n_hit"))
          .select(lit(cls).as("cls"),
            least(col("n_hit"), lit(PipelineRecallFloors(cls))).as("n_hit_floor"))
      }.reduce(_ union _)
    }),

    // A50c: the capstone's STRATEGY MATRIX (r16 verdict next #2 — the
    // reference's entire headline experiment is parse → embed → index →
    // {pre, post, ACORN} per selectivity class, README §3's table +
    // acorn.py `__main__`; A50 gated the composed pipeline's ACORN arm
    // only). Per parsed-attribute class: `pre` = exact prefilter top-10
    // over the passing set (the ground-truth strategy, computed by the
    // ENGINE through the parse→attr→filter→scan composition and replayed
    // independently by the oracle from raw documents); `acorn` = the
    // saturated filtered walk over the ONE persisted wide index (exact ⇒
    // must land on the SAME rows — the walk≡scan identity per class is
    // itself the gate); `post` = the unfiltered wide top-50 filtered
    // afterwards (post-filter.py), deterministic and replayed verbatim —
    // on the selective classes it visibly returns the collapsed tail.
    // All three at d=2048 over the parsed pass sets; queries stay in the
    // corpus (the A50 convention).
    "acorn_pipeline_e2e_2048" -> ((s, dir) => {
      val attrs = parsedListingAttrs(s, dir)
      val path = ensureHnswWideIndex(s, dir)
      val w = wideEmb(emb(s, dir))
      val classes = Seq(
        ("c1", pipelineClassPred("c1"), 3L),
        ("c2", pipelineClassPred("c2"), 11L),
        ("c3", pipelineClassPred("c3"), 17L))
      // independent per-class cells: construct concurrently (guide §2.6,
      // the recallCells convention) — union order is the input order
      graft.Par.ordered(classes) { case (cls, pred, qid) =>
        val qRows = requireQueryPresent(w.filter(col("vec_id") === qid),
          s"acorn_pipeline_e2e_2048 class $cls")
        val qv = qRows.select("embedding").collect().head.getSeq[Float](0).toArray
        val qDf = w.filter(col("vec_id") === qid).select(col("embedding").as("q_vec"))
        val passing = attrs.filter(pred).select("vec_id")
        require(passing.limit(1).count() >= 1,
          s"acorn_pipeline_e2e_2048: class $cls predicate matches no parsed " +
            "listings — its cells would gate vacuously")
        val pre = Knn.topK(w.select("vec_id", "embedding").join(passing, "vec_id"),
            qDf, 10, Knn.L2)
          .select(lit(cls).as("cls"), lit("pre").as("strategy"),
            col("vec_id"), col("score"))
        val acorn = Hnsw.searchFilteredPersisted(s, path, passing, numParts = 8,
            qv, 10, metaSearch = 0)
          .select(lit(cls).as("cls"), lit("acorn").as("strategy"),
            col("vec_id"), col("score"))
        val post = Knn.topK(w.select("vec_id", "embedding"), qDf, 50, Knn.L2)
          .join(passing, "vec_id")
          .orderBy(col("score").asc, col("vec_id").asc).limit(10)
          .select(lit(cls).as("cls"), lit("post").as("strategy"),
            col("vec_id"), col("score"))
        pre.union(acorn).union(post)
      }.reduce(_ union _)
    }),

    // A50d: the capstone recall TABLE at the realistic budget — README
    // §3's per-class recall@10 numbers for BOTH approximate strategies
    // THROUGH the parsed pipeline (r16 verdict next #2's "per-class
    // recall@10" completes here: A50b gated the ACORN arm's floors; this
    // adds the post-filter.py baseline over the SAME parsed pass sets,
    // persisted wide index, query files, and real constants, so the
    // reference's central claim — post collapses on the selective class
    // while ACORN holds — is floor-pinned through the composition). The
    // acorn cells are the SAME measurement as A50b (shared
    // PipelineRecallQids + PipelineRecallFloors); `pre` is the ground
    // truth itself (recall ≡ 80 by construction) and is deliberately not
    // emitted as a row — asserting it would gate nothing.
    "acorn_pipeline_recall_2048" -> ((s, dir) => {
      val attrs = parsedListingAttrs(s, dir)
      val path = ensureHnswWideIndex(s, dir)
      val w = wideEmb(emb(s, dir))
      val classes = PipelineRecallQids.map { case (cls, qids) =>
        val passing = attrs.filter(pipelineClassPred(cls)).select("vec_id")
        require(passing.limit(1).count() >= 1,
          s"acorn_pipeline_recall_2048: class $cls predicate matches no " +
            "parsed listings — its cells would gate vacuously")
        (cls, passing, qids)
      }
      recallCells(s, w, path, classes, PipelineMatrixFloors,
        Seq("acorn", "post"), "acorn_pipeline_recall_2048")
    }),

    // A15: JSONL metadata ingest — typed from_json (parse-json.py analogue)
    "metadata_parse" -> ((s, dir) =>
      Tables(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
            .getField("k").as("k"))
        .filter(col("k").isNotNull)),

    // A35 driver-verified: per-partition HNSW graph search, exact-rescored
    // global merge. The graph is deterministic (ascending-id insertion,
    // md5-derived levels) and the partitioning pinned, so the result is
    // bit-stable; ef=0 is the saturating sentinel (beam widens to each
    // partition's size), so the local result is exact at ANY sf and the
    // brute-force SQL oracle replays the answer. Realistic bounded-beam
    // recall lives in HnswSpec.
    "knn_hnsw" -> ((s, dir) => {
      val e = emb(s, dir)
      // query vector is k·d driver-side model state (clustered_probe contract)
      val qv = e.filter(col("vec_id") === 7).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      Hnsw.searchPerPartition(
        e.filter(col("vec_id") =!= 7).select("vec_id", "embedding")
          .repartition(8, col("vec_id")),
        qv, 10, ef = 0)
    }),

    // The reference's NAMESAKE algorithm driver-verified: ACORN-1
    // predicate-aware graph traversal (/root/reference/acorn.py:149
    // acorn_search) under the class-1 selective predicate. One
    // filter-agnostic graph indexes ALL rows; the walk blocks
    // filter-failing nodes (traversable but unreturnable) under a growing
    // visit budget with the +1/+10 schedule and anti-stall set.
    // metaSearch=0 is the saturating sentinel (budget/beam/cut widen to
    // each partition's size), so the survivor set is exactly the filtered
    // neighborhood at ANY sf and the prefilter SQL oracle replays the
    // top-k; a positive budget is the recall/cost knob (HnswSpec sweeps
    // it and proves survivor-set nesting).
    "hybrid_knn_hnsw" -> ((s, dir) => {
      val e = emb(s, dir)
      val d = docs(s, dir)
      val qv = e.filter(col("vec_id") === 11).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
      Hnsw.searchFilteredPerPartition(withPassBit(s, dir, pred, 11), qv, 10,
        metaSearch = 0)
    }),

    // A35g: the ACORN-γ predicate-subgraph walk (r12 verdict next #4):
    // the reference works around blocked-walk stalls by doubling M
    // ("M 64 … so the one-hop doesn't block us", acorn.py:34); the
    // ACORN paper's principled fix is TWO-HOP neighbor expansion — each
    // bounded round bridges through predicate-failing neighbors (their
    // layer-0 neighbors join the same expansion, visit-counted), so the
    // walk traverses the predicate-induced subgraph instead of paying a
    // dequeue per dead end. At the saturating sentinel the walk is exact
    // (same sweep guarantee — the flag changes budget-bound traversal
    // order only), so the class-1 prefilter oracle replays it; HnswSpec
    // pins recall ≥ the one-hop walk at EQUAL visit budgets, which is
    // where the flag earns its keep at 100 TB.
    "hybrid_knn_hnsw_2hop" -> ((s, dir) => {
      val e = emb(s, dir)
      val qv = e.filter(col("vec_id") === 17).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
      Hnsw.searchFilteredPerPartition(withPassBit(s, dir, pred, 17), qv, 10,
        metaSearch = 0, twoHop = true)
    }),

    // A35c: the persisted-index LIFECYCLE driver-verified — the reference
    // builds its hnswlib index once (acorn.py:61 add_items; README prices
    // build at 51 s, query at 3.5 ms) and serves every query from it. The
    // graphs here build+serialize once per (JVM, sfDir); the timed body
    // restores nodes verbatim and beam-searches only. Query id 13 stays IN
    // the corpus (query-by-indexed-item), so rank 1 is the self-hit at
    // distance 0 on both sides.
    "knn_hnsw_persisted" -> ((s, dir) => {
      val path = ensureHnswIndex(s, dir)
      val qv = emb(s, dir).filter(col("vec_id") === 13).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      Hnsw.searchPersisted(s, path, qv, 10, ef = 0)
    }),

    // A45: brute-force L2 top-k at the REFERENCE's dimensionality — the
    // A6 operator run through 2048-d vectors (wideEmb construction above),
    // so the codegen'd L2 kernel's sequential float→double accumulation is
    // oracle-HASH-checked at d=2048, not just probed for timings
    // (r10 verdict "What's missing" #2). Self excluded, the A6 convention.
    "knn_exact_l2_2048" -> ((s, dir) => {
      val w = wideEmb(emb(s, dir))
      Knn.topK(w.filter(col("vec_id") =!= 0).select("vec_id", "embedding"),
        w.filter(col("vec_id") === 0).select(col("embedding").as("q_vec")),
        10, Knn.L2).select("vec_id", "score")
    }),

    // A45b: the persisted-HNSW serve at 2048-d — build+serialize the
    // per-partition graphs over the WIDE vectors once, restore and walk at
    // the saturating beam (exact ⇒ the brute-force oracle replays it;
    // self-hits included, the A35c convention). Closes the lifecycle leg
    // of the width question: graph build, parquet round-trip, restore, and
    // walk all at the reference's d=2048 under the standard hash gate.
    "knn_hnsw_2048" -> ((s, dir) => {
      val path = ensureHnswWideIndex(s, dir)
      val qv = wideEmb(emb(s, dir)).filter(col("vec_id") === 13).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      Hnsw.searchPersisted(s, path, qv, 10, ef = 0)
    }),

    // A45c: the ACORN filtered walk at the REFERENCE width — the
    // reference's NAMESAKE operation (predicate + graph walk over the one
    // filter-agnostic index, acorn.py) ran at d=2048 only unfiltered
    // (A45b); the filtered traversal's visit arithmetic is width-
    // dependent (every hop pays a 2048-d distance). Same construction as
    // A35b over the derived-wide frame: pass bits from the metadata
    // predicate ride WITH the vectors into each partition's graph, the
    // walk visits the full graph but collects only predicate-passing
    // nodes; at the saturating sentinel (metaSearch=0) the walk is exact,
    // so the prefilter oracle replays it over the wide vectors.
    "hybrid_knn_hnsw_2048" -> ((s, dir) => {
      val w = wideEmb(emb(s, dir))
      val qv = w.filter(col("vec_id") === 11).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      Hnsw.searchFilteredPerPartition(
        widePassBit(s, dir, col("lang").isNotNull && col("lang") === "zh", 11),
        qv, 10, metaSearch = 0)
    }),

    // A45d: the ACORN-γ TWO-HOP walk at the reference width — A35g's
    // predicate-subgraph bridge, whose per-round budget economics are
    // width-dependent (every bridged hop at d=2048 pays a 32× costlier
    // distance than at d=64, so the flag's earn-rate must be re-measured
    // at the width the reference actually builds). Saturating sentinel ⇒
    // exact under both flags (the bridge changes budget-bound traversal
    // order only), so the class-1 wide prefilter oracle replays it;
    // Wide2048Spec measures the recall curve vs the one-hop walk at
    // equal budgets at width.
    "hybrid_knn_hnsw_2hop_2048" -> ((s, dir) => {
      val w = wideEmb(emb(s, dir))
      val qv = w.filter(col("vec_id") === 17).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
      Hnsw.searchFilteredPerPartition(widePassBit(s, dir, pred, 17),
        qv, 10, metaSearch = 0, twoHop = true)
    }),

    // A30's graph form: APPEND into the live persisted index (the
    // reference add_items()s while serving). The first 400 ids are the
    // persisted base; the rest arrive, route to their graph by replaying
    // the build's hash partitioning, and insert in ascending-id order —
    // which makes the appended graphs bit-identical to a full fresh build
    // (HnswSpec), so the saturating-beam result is the full-corpus exact
    // top-k and the brute-force oracle replays it.
    "knn_hnsw_append" -> ((s, dir) => {
      val path = ensureHnswBase(s, dir)
      val e = emb(s, dir)
      val qv = e.filter(col("vec_id") === 2).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      Hnsw.searchAppended(s, path,
        e.filter(col("vec_id") >= IvfAppendSplit).select("vec_id", "embedding"),
        numParts = 8, qv, 10, ef = 0)
    }),

    // The reference's full SERVING path: the ONE persisted filter-agnostic
    // index (A35c's) answering a predicate-aware query — ACORN's point is
    // exactly that no per-predicate index exists; the passing-id set is
    // computed relationally at query time and cogrouped to the graphs.
    // Class-2 predicate (lang = zh) to complement hybrid_knn_hnsw's
    // class-1; the saturating sentinel keeps the oracle replayable at
    // any sf.
    "hybrid_knn_hnsw_persisted" -> ((s, dir) => {
      val path = ensureHnswIndex(s, dir)
      val e = emb(s, dir)
      val qv = e.filter(col("vec_id") === 11).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      val passing = docs(s, dir)
        .filter(MetaPredicate("lang" -> ("exact", "zh")))
        .select(col("doc_id").as("vec_id"))
      Hnsw.searchFilteredPersisted(s, path, passing, numParts = 8, qv, 10,
        metaSearch = 0)
    }),

    // A12's persisted-graph form: the whole query set served from ONE
    // restore pass per partition (the reference's evaluation loop — one
    // index, a query file). Output shape mirrors knn_batch; self-hits
    // included (queries are indexed items).
    "knn_hnsw_batch" -> ((s, dir) => {
      val path = ensureHnswIndex(s, dir)
      val qs = requireQueriesPresent(
        emb(s, dir).filter(col("vec_id") <= 4)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1),
        5, "knn_hnsw_batch")
      Hnsw.searchPersistedBatch(s, path, qs, 3, ef = 0)
    }),

    // A35i: the persisted-graph BATCH serve at the REFERENCE width (r14
    // verdict next #2 — the one serving family whose batch form gated
    // only at d=64): the reference's main loop serves a query FILE
    // against the d=2048 index it builds (acorn.py `__main__` × :30–40).
    // A35f's machinery over A45b's persisted wide graphs — restore ONCE
    // per partition, answer the whole broadcast query set, ≤ P·|Q|·k
    // rows into the k-heap merge — at the saturating beam (exact ⇒ the
    // windowed brute-force wide oracle replays it). Self-hits included,
    // the A35f convention. Non-empty query-set guard: an empty collect
    // would empty BOTH sides and the gate would pass vacuously.
    "knn_hnsw_batch_2048" -> ((s, dir) => {
      val path = ensureHnswWideIndex(s, dir)
      val qs = requireQueriesPresent(
        wideEmb(emb(s, dir)).filter(col("vec_id") <= 4)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
          .sortBy(_._1),
        5, "knn_hnsw_batch_2048")
      Hnsw.searchPersistedBatch(s, path, qs, 3, ef = 0)
    }),

    // A49: EXTERNAL query through the persisted WIDE graph (r14 verdict
    // next #7 — the A47c external construction pinned only the PQ
    // family; the HNSW walks took only indexed queries at d=2048, so no
    // width gate proved the graph serve never secretly assumes an
    // indexed query). The reference's actual demo embeds a NON-corpus
    // query (query.jpg, acorn.py `__main__`) and walks the d=2048 index
    // it builds. One external midpoint query derived from the first WIDE
    // vector pair ((w0+w1)/2, one float round per component — both
    // engines derive the identical non-indexed vector with no new
    // table); the saturating beam makes the walk exact, so the wide
    // brute-force oracle replays it with NO self-exclusion — an external
    // query has no corpus row to exclude.
    "knn_hnsw_external_2048" -> ((s, dir) => {
      val path = ensureHnswWideIndex(s, dir)
      val pair = wideEmb(emb(s, dir)).filter(col("vec_id") <= 1)
        .select("vec_id", "embedding").collect().sortBy(_.getLong(0))
      require(pair.length == 2,
        "knn_hnsw_external_2048: corpus rows 0 and 1 must exist to derive " +
          "the external midpoint query — the gate would otherwise check " +
          "a different vector than the oracle")
      val a = pair(0).getSeq[Float](1)
      val b = pair(1).getSeq[Float](1)
      val qv = Array.tabulate(a.length)(i =>
        ((a(i).toDouble + b(i).toDouble) * 0.5).toFloat)
      Hnsw.searchPersisted(s, path, qv, 10, ef = 0)
    }),

    // A11's graph-native form (acorn_attribute_specific.py:48–78): the
    // graph indexes ONLY attribute-present rows (the reference keeps just
    // images carrying model_year — index membership is itself a filter),
    // and the query-time class-3 predicate runs as the ACORN walk over
    // that narrower graph. k=3 and a leq+substring predicate, like the
    // reference's query_metadata_class_3.
    "attr_specific_knn_hnsw" -> ((s, dir) => {
      val e = emb(s, dir)
      val qv = e.filter(col("vec_id") === 9).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("n_chars" -> ("leq", 400), "lang" -> ("substring", "e"))
      val corpus = e.filter(col("vec_id") =!= 9).select("vec_id", "embedding")
        .join(docs(s, dir).filter(col("n_chars").isNotNull)
            .select(col("doc_id"), pred.as("p0")),
          col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"),
          coalesce(col("p0"), lit(false)).as("pass"))
        .repartition(8, col("vec_id"))
      Hnsw.searchFilteredPerPartition(corpus, qv, 3, metaSearch = 0)
    }),

    // The APPROXIMATE HNSW path, CORRECTNESS-gated (r5 verdict "Next
    // round" #1: every other HNSW entry runs the saturating sentinel, so
    // a realistic-beam regression — e.g. a beam-prune bug that only bites
    // when `results.size >= ef` fires — would pass the driver). This entry
    // runs the REFERENCE'S real constants (ef=200, largeK=200,
    // metaSearch=100 — /root/reference/acorn.py:150–162) against the
    // persisted index, computes recall@10 vs the in-engine brute-force
    // ground truth as a NUMBER, and emits `least(n_hit, FLOOR)`: the
    // DuckDB oracle asserts the FLOOR literal, so the row goes red exactly
    // when realistic-beam recall drops below the measured knee. Floors
    // (beam 36/40, acorn 7/10) sit under the min measured across
    // sf0.001/0.01/0.1 with margin for testdata regeneration; the graph
    // and walk are deterministic, so at fixed data the number is exact.
    "recall_hnsw_beam" -> ((s, dir) => {
      // floors: tri-scale measured min − ≥2-hit margin (SURVEY §8 records
      // the measured values); the oracle asserts the literals, so a cell
      // goes red exactly when summed recall drops below its knee
      // measured (sf0.001/0.01/0.1): beam 80/80/80 all classes;
      // acorn c1 80/80/57, c2 80/80/63, c3 80/80/59 (the metaSearch=100
      // budget knee at 250-row partitions — the reference's trade-off);
      // post c1 75/77/74, c2 80/80/80, c3 80/80/80. Floors sit 4-7 hits
      // under the tri-scale min. Matrix body shared with A48
      // (recallBeamMatrix above).
      recallBeamMatrix(s, dir, emb(s, dir), ensureHnswIndex(s, dir), Map(
        ("c1", "beam") -> 76L, ("c1", "acorn") -> 50L, ("c1", "post") -> 68L,
        ("c2", "beam") -> 76L, ("c2", "acorn") -> 56L, ("c2", "post") -> 76L,
        ("c3", "beam") -> 76L, ("c3", "acorn") -> 52L, ("c3", "post") -> 76L))
    }),

    // A48: the reference's HEADLINE evaluation matrix AT THE REFERENCE
    // WIDTH (r13 verdict next #1 — README §3's central table is measured
    // at the d=2048 the reference actually builds, README.md:229–232;
    // until now the class × strategy matrix gated only over the 64-d
    // frame): selectivity class 1/2/3 × strategy {beam, acorn, post} at
    // the real constants (ef=200, largeK=200, metaSearch=100 —
    // acorn.py:150–162) against the PERSISTED d=2048 graphs, 8 queries
    // per class, recall@10 hits SUMMED per (class, strategy), emitted as
    // least(n_hit, FLOOR) so the oracle's literal-floor assertion goes
    // red exactly when wide realistic-beam recall drops below its
    // measured knee. Floors sit 4–7 hits under the tri-scale min
    // (sf0.001/0.01/0.1 measurements in SURVEY §8q): beam 80/80/80 all
    // classes; acorn c1 80/80/53, c2 80/80/64, c3 80/80/62; post
    // c1 73/77/74, c2 80/80/80, c3 80/80/80 — the metaSearch=100 budget
    // knee (it bites at sf0.1's 250-row partitions, where the budget is
    // finally smaller than the partition) and the post-filter collapse
    // on the selective class both reproduce at the reference width.
    "recall_hnsw_beam_2048" -> ((s, dir) =>
      recallBeamMatrix(s, dir, wideEmb(emb(s, dir)), ensureHnswWideIndex(s, dir),
        RecallBeam2048Floors)),

    // A51: the ACORN-γ two-hop recall CURVE as a driver entry (r14
    // verdict next #4 — the bridge's value claim lived only in HnswSpec):
    // the reference doubles M to keep the one-hop walk from blocking
    // (acorn.py:34); the two-hop predicate-subgraph expansion is the
    // ACORN paper's principled fix, and its worth is a BUDGET question —
    // at equal interior metaSearch budgets the bridged walk must reach
    // at least as much of the exact filtered answer. HnswSpec's EXACT
    // configuration, driver-gated: query 17, the class-1 selective
    // two-attr predicate, the per-partition pass-bit walk
    // (searchFilteredPerPartition — the two walks differ only in the
    // twoHop flag), interior budgets × {one, two}, recall@10 vs the
    // exact prefilter ground truth, emitted as least(n_hit, FLOOR); per
    // budget a third `gain` row emits least(two − one, GAIN_FLOOR), so
    // the entry goes red if the bridge ever LOSES recall at equal budget
    // on the measured grid. Floors sit under the tri-scale min (§8r).
    "recall_hnsw_2hop" -> ((s, dir) =>
      twoHopRecallCurve(s, dir, emb(s, dir), TwoHopBudgets,
        "recall_hnsw_2hop")),

    // A51b: the two-hop budget curve AT THE REFERENCE WIDTH (r15 verdict
    // next #4 — the one measured two-hop claim not gated at d=2048, and
    // the r15 floors lesson says the gain is CONFIGURATION-specific, so
    // the width configuration deserves its own measured grid). The same
    // one-pass sweep over the derived-wide pass-bit corpus; floors
    // re-measured tri-scale AT width (§8s) — the wide geometry changes
    // the knee, not the never-loses claim.
    "recall_hnsw_2hop_2048" -> ((s, dir) =>
      twoHopRecallCurve(s, dir, wideEmb(emb(s, dir)), TwoHopBudgets2048,
        "recall_hnsw_2hop_2048")),

    // A13c: recall row beside recall_filtered — the ACORN walk vs the
    // post-filter baseline on the class-1 selective predicate, both scored
    // against the exact pre-filter ground truth. Post-filter collapses
    // (its unfiltered top-50 rarely contains the survivors); the
    // predicate-aware walk holds recall — the reference README's headline
    // comparison, here as a driver-checked assertion.
    "recall_hnsw_filtered" -> ((s, dir) => {
      val e = emb(s, dir)
      val d = docs(s, dir)
      val all = e.filter(col("vec_id") =!= 11).select("vec_id", "embedding")
      val qDf = e.filter(col("vec_id") === 11).select(col("embedding").as("q_vec"))
      val qv = e.filter(col("vec_id") === 11).select("embedding")
        .collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
      val exact = Knn.prefilterKnn(all, d, pred, qDf, 10, Knn.L2).select("vec_id")
        .localCheckpoint(true)
      val strategies = Seq(
        "acorn" -> Hnsw.searchFilteredPerPartition(withPassBit(s, dir, pred, 11),
          qv, 10, metaSearch = 0).select("vec_id"),
        "post" -> Knn.postfilterKnn(all, d, pred, qDf, 10, 50, Knn.L2).select("vec_id"))
      strategies.map { case (strat, approx) =>
        approx.join(exact.withColumn("_hit", lit(1)), Seq("vec_id"), "left")
          .agg(count(lit(1)).as("n_ret"), count(col("_hit")).as("n_hit"))
          .select(lit(strat).as("strategy"), col("n_ret"), col("n_hit"))
      }.reduce(_ union _)
    }),

    // A13d: the README §3 recall-collapse table AT THE REFERENCE WIDTH
    // (r16 verdict next #3 — the reference's central empirical claim is
    // measured at the d=2048 it builds, README.md:229–232; A13b gated the
    // post-vs-hybrid collapse only over the 64-d frame): per selectivity
    // class, post-filter and IVF-hybrid recall vs the exact PRE-FILTER
    // ground truth, every distance/centroid/probe at d=2048 over the
    // wide labeled frame. Both strategies are fully deterministic, so
    // n_ret/n_hit are COMPUTED on both sides (no floors) — the expected
    // shape (post collapses on the selective class, hybrid holds) is
    // hash-gated via the honest counts.
    "recall_filtered_2048" -> ((s, dir) => {
      val all = wideLabeled(s, dir)
      val e = all.filter(col("vec_id") =!= 11)
      val q = requireQueryPresent(all.filter(col("vec_id") === 11),
          "recall_filtered_2048")
        .select(col("embedding").as("q_vec"))
      val d = docs(s, dir)
      val classes = Seq(
        ("class1_selective",
          MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))),
        ("class2_mid", MetaPredicate("lang" -> ("exact", "zh"))),
        ("class3_broad", MetaPredicate("n_chars" -> ("leq", 400))))
      // the wide centroid table is class-independent: ONE wide per-label
      // mean pass (the A13b shape at 32× the vector bytes), materialized
      val cent = Ivf.centroids(e).localCheckpoint(true)
      classes.map { case (cls, pred) =>
        val exact = Knn.prefilterKnn(e, d, pred, q, 10, Knn.Cosine).select("vec_id")
          .localCheckpoint(true)
        val strategies = Seq(
          "post" -> Knn.postfilterKnn(e, d, pred, q, 10, 50, Knn.Cosine).select("vec_id"),
          "hybrid" -> Ivf.searchProbed(cent, e, d, pred, q, 10, 2, Knn.Cosine,
            "vec_id", "doc_id", "embedding", "label").select("vec_id"))
        strategies.map { case (strat, approx) =>
          approx.join(exact.withColumn("_hit", lit(1)), Seq("vec_id"), "left")
            .agg(count(lit(1)).as("n_ret"), count(col("_hit")).as("n_hit"))
            .select(lit(cls).as("cls"), lit(strat).as("strategy"),
              col("n_ret"), col("n_hit"))
        }.reduce(_ union _)
      }.reduce(_ union _)
    }),

    // A13e: the graph-native collapse row at width (A13c × d=2048): the
    // saturated ACORN walk over the wide pass-bit corpus vs the
    // post-filter baseline on the class-1 selective predicate, both
    // scored against the exact wide pre-filter ground truth. The walk's
    // beam/visit arithmetic pays 2048-term distances per hop — the d=64
    // gate never exercises the wide walk's scoring path through the
    // recall comparison.
    "recall_hnsw_filtered_2048" -> ((s, dir) => {
      val w = wideEmb(emb(s, dir))
      val d = docs(s, dir)
      val all = w.filter(col("vec_id") =!= 11).select("vec_id", "embedding")
      val qRows = requireQueryPresent(w.filter(col("vec_id") === 11),
        "recall_hnsw_filtered_2048")
      val qDf = qRows.select(col("embedding").as("q_vec"))
      val qv = qRows.select("embedding").collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("lang" -> ("exact", "zh"), "n_chars" -> ("<", 150))
      val exact = Knn.prefilterKnn(all, d, pred, qDf, 10, Knn.L2).select("vec_id")
        .localCheckpoint(true)
      val strategies = Seq(
        "acorn" -> Hnsw.searchFilteredPerPartition(widePassBit(s, dir, pred, 11),
          qv, 10, metaSearch = 0).select("vec_id"),
        "post" -> Knn.postfilterKnn(all, d, pred, qDf, 10, 50, Knn.L2).select("vec_id"))
      strategies.map { case (strat, approx) =>
        approx.join(exact.withColumn("_hit", lit(1)), Seq("vec_id"), "left")
          .agg(count(lit(1)).as("n_ret"), count(col("_hit")).as("n_hit"))
          .select(lit(strat).as("strategy"), col("n_ret"), col("n_hit"))
      }.reduce(_ union _)
    }),

    // A11c: the attribute-restricted clustered index at width
    // (acorn_attribute_specific.py:48–78 builds its attribute-specific
    // index at d=2048): the index is built ONLY over attribute-present
    // rows — membership is itself a filter — and probe/centroid/search
    // arithmetic all run over the wide labeled sub-frame.
    "attr_specific_knn_2048" -> ((s, dir) => {
      val sub = wideLabeled(s, dir)
        .join(docs(s, dir).filter(MetaPredicate("lang" -> ("exact", "zh"))),
          col("vec_id") === col("doc_id"))
        .select("vec_id", "embedding", "label")
      val q = requireQueryPresent(
          wideEmb(emb(s, dir)).filter(col("vec_id") === 7),
          "attr_specific_knn_2048")
        .select(col("embedding").as("q_vec"))
      Ivf.hybridKnn(sub, docs(s, dir), col("doc_id") =!= 7, q, k = 5, nProbe = 2)
        .select("vec_id", "score")
    }),

    // A11d: the graph-native attribute-specific form at width — the wide
    // graph indexes ONLY attribute-present rows (n_chars present, the
    // reference's model_year-subset convention) and the query-time
    // class-3 predicate runs as the saturated ACORN walk over that
    // narrower wide graph; k=3 like acorn_attribute_specific.py's
    // query_metadata_class_3.
    "attr_specific_knn_hnsw_2048" -> ((s, dir) => {
      val w = wideEmb(emb(s, dir))
      val qv = requireQueryPresent(w.filter(col("vec_id") === 9),
          "attr_specific_knn_hnsw_2048")
        .select("embedding").collect().head.getSeq[Float](0).toArray
      val pred = MetaPredicate("n_chars" -> ("leq", 400), "lang" -> ("substring", "e"))
      val corpus = w.filter(col("vec_id") =!= 9).select("vec_id", "embedding")
        .join(docs(s, dir).filter(col("n_chars").isNotNull)
            .select(col("doc_id"), pred.as("p0")),
          col("vec_id") === col("doc_id"))
        .select(col("vec_id"), col("embedding"),
          coalesce(col("p0"), lit(false)).as("pass"))
        .repartition(8, col("vec_id"))
      Hnsw.searchFilteredPerPartition(corpus, qv, 3, metaSearch = 0)
    }),

    // A10c: the reference's adaptive widening loop AT THE REFERENCE WIDTH
    // (r16 verdict next #6 — acorn.py:162's `while visits <= meta_search`
    // doubling runs against the d=2048 index it builds; the loop's
    // survivor counts, probe ranking, and final scoring are all
    // width-dependent). Probe-1 genuinely fails on lang='fr' and the
    // driver-side log2(C)-bounded loop widens until ≥ k survivors; the
    // oracle replays the min-sufficient-probe choice over the wide
    // centroid ranking, so the LOOP'S DECISION is hash-gated at width,
    // not just the final rows.
    "hybrid_knn_adaptive_2048" -> ((s, dir) => {
      val all = wideLabeled(s, dir)
      val q = requireQueryPresent(all.filter(col("vec_id") === 3),
          "hybrid_knn_adaptive_2048")
        .select(col("embedding").as("q_vec"))
      Ivf.adaptiveHybridKnn(all, docs(s, dir),
        MetaPredicate("lang" -> ("exact", "fr")) && (col("doc_id") =!= 3),
        q, k = 10)
        .select("vec_id", "score")
    })
  )

  /** A28/A28b: the dispatch-guarded auto-kNN replay, width-parametric —
    * ONE composer for both oracles (the d=64 text is unchanged modulo
    * the corp/q/cent prelude): each class's three strategy CTEs are
    * guarded by the SAME per-mille selectivity the Spark dispatch
    * computes, so the ROUTING DECISION hash-fails, not just the rows. */
  private def autoKnnOracleSql(wide: Boolean): String = {
    val preds = Seq(
      ("c1", "d.source IS NOT NULL AND d.source = 'src1'"),
      ("c2", "d.lang IS NOT NULL AND d.lang = 'zh'"),
      ("c3", "d.n_chars IS NOT NULL AND d.n_chars <= 300"))
    val branches = preds.map { case (cls, p) =>
      s"""${cls}sel AS (SELECT (SELECT count(*) FROM documents d WHERE $p) * 1000
         |  // (SELECT count(*) FROM documents) AS s),
         |${cls}pre AS (
         |  SELECT 'c_' AS cls, 'prefilter' AS strategy, vec_id, score FROM (
         |    SELECT e.vec_id AS vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |    FROM corp e JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
         |    WHERE $p ORDER BY score DESC, e.vec_id ASC LIMIT 5)
         |  WHERE (SELECT s FROM ${cls}sel) < 100),
         |${cls}hyb AS (
         |  SELECT 'c_' AS cls, 'hybrid' AS strategy, vec_id, score FROM (
         |    SELECT e.vec_id AS vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |    FROM corp e JOIN probes pr ON e.label = pr.label
         |    JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
         |    WHERE $p ORDER BY score DESC, e.vec_id ASC LIMIT 5)
         |  WHERE (SELECT s FROM ${cls}sel) >= 100 AND (SELECT s FROM ${cls}sel) < 300),
         |${cls}post AS (
         |  SELECT 'c_' AS cls, 'postfilter' AS strategy, vec_id, score FROM (
         |    SELECT c.vec_id AS vec_id, c.score AS score FROM cand c
         |    JOIN documents d ON d.doc_id = c.vec_id
         |    WHERE $p ORDER BY c.score DESC, c.vec_id ASC LIMIT 5)
         |  WHERE (SELECT s FROM ${cls}sel) >= 300)""".stripMargin
        .replace("'c_'", s"'$cls'")
    }
    val selects = preds.map { case (cls, _) =>
      s"SELECT * FROM ${cls}pre UNION ALL SELECT * FROM ${cls}hyb UNION ALL SELECT * FROM ${cls}post"
    }.mkString("\nUNION ALL\n")
    val prelude =
      if (wide)
        s"""${wideLabeledCtes}corp AS MATERIALIZED (
           |  SELECT vec_id, embedding, label FROM wl WHERE vec_id <> 5),
           |q AS (SELECT embedding FROM wide WHERE vec_id = 5),
           |cent AS (${DuckDialect.centSql("corp", WideDims)}),""".stripMargin
      else
        s"""corp AS (SELECT * FROM embeddings WHERE vec_id <> 5),
           |q AS (SELECT embedding FROM embeddings WHERE vec_id = 5),
           |cent AS (${centSql("corp")}),""".stripMargin
    s"""WITH $prelude
       |probes AS (
       |  SELECT c.label FROM cent c CROSS JOIN q
       |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2),
       |cand AS (
       |  SELECT e.vec_id AS vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
       |  FROM corp e CROSS JOIN q
       |  ORDER BY score DESC, e.vec_id ASC LIMIT 50),
       |${branches.mkString(",\n")}
       |$selects""".stripMargin
  }

  /** The wide frame JOINED with its cluster column, as oracle CTEs —
    * shared by every wide replay whose arithmetic needs
    * (vec_id, label, 2048-slot embedding) (A30c / A30d). */
  private val wideLabeledCtes: String =
    s"""wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS embedding FROM embeddings),
       |wl AS MATERIALIZED (SELECT w.vec_id, e.label, w.embedding
       |  FROM wide w JOIN embeddings e USING (vec_id)),
       |""".stripMargin

  /** A33/A33b oracle body over a source relation `src` exposing
    * (vec_id, label, embedding): hot selection, min/max seeds, tie-to-lo
    * two-way re-assignment. `prelude` contributes the wide CTEs ("" at
    * d=64). */
  private def splitHotOracleSql(src: String, prelude: String): String = {
    def l2s(a: String, b: String) =
      s"CAST(floor(list_distance(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"
    s"""WITH ${prelude}hot AS (SELECT label FROM $src GROUP BY label
       |  ORDER BY count(*) DESC, label LIMIT 3),
       |seeds AS (SELECT e.label, min(e.vec_id) AS lo_id, max(e.vec_id) AS hi_id
       |  FROM $src e JOIN hot USING (label) GROUP BY e.label),
       |sv AS (SELECT s.label, lo.embedding AS lo_vec, hi.embedding AS hi_vec
       |  FROM seeds s JOIN $src lo ON lo.vec_id = s.lo_id
       |               JOIN $src hi ON hi.vec_id = s.hi_id),
       |m AS (SELECT e.label, e.vec_id,
       |  CASE WHEN ${l2s("e.embedding", "v.lo_vec")} <= ${l2s("e.embedding", "v.hi_vec")}
       |       THEN 0 ELSE 1 END AS sub
       |  FROM $src e JOIN sv v ON e.label = v.label)
       |SELECT CAST(label AS BIGINT) AS label, CAST(sub AS BIGINT) AS sub,
       |  CAST(count(*) AS BIGINT) AS n, min(vec_id) AS min_member
       |FROM m GROUP BY 1, 2""".stripMargin
  }

  /** A30b/A30c oracle body over a source relation `src` exposing
    * (vec_id, label, embedding at `dims`): the assignment CTEs,
    * per-cluster drift stats, the integer threshold verdict, and the
    * dispatch — served_mean re-scores every member against the
    * verdict-chosen centroid. `prelude` contributes the wide CTEs for
    * the width gate ("" at d=64). Sums CAST to BIGINT (DuckDB sums
    * BIGINT into HUGEINT); all cuts integer. The oracle's `fresh` CTE
    * recomputes centroids over ALL members (an independent replica —
    * only verdict-rebuilt rows are ever read by the CASE dispatch, so
    * the values agree with the engine's restricted pass). */
  private def driftRebuildOracleSql(src: String, dims: Int,
                                    prelude: String): String = {
    def l2s(a: String, b: String) =
      s"CAST(floor(list_distance(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"
    s"""WITH ${prelude}cent AS MATERIALIZED (${DuckDialect.centSql(s"(SELECT * FROM $src WHERE vec_id < $IvfAppendSplit)", dims)}),
       |arr AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS label, d FROM (
       |  SELECT e.vec_id, c.label, ${l2s("e.embedding", "c.cent")} AS d,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${l2s("e.embedding", "c.cent")} ASC, c.label ASC) AS rn
       |  FROM $src e CROSS JOIN cent c WHERE e.vec_id >= $IvfAppendSplit) WHERE rn = 1),
       |based AS (SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       |    ${l2s("e.embedding", "c.cent")} AS d
       |  FROM $src e JOIN cent c ON c.label = e.label WHERE e.vec_id < $IvfAppendSplit),
       |sb AS (SELECT label, count(*) AS n_base, CAST(sum(d) AS BIGINT) AS sd_base
       |  FROM based GROUP BY 1),
       |sn AS (SELECT label, count(*) AS n_new, CAST(sum(d) AS BIGINT) AS sd_new
       |  FROM arr GROUP BY 1),
       |stats AS (SELECT sb.label, sb.n_base, coalesce(sn.n_new, 0) AS n_new,
       |  sb.sd_base // sb.n_base AS mean_base,
       |  CASE WHEN coalesce(sn.n_new, 0) = 0 THEN 0 ELSE sn.sd_new // sn.n_new END AS mean_new
       |  FROM sb LEFT JOIN sn USING (label)),
       |verd AS (SELECT label, n_base, n_new, mean_base, mean_new,
       |  CAST(mean_new * 10 > mean_base * 12 OR n_new * 5 >= n_base + n_new AS BIGINT) AS rebuild
       |  FROM stats),
       |members AS MATERIALIZED (
       |  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, e.embedding
       |  FROM $src e WHERE e.vec_id < $IvfAppendSplit
       |  UNION ALL
       |  SELECT a.vec_id, a.label, e.embedding FROM arr a JOIN $src e USING (vec_id)),
       |fresh AS MATERIALIZED (${DuckDialect.centSql("members", dims)}),
       |served AS (SELECT m.label,
       |    CAST(sum(${l2s("m.embedding",
                  "CASE WHEN v.rebuild = 1 THEN f.cent ELSE c.cent END")}) AS BIGINT)
       |      // count(*) AS served_mean
       |  FROM members m JOIN verd v ON v.label = m.label
       |  JOIN cent c ON c.label = m.label JOIN fresh f ON f.label = m.label
       |  GROUP BY m.label)
       |SELECT v.label, v.n_base, v.n_new, v.mean_base, v.mean_new, v.rebuild, s.served_mean
       |FROM verd v JOIN served s ON s.label = v.label""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "ivf_build" ->
      """SELECT e.label, d.dim AS dim,
        | CAST(floor(avg(CAST(e.embedding[d.dim + 1] AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS cvs,
        | count(*) AS n
        |FROM embeddings e CROSS JOIN range(64) d(dim)
        |GROUP BY e.label, d.dim""".stripMargin,

    "hybrid_knn" ->
      s"""WITH cent AS (${centSql("embeddings")}),
         |q AS (SELECT embedding FROM embeddings WHERE vec_id = 5),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e
         |JOIN probes p ON e.label = p.label
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN q
         |WHERE d.n_chars IS NOT NULL AND d.n_chars <= 400 AND d.doc_id <> 5
         |ORDER BY score DESC, e.vec_id ASC LIMIT 5""".stripMargin,

    // every strategy branch is guarded by the SAME per-mille selectivity
    // the Spark dispatch computes — a wrong routing decision hash-fails
    "knn_auto" -> autoKnnOracleSql(wide = false),

    // A28b: the same dispatch-guarded replay with every strategy body's
    // scoring (prefilter scan, probed hybrid, post-filter candidates)
    // and the centroid/probe prelude over the wide labeled frame
    "knn_auto_2048" -> autoKnnOracleSql(wide = true),

    "hybrid_knn_batch" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id <= 4),
         |cent AS (${centSql("embeddings")}),
         |probes AS (SELECT q_id, label FROM (
         |  SELECT q.q_id, c.label,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("c.cent", "q.q_vec")} DESC, c.label ASC) AS pr
         |  FROM cent c CROSS JOIN qs q) WHERE pr <= 2)
         |SELECT q_id, vec_id, rank, score FROM (
         |  SELECT q.q_id, e.vec_id,
         |    CAST(row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS BIGINT) AS rank,
         |    ${cosSql("e.embedding", "q.q_vec")} AS score
         |  FROM embeddings e
         |  JOIN probes p ON e.label = p.label
         |  JOIN qs q ON q.q_id = p.q_id
         |  JOIN documents d ON d.doc_id = e.vec_id
         |  WHERE d.n_chars IS NOT NULL AND d.n_chars <= 400 AND e.vec_id <> q.q_id
         |) WHERE rank <= 5""".stripMargin,

    "attr_specific_knn" ->
      s"""WITH sub AS (
         |  SELECT e.vec_id, e.embedding, e.label FROM embeddings e
         |  JOIN documents d ON d.doc_id = e.vec_id
         |  WHERE d.lang IS NOT NULL AND d.lang = 'zh'),
         |cent AS (${centSql("sub")}),
         |q AS (SELECT embedding FROM embeddings WHERE vec_id = 7),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2)
         |SELECT s.vec_id, ${cosSql("s.embedding", "q.embedding")} AS score
         |FROM sub s JOIN probes p ON s.label = p.label CROSS JOIN q
         |WHERE s.vec_id <> 7
         |ORDER BY score DESC, s.vec_id ASC LIMIT 5""".stripMargin,

    "ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT embedding, bucket FROM b WHERE vec_id = 3)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM b e CROSS JOIN q
         |WHERE e.vec_id <> 3 AND e.bucket = q.bucket
         |ORDER BY score DESC, e.vec_id ASC LIMIT 5""".stripMargin,

    "recall_multiprobe" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS q_vec,
         |  ${bucketSql("embedding")} AS q_bucket FROM embeddings WHERE vec_id <= 4),
         |b AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |exact AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
         |  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.q_id) WHERE rnk <= 10),
         |a0 AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
         |  FROM b e CROSS JOIN qs q
         |  WHERE e.vec_id <> q.q_id AND e.bucket = q.q_bucket) WHERE rnk <= 10),
         |a1 AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
         |  FROM b e CROSS JOIN qs q
         |  WHERE e.vec_id <> q.q_id AND bit_count(xor(e.bucket, q.q_bucket)) <= 1) WHERE rnk <= 10),
         |h0 AS (SELECT a0.q_id, count(*) AS n FROM a0 JOIN exact USING (q_id, vec_id) GROUP BY 1),
         |h1 AS (SELECT a1.q_id, count(*) AS n FROM a1 JOIN exact USING (q_id, vec_id) GROUP BY 1)
         |SELECT q.q_id, CAST(coalesce(h0.n, 0) AS BIGINT) AS n_hit_single,
         |  CAST(coalesce(h1.n, 0) AS BIGINT) AS n_hit_multi
         |FROM qs q LEFT JOIN h0 ON h0.q_id = q.q_id LEFT JOIN h1 ON h1.q_id = q.q_id""".stripMargin,

    "ann_lsh_multiprobe" ->
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT embedding, bucket FROM b WHERE vec_id = 3)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM b e CROSS JOIN q
         |WHERE e.vec_id <> 3 AND bit_count(xor(e.bucket, q.bucket)) <= 1
         |ORDER BY score DESC, e.vec_id ASC LIMIT 5""".stripMargin,

    // A31b: the same 1-flip Hamming-ball replay with the plane constants
    // derived at d=2048 over the wide CTE (the dot products and the sign
    // tests are sequential double accumulation in both engines)
    "ann_lsh_multiprobe_2048" ->
      s"""WITH wide AS MATERIALIZED (
         |  SELECT vec_id, $wideDuck AS embedding FROM embeddings),
         |b AS (SELECT vec_id, embedding,
         |  ${DuckDialect.bucketSql("embedding", NumPlanes, WideDims)} AS bucket FROM wide),
         |q AS (SELECT embedding, bucket FROM b WHERE vec_id = 3)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM b e CROSS JOIN q
         |WHERE e.vec_id <> 3 AND bit_count(xor(e.bucket, q.bucket)) <= 1
         |ORDER BY score DESC, e.vec_id ASC LIMIT 5""".stripMargin,

    // A50: the composition replay — attribute derivation (the JSONL
    // synthesis collapsed to its attr projection), class predicate, wide
    // vectors, exact prefilter top-10 per class (the saturated walk is
    // exact, so parse → embed slot → persisted index → filtered serve
    // must land on these rows bit-for-bit)
    "acorn_pipeline_e2e" -> {
      def clsSql(cls: String, qid: Long, pred: String) =
        s"""$cls AS (SELECT '$cls' AS cls, e.vec_id, ${l2Sql("e.w", "q.w")} AS score
           |  FROM wide e JOIN attrs a USING (vec_id)
           |  CROSS JOIN (SELECT w FROM wide WHERE vec_id = $qid) q
           |  WHERE $pred
           |  ORDER BY score ASC, e.vec_id ASC LIMIT 10)""".stripMargin
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS w FROM embeddings),
         |attrs AS (SELECT doc_id AS vec_id,
         |  CASE WHEN doc_id % 5 <> 0 THEN coalesce(source, 'unknown') END AS brand,
         |  coalesce(lang, 'und') AS color,
         |  2000 + doc_id % 25 AS model_year
         |  FROM documents),
         |${clsSql("c1", 3L, "a.brand IS NOT NULL AND a.brand = 'src1'")},
         |${clsSql("c2", 11L, "a.color IS NOT NULL AND a.color = 'zh'")},
         |${clsSql("c3", 17L, "a.model_year IS NOT NULL AND a.model_year <= 2010")}
         |SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c3""".stripMargin
    },

    // A50c: the composition replay per (class, strategy) — `pre` is the
    // exact prefilter top-10 from raw documents (attribute derivation +
    // predicate + wide vectors); `acorn` asserts the SAME rows (the
    // saturated persisted walk is exact — walk ≡ scan is the gate);
    // `post` replays the deterministic top-50-then-filter funnel
    "acorn_pipeline_e2e_2048" -> {
      val classes = Seq(
        ("c1", 3L, "a.brand IS NOT NULL AND a.brand = 'src1'"),
        ("c2", 11L, "a.color IS NOT NULL AND a.color = 'zh'"),
        ("c3", 17L, "a.model_year IS NOT NULL AND a.model_year <= 2010"))
      val classCtes = classes.map { case (cls, qid, pred) =>
        s"""pre_$cls AS (SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
           |  FROM wide e JOIN attrs a USING (vec_id)
           |  CROSS JOIN (SELECT w FROM wide WHERE vec_id = $qid) q
           |  WHERE $pred
           |  ORDER BY score ASC, e.vec_id ASC LIMIT 10),
           |cand_$cls AS (SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
           |  FROM wide e CROSS JOIN (SELECT w FROM wide WHERE vec_id = $qid) q
           |  ORDER BY score ASC, e.vec_id ASC LIMIT 50),
           |post_$cls AS (SELECT c.vec_id, c.score FROM cand_$cls c
           |  JOIN attrs a USING (vec_id)
           |  WHERE $pred
           |  ORDER BY c.score ASC, c.vec_id ASC LIMIT 10)""".stripMargin
      }.mkString(",\n")
      val rows = classes.map { case (cls, _, _) =>
        s"""SELECT '$cls' AS cls, 'pre' AS strategy, vec_id, score FROM pre_$cls
           |UNION ALL
           |SELECT '$cls' AS cls, 'acorn' AS strategy, vec_id, score FROM pre_$cls
           |UNION ALL
           |SELECT '$cls' AS cls, 'post' AS strategy, vec_id, score FROM post_$cls"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS w FROM embeddings),
         |attrs AS (SELECT doc_id AS vec_id,
         |  CASE WHEN doc_id % 5 <> 0 THEN coalesce(source, 'unknown') END AS brand,
         |  coalesce(lang, 'und') AS color,
         |  2000 + doc_id % 25 AS model_year
         |  FROM documents),
         |$classCtes
         |$rows""".stripMargin
    },

    "recall_eval" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id <= 4),
         |exact AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
         |  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.q_id) WHERE rnk <= 10),
         |cent AS (${centSql("embeddings")}),
         |probes AS (SELECT q_id, label FROM (
         |  SELECT q.q_id, c.label,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("c.cent", "q.q_vec")} DESC, c.label ASC) AS pr
         |  FROM cent c CROSS JOIN qs q) WHERE pr <= 2),
         |approx AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
         |  FROM embeddings e
         |  JOIN probes p ON e.label = p.label
         |  JOIN qs q ON q.q_id = p.q_id
         |  WHERE e.vec_id <> q.q_id) WHERE rnk <= 10)
         |SELECT q.q_id, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
         |FROM qs q LEFT JOIN (
         |  SELECT a.q_id, count(*) AS n_hit
         |  FROM approx a JOIN exact x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
         |  GROUP BY a.q_id) h ON q.q_id = h.q_id""".stripMargin,

    // integer-exact mirror: quantize → integer floor-mean centroid →
    // squared-L2 in quantized units (all-BIGINT, no fp accumulation order)
    "embedding_drift" ->
      s"""WITH ed AS (SELECT d.source, ${DuckDialect.quantizeVec("e.embedding")} AS q
         |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
         |cnts AS (SELECT source, count(*) AS cnt FROM ed GROUP BY source),
         |comp AS (SELECT ed.source AS source, dd.dim AS dim, sum(ed.q[dd.dim + 1]) AS sv
         |  FROM ed CROSS JOIN range(64) dd(dim)
         |  GROUP BY ed.source, dd.dim),
         |cent AS (SELECT c.source,
         |    list((sv - ((sv % cnt + cnt) % cnt)) // cnt ORDER BY dim) AS cent
         |  FROM comp c JOIN cnts USING (source) GROUP BY c.source),
         |m AS (SELECT ed.source,
         |    CAST(list_sum(list_transform(range(1, 65),
         |      i -> (ed.q[i] - c.cent[i]) * (ed.q[i] - c.cent[i]))) AS BIGINT) AS dist
         |  FROM ed JOIN cent c USING (source))
         |SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(dist) // count(*) AS BIGINT) AS mean_dist, max(dist) AS max_dist
         |FROM m GROUP BY source""".stripMargin,

    // power method unrolled: center on the integer floor-mean, then
    // [dot → floor-scale → re-project → sign-fix → renormalize]×3, every
    // division the pmod floor identity — bit-identical to Pca.topComponentInt
    "embedding_pca" -> {
      val iterCtes = (1 to 4).map { t =>
        val pv = if (t == 1) "v0" else s"v${t - 1}"
        s"""d$t AS (SELECT c.vec_id, sum(c.c * v.v) AS dot
           |  FROM c JOIN $pv v USING (dim) GROUP BY c.vec_id),
           |f$t AS (SELECT vec_id,
           |  (dot - ((dot % 10000 + 10000) % 10000)) // 10000 AS fd FROM d$t),
           |w$t AS (SELECT c.dim, sum(c.c * f.fd) AS w
           |  FROM c JOIN f$t f USING (vec_id) GROUP BY c.dim),
           |p$t AS (SELECT CASE WHEN w < 0 THEN -1 ELSE 1 END AS sg,
           |    greatest(abs(w) // 10000, 1) AS g
           |  FROM w$t ORDER BY abs(w) DESC, dim LIMIT 1),
           |v$t AS (SELECT dim,
           |    ((w * sg) - (((w * sg) % g + g) % g)) // g AS v FROM w$t, p$t)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH q AS (SELECT vec_id, ${DuckDialect.quantizeVec("embedding")} AS q
         |  FROM embeddings),
         |qd AS (SELECT vec_id, CAST(i AS BIGINT) AS dim, q[i + 1] AS x
         |  FROM q, range(64) r(i)),
         |mm AS (SELECT dim, sum(x) AS sx, count(*) AS n FROM qd GROUP BY dim),
         |mf AS (SELECT dim, (sx - ((sx % n + n) % n)) // n AS m FROM mm),
         |c AS (SELECT vec_id, qd.dim, qd.x - mf.m AS c FROM qd JOIN mf USING (dim)),
         |v0 AS (SELECT CAST(i AS BIGINT) AS dim, 10000 AS v FROM range(64) r(i)),
         |$iterCtes
         |SELECT dim, CAST(v AS BIGINT) AS loading FROM v4""".stripMargin
    },

    // integer-exact Lloyd's replayed as unrolled per-iteration CTEs:
    // quantize → seeds (k lowest ids) → [assign → floor-mean centroid]×3 →
    // probe 3 by integer squared L2 → exact integer search over members
    "knn_ivf_trained" -> {
      val k = 10; val iters = 3; val np = 3
      def dsq(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      s"""WITH ed AS (SELECT vec_id, $qz AS q FROM embeddings WHERE vec_id <> 7),
         |qq AS (SELECT $qz AS q FROM embeddings WHERE vec_id = 7),
         |${DuckDialect.lloydChain(k, iters)},
         |probes AS (SELECT cl FROM (
         |  SELECT c.cl, row_number() OVER (ORDER BY ${dsq("c.cent", "q.q")} ASC, c.cl ASC) AS rn
         |  FROM c$iters c CROSS JOIN qq q) WHERE rn <= $np)
         |SELECT e.vec_id, ${dsq("e.q", "q.q")} AS score
         |FROM ed e JOIN af USING (vec_id) JOIN probes p ON af.cl = p.cl CROSS JOIN qq q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // A14d: same Lloyd chain as A14c; the probe CTE ranks by the HNSW
    // score contract (floor(sqrt(d²)·10⁴+0.5), ties lower label) because
    // that is the ranking the engine's graph walk actually returns
    "knn_ivf_hnsw" -> {
      val k = 10; val iters = 3; val np = 3
      def dsq(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      s"""WITH ed AS (SELECT vec_id, $qz AS q FROM embeddings WHERE vec_id <> 21),
         |qq AS (SELECT $qz AS q FROM embeddings WHERE vec_id = 21),
         |${DuckDialect.lloydChain(k, iters)},
         |probes AS (SELECT cl FROM (
         |  SELECT c.cl, row_number() OVER (ORDER BY
         |      CAST(floor(sqrt(CAST(${dsq("c.cent", "q.q")} AS DOUBLE)) * 10000 + 0.5) AS BIGINT) ASC,
         |      c.cl ASC) AS rn
         |  FROM c$iters c CROSS JOIN qq q) WHERE rn <= $np)
         |SELECT e.vec_id, ${dsq("e.q", "q.q")} AS score
         |FROM ed e JOIN af USING (vec_id) JOIN probes p ON af.cl = p.cl CROSS JOIN qq q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // A14f: the A14d oracle batched — the Lloyd chain trains on the FULL
    // corpus (queries are indexed; self-hits included), the probe CTE
    // ranks per q_id under the HNSW score contract, the scan joins the
    // (q_id, cl) probe relation, per-query window cuts
    "knn_ivf_hnsw_batch" -> {
      val k = 10; val iters = 3; val np = 3
      def dsq(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, 65), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      s"""WITH ed AS (SELECT vec_id, $qz AS q FROM embeddings),
         |qs AS (SELECT vec_id AS q_id, $qz AS q FROM embeddings WHERE vec_id < 8),
         |${DuckDialect.lloydChain(k, iters)},
         |probes AS (SELECT q_id, cl FROM (
         |  SELECT qs.q_id, c.cl, row_number() OVER (PARTITION BY qs.q_id ORDER BY
         |      CAST(floor(sqrt(CAST(${dsq("c.cent", "qs.q")} AS DOUBLE)) * 10000 + 0.5) AS BIGINT) ASC,
         |      c.cl ASC) AS rn
         |  FROM c$iters c CROSS JOIN qs) WHERE rn <= $np),
         |scored AS (SELECT qs.q_id, e.vec_id, ${dsq("e.q", "qs.q")} AS score
         |  FROM ed e JOIN af USING (vec_id)
         |  JOIN probes p ON af.cl = p.cl
         |  JOIN qs ON qs.q_id = p.q_id)
         |SELECT q_id, vec_id, rank, score FROM (
         |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM scored)
         |WHERE rank <= $k""".stripMargin
    },

    // A14e: the A14d oracle with the Lloyd chain, probe ranking, and scan
    // re-derived over the wide frame (lloydChain at dims=2048); ed is
    // MATERIALIZED — the chain references it once per iteration
    "knn_ivf_hnsw_2048" -> {
      val k = 10; val iters = 3; val np = 3; val dims = 2048
      def dsq(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS embedding FROM embeddings),
         |ed AS MATERIALIZED (SELECT vec_id, $qz AS q FROM wide WHERE vec_id <> 21),
         |qq AS (SELECT $qz AS q FROM wide WHERE vec_id = 21),
         |${DuckDialect.lloydChain(k, iters, dims)},
         |probes AS (SELECT cl FROM (
         |  SELECT c.cl, row_number() OVER (ORDER BY
         |      CAST(floor(sqrt(CAST(${dsq("c.cent", "q.q")} AS DOUBLE)) * 10000 + 0.5) AS BIGINT) ASC,
         |      c.cl ASC) AS rn
         |  FROM c$iters c CROSS JOIN qq q) WHERE rn <= $np)
         |SELECT e.vec_id, ${dsq("e.q", "q.q")} AS score
         |FROM ed e JOIN af USING (vec_id) JOIN probes p ON af.cl = p.cl CROSS JOIN qq q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin
    },

    // A14g: the A14f batch oracle with the Lloyd chain, per-query probe
    // windows, and pruned scan re-derived over the wide frame (lloydChain
    // at dims=2048); wide/ed MATERIALIZED — the chain references ed once
    // per iteration, and qs reuses ed's quantization (the batch trains on
    // the full corpus, so every query row is already in ed)
    "knn_ivf_hnsw_batch_2048" -> {
      val k = 10; val iters = 3; val np = 3; val dims = 2048
      def dsq(a: String, b: String) =
        s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
      val qz = DuckDialect.quantizeVec("embedding")
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS embedding FROM embeddings),
         |ed AS MATERIALIZED (SELECT vec_id, $qz AS q FROM wide),
         |qs AS MATERIALIZED (SELECT vec_id AS q_id, q FROM ed WHERE vec_id < 8),
         |${DuckDialect.lloydChain(k, iters, dims)},
         |probes AS (SELECT q_id, cl FROM (
         |  SELECT qs.q_id, c.cl, row_number() OVER (PARTITION BY qs.q_id ORDER BY
         |      CAST(floor(sqrt(CAST(${dsq("c.cent", "qs.q")} AS DOUBLE)) * 10000 + 0.5) AS BIGINT) ASC,
         |      c.cl ASC) AS rn
         |  FROM c$iters c CROSS JOIN qs) WHERE rn <= $np),
         |scored AS (SELECT qs.q_id, e.vec_id, ${dsq("e.q", "qs.q")} AS score
         |  FROM ed e JOIN af USING (vec_id)
         |  JOIN probes p ON af.cl = p.cl
         |  JOIN qs ON qs.q_id = p.q_id)
         |SELECT q_id, vec_id, rank, score FROM (
         |  SELECT q_id, vec_id, CAST(row_number() OVER (PARTITION BY q_id
         |    ORDER BY score ASC, vec_id ASC) AS BIGINT) AS rank, score FROM scored)
         |WHERE rank <= $k""".stripMargin
    },

    "ivf_split_hot" -> splitHotOracleSql("embeddings", ""),

    // A33b: the same replay over the wide CTEs (wl = wide frame + label)
    "ivf_split_hot_2048" -> splitHotOracleSql("wl", wideLabeledCtes),

    "knn_ivf_append" -> {
      def l2s(a: String, b: String) =
        s"CAST(floor(list_distance(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"
      s"""WITH cent AS (${centSql(s"(SELECT * FROM embeddings WHERE vec_id < $IvfAppendSplit)")}),
         |a AS (SELECT e.vec_id, c.label, ${l2s("e.embedding", "c.cent")} AS d,
         |  row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${l2s("e.embedding", "c.cent")} ASC, c.label ASC) AS rn
         |  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id >= $IvfAppendSplit)
         |SELECT vec_id, CAST(label AS BIGINT) AS label, d FROM a WHERE rn = 1""".stripMargin
    },

    // A30b: the A30 assignment CTEs + per-cluster drift stats, the
    // integer threshold verdict, and the dispatch — served_mean re-scores
    // every member against the verdict-chosen centroid (fresh over
    // base ∪ arrivals when rebuilt, stale otherwise). Sums CAST to
    // BIGINT (DuckDB sums BIGINT into HUGEINT); all cuts integer.
    // Pre-validated standalone in python/duckdb at sf0.001/sf0.01
    // (6/10 and 5/10 clusters rebuild — both arms fire).
    "ivf_drift_rebuild" -> driftRebuildOracleSql("embeddings", 64, ""),

    // A30c: the same replay over the derived-wide frame — `wl` carries
    // (vec_id, label, 2048-slot embedding), centSql at dims=2048
    "ivf_drift_rebuild_2048" -> driftRebuildOracleSql("wl", 2048,
      wideLabeledCtes),

    // A30d: the A30 assignment replay over the wide frame — centroids of
    // the wide base (centSql at dims=2048), per-arrival argmin under the
    // same (scaled-L2 asc, label asc) contract
    "knn_ivf_append_2048" -> {
      def l2s(a: String, b: String) =
        s"CAST(floor(list_distance(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) * 10000 + 0.5) AS BIGINT)"
      s"""WITH ${wideLabeledCtes}cent AS MATERIALIZED (${DuckDialect.centSql(s"(SELECT * FROM wl WHERE vec_id < $IvfAppendSplit)", 2048)}),
         |a AS (SELECT e.vec_id, c.label, ${l2s("e.embedding", "c.cent")} AS d,
         |  row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY ${l2s("e.embedding", "c.cent")} ASC, c.label ASC) AS rn
         |  FROM wl e CROSS JOIN cent c WHERE e.vec_id >= $IvfAppendSplit)
         |SELECT vec_id, CAST(label AS BIGINT) AS label, d FROM a WHERE rn = 1""".stripMargin
    },

    "recall_probe_sweep" -> {
      val sweep = Seq(1, 2, 4, 8)
      val perNp = sweep.map { np =>
        s"""SELECT CAST($np AS BIGINT) AS n_probe, q.q_id, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
           |FROM qs q LEFT JOIN (
           |  SELECT a.q_id, count(*) AS n_hit
           |  FROM (SELECT q_id, vec_id FROM (
           |    SELECT q.q_id, e.vec_id,
           |      row_number() OVER (PARTITION BY q.q_id
           |        ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
           |    FROM embeddings e
           |    JOIN pr p ON e.label = p.label AND p.pr <= $np
           |    JOIN qs q ON q.q_id = p.q_id
           |    WHERE e.vec_id <> q.q_id) WHERE rnk <= 10) a
           |  JOIN exact x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
           |  GROUP BY a.q_id) h ON q.q_id = h.q_id""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id <= 4),
         |exact AS (SELECT q_id, vec_id FROM (
         |  SELECT q.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("e.embedding", "q.q_vec")} DESC, e.vec_id ASC) AS rnk
         |  FROM embeddings e CROSS JOIN qs q WHERE e.vec_id <> q.q_id) WHERE rnk <= 10),
         |cent AS (${centSql("embeddings")}),
         |pr AS (
         |  SELECT q.q_id, c.label,
         |    row_number() OVER (PARTITION BY q.q_id
         |      ORDER BY ${cosSql("c.cent", "q.q_vec")} DESC, c.label ASC) AS pr
         |  FROM cent c CROSS JOIN qs q)
         |$perNp""".stripMargin
    },

    "recall_filtered" -> {
      val preds = Seq(
        ("class1_selective",
          "d.lang IS NOT NULL AND d.lang = 'zh' AND d.n_chars IS NOT NULL AND d.n_chars < 150"),
        ("class2_mid", "d.lang IS NOT NULL AND d.lang = 'zh'"),
        ("class3_broad", "d.n_chars IS NOT NULL AND d.n_chars <= 400"))
      val classCtes = preds.zipWithIndex.map { case ((_, p), i) =>
        s"""exact$i AS (
           |  SELECT e.vec_id FROM e JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
           |  WHERE $p ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id ASC LIMIT 10),
           |post$i AS (
           |  SELECT c.vec_id FROM cand c JOIN documents d ON d.doc_id = c.vec_id
           |  WHERE $p ORDER BY c.score DESC, c.vec_id ASC LIMIT 10),
           |hyb$i AS (
           |  SELECT e.vec_id FROM e JOIN probes pr ON e.label = pr.label
           |  JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
           |  WHERE $p ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id ASC LIMIT 10)"""
          .stripMargin
      }.mkString(",\n")
      val rows = preds.zipWithIndex.flatMap { case ((cls, _), i) =>
        Seq(
          s"""SELECT '$cls' AS cls, 'post' AS strategy,
             |  (SELECT count(*) FROM post$i) AS n_ret,
             |  (SELECT count(*) FROM post$i JOIN exact$i USING (vec_id)) AS n_hit""".stripMargin,
          s"""SELECT '$cls' AS cls, 'hybrid' AS strategy,
             |  (SELECT count(*) FROM hyb$i) AS n_ret,
             |  (SELECT count(*) FROM hyb$i JOIN exact$i USING (vec_id)) AS n_hit""".stripMargin)
      }.mkString("\nUNION ALL\n")
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 11),
         |e AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id <> 11),
         |cand AS (
         |  SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |  FROM e CROSS JOIN q ORDER BY score DESC, e.vec_id ASC LIMIT 50),
         |cent AS (${centSql("e")}),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2),
         |$classCtes
         |$rows""".stripMargin
    },

    "clustered_probe" ->
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 4),
         |cent AS (${centSql("embeddings")}),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e JOIN probes p ON e.label = p.label CROSS JOIN q
         |WHERE e.vec_id <> 4
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // A14h: the CONSUMER oracle for the clustered layout — every CTE
    // reads the persisted artifacts, not the source table: `lay` is the
    // hive-partitioned layout itself (the directory names ARE the
    // cluster column), `meta` the sidecar, `ok` the consumer's contract
    // gate (exactly one row, the expected vintage, the expected
    // partition column — a bad sidecar empties it and the serve returns
    // zero rows), and the probe ranking replays from the layout's rows
    "clustered_probe_consumer" ->
      s"""WITH lay AS MATERIALIZED (
         |  SELECT CAST(label AS BIGINT) AS label, vec_id, embedding
         |  FROM read_parquet('$ClusteredConsumerPath/label=*/*.parquet',
         |                    hive_partitioning = 1)),
         |meta AS (SELECT * FROM read_parquet('$ClusteredConsumerPath/_graft_meta/*.parquet')),
         |ok AS (SELECT 1 AS ok WHERE (SELECT count(*) FROM meta) = 1
         |  AND (SELECT count(*) FROM meta
         |       WHERE schema_version = ${Ivf.SchemaVersion}
         |         AND cluster_col = 'label') = 1),
         |q AS (SELECT embedding FROM lay WHERE vec_id = 6),
         |cent AS (SELECT label, CAST(list(cv ORDER BY dim) AS FLOAT[]) AS cent FROM (
         |    SELECT l.label AS label, d.dim AS dim,
         |           avg(CAST(l.embedding[d.dim + 1] AS DOUBLE)) AS cv
         |    FROM lay l CROSS JOIN range(64) d(dim)
         |    GROUP BY l.label, d.dim)
         |  GROUP BY label),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM lay e JOIN probes p ON e.label = p.label CROSS JOIN q CROSS JOIN ok
         |WHERE e.vec_id <> 6
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "hybrid_knn_adaptive" ->
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 3),
         |cent AS (${centSql("embeddings")}),
         |ranked AS (
         |  SELECT c.label AS label, row_number() OVER (
         |    ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC) AS pr
         |  FROM cent c CROSS JOIN q),
         |nc AS (SELECT count(*) AS n FROM cent),
         |nps AS (
         |  SELECT DISTINCT LEAST(p.v, nc.n) AS np
         |  FROM (SELECT unnest([1,2,4,8,16,32,64,128,256,512,1024,2048,4096,
         |                       8192,16384,32768,65536]) AS v) p CROSS JOIN nc),
         |surv AS (
         |  SELECT n.np AS np, count(*) AS cnt
         |  FROM nps n JOIN ranked r ON r.pr <= n.np
         |  JOIN embeddings e ON e.label = r.label
         |  JOIN documents d ON d.doc_id = e.vec_id
         |  WHERE d.lang IS NOT NULL AND d.lang = 'fr' AND d.doc_id <> 3
         |  GROUP BY n.np),
         |chosen AS (
         |  SELECT COALESCE((SELECT min(np) FROM surv WHERE cnt >= 10),
         |                  (SELECT max(np) FROM nps)) AS np)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e JOIN ranked r ON e.label = r.label CROSS JOIN chosen ch
         |JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
         |WHERE r.pr <= ch.np AND d.lang IS NOT NULL AND d.lang = 'fr' AND d.doc_id <> 3
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "selectivity_classes" ->
      """WITH m AS (SELECT
        |  CAST(sum(CASE WHEN lang IS NOT NULL AND lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS m1,
        |  CAST(sum(CASE WHEN source IS NOT NULL AND position('src1' IN source) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
        |  CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
        |  CAST(sum(CASE WHEN n_chars IS NOT NULL AND n_chars < 120 THEN 1 ELSE 0 END) AS BIGINT) AS m4,
        |  count(*) AS total FROM documents),
        |u AS (
        |  SELECT 'lang_en' AS pred, m1 AS n_match, total FROM m
        |  UNION ALL SELECT 'src1_substr', m2, total FROM m
        |  UNION ALL SELECT 'nchars_lt200', m3, total FROM m
        |  UNION ALL SELECT 'nchars_lt120', m4, total FROM m)
        |SELECT pred, n_match, (n_match * 1000000) // total AS sel,
        |  CASE WHEN (n_match * 1000000) // total >= 300000 THEN 'class3_broad'
        |       WHEN (n_match * 1000000) // total >= 50000 THEN 'class2_mid'
        |       ELSE 'class1_selective' END AS cls
        |FROM u""".stripMargin,

    "sql_knn" ->
      s"""SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 9) q
         |WHERE e.vec_id <> 9 ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // probe ordering mirrors the driver-side index scoring: RAW double
    // cosine (not the scaled form) over the float centroid table, ties to
    // the lower cluster id — AnnIndexRegistry.probedClusters' exact order
    "sql_knn_indexed" ->
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 9),
         |cent AS (${centSql("embeddings")}),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY list_cosine_similarity(CAST(c.cent AS DOUBLE[]),
         |    CAST(q.embedding AS DOUBLE[])) DESC, c.label ASC
         |  LIMIT 2)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e JOIN probes p ON e.label = p.label CROSS JOIN q
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    // probe ordering mirrors probedClusters(byCosine=false): raw double L2
    // ascending over the float centroids, ties to the lower cluster id
    "sql_knn_indexed_l2" ->
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 6),
         |cent AS (${centSql("embeddings")}),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY list_distance(CAST(c.cent AS DOUBLE[]),
         |    CAST(q.embedding AS DOUBLE[])) ASC, c.label ASC
         |  LIMIT 2)
         |SELECT e.vec_id,
         |  CAST(floor(list_distance(CAST(e.embedding AS DOUBLE[]),
         |    CAST(q.embedding AS DOUBLE[])) * 10000 + 0.5) AS BIGINT) AS score
         |FROM embeddings e JOIN probes p ON e.label = p.label CROSS JOIN q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    "listings_parse" ->
      """WITH rows AS (
        |  SELECT 'img_' || doc_id || '_0' AS image_id, doc_id, source, lang, n_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT 'img_' || doc_id || '_1', doc_id, source, lang, n_chars
        |  FROM documents WHERE doc_id % 3 <> 0)
        |SELECT image_id,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE coalesce(source, 'unknown') END AS brand,
        |  coalesce(lang, 'und') AS color,
        |  2000 + doc_id % 25 AS model_year,
        |  coalesce(n_chars, 0) AS item_weight,
        |  'C' || (doc_id % 7) AS country
        |FROM rows""".stripMargin,

    "metadata_parse" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE event_type = 'purchase'
        |  AND json_extract_string(props, '$.k') IS NOT NULL""".stripMargin,

    // saturating-beam HNSW over every partition returns the exact top-k
    "knn_hnsw" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 7) q
         |WHERE e.vec_id <> 7 ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // saturated ACORN walk == exact pre-filter result
    "hybrid_knn_hnsw" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 11) q
         |WHERE e.vec_id <> 11
         |  AND d.lang IS NOT NULL AND d.lang = 'zh'
         |  AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // A35g: the saturated two-hop walk is exact under the same sweep
    // guarantee (the flag changes budget-bound traversal order only), so
    // the class-1 prefilter replays it at query id 17
    "hybrid_knn_hnsw_2hop" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 17) q
         |WHERE e.vec_id <> 17
         |  AND d.lang IS NOT NULL AND d.lang = 'zh'
         |  AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // persisted restore+search == fresh build+search == exact at the
    // saturating beam (exact at any sf); self-hit included (no exclusion)
    "knn_hnsw_persisted" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 13) q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // the 2048-d construction replayed with integer index/multiplier
    // arithmetic + one float cast — bit-identical in both engines; then
    // the standard L2 convention over the wide vectors, self excluded
    "knn_exact_l2_2048" ->
      s"""WITH wide AS (SELECT vec_id, $wideDuck AS w FROM embeddings)
         |SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
         |FROM wide e CROSS JOIN (SELECT w FROM wide WHERE vec_id = 0) q
         |WHERE e.vec_id <> 0 ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // saturated persisted-graph walk at 2048-d == exact; self-hits
    // included (query id 13 is an indexed item)
    "knn_hnsw_2048" ->
      s"""WITH wide AS (SELECT vec_id, $wideDuck AS w FROM embeddings)
         |SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
         |FROM wide e CROSS JOIN (SELECT w FROM wide WHERE vec_id = 13) q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // A45c: saturated ACORN walk at 2048-d == exact pre-filter result
    // over the wide vectors (self excluded, the A35b convention)
    "hybrid_knn_hnsw_2048" ->
      s"""WITH wide AS (SELECT vec_id, $wideDuck AS w FROM embeddings)
         |SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
         |FROM wide e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT w FROM wide WHERE vec_id = 11) q
         |WHERE e.vec_id <> 11
         |  AND d.lang IS NOT NULL AND d.lang = 'zh'
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // A45d: the saturated two-hop walk at width is exact under the same
    // sweep guarantee, so the class-1 wide prefilter replays it
    "hybrid_knn_hnsw_2hop_2048" ->
      s"""WITH wide AS (SELECT vec_id, $wideDuck AS w FROM embeddings)
         |SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
         |FROM wide e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT w FROM wide WHERE vec_id = 17) q
         |WHERE e.vec_id <> 17
         |  AND d.lang IS NOT NULL AND d.lang = 'zh'
         |  AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // appended index == fresh full build == exact at the saturating beam
    "knn_hnsw_append" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 2) q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // saturated ACORN over the persisted index == exact pre-filter result
    // (no self-exclusion: query id 11 is an indexed item; the predicate
    // decides whether it appears, identically on both sides)
    "hybrid_knn_hnsw_persisted" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 11) q
         |WHERE d.lang IS NOT NULL AND d.lang = 'zh'
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // batch-served persisted graphs == per-query exact at the saturating
    // beam; self-hits included
    "knn_hnsw_batch" ->
      s"""SELECT q_id, vec_id, rank, score FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${l2Sql("e.embedding", "q.embedding")} ASC, e.vec_id ASC) AS BIGINT) AS rank,
         |    ${l2Sql("e.embedding", "q.embedding")} AS score
         |  FROM embeddings e CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id <= 4) q
         |) WHERE rank <= 3""".stripMargin,

    // A35i: batch-served persisted WIDE graphs == per-query exact over
    // the wide vectors at the saturating beam; self-hits included
    "knn_hnsw_batch_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS w FROM embeddings)
         |SELECT q_id, vec_id, rank, score FROM (
         |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         |    CAST(row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${l2Sql("e.w", "q.w")} ASC, e.vec_id ASC) AS BIGINT) AS rank,
         |    ${l2Sql("e.w", "q.w")} AS score
         |  FROM wide e CROSS JOIN (SELECT vec_id, w FROM wide WHERE vec_id <= 4) q
         |) WHERE rank <= 3""".stripMargin,

    // A49: saturated persisted-graph walk at width == exact over the
    // wide vectors; the qs CTE derives the external midpoint ((w0+w1)/2,
    // one float round per component — the A47c derivation at |Q|=1) and
    // there is NO self-exclusion: an external query has no corpus row
    "knn_hnsw_external_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS w FROM embeddings),
         |q AS (SELECT list_transform(range(1, ${WideDims + 1}),
         |    i -> CAST(CAST(((CAST(a.w AS DOUBLE[]))[i] + (CAST(b.w AS DOUBLE[]))[i]) * 0.5 AS FLOAT) AS DOUBLE)) AS w
         |  FROM wide a JOIN wide b ON a.vec_id = 0 AND b.vec_id = 1)
         |SELECT e.vec_id, ${l2Sql("e.w", "q.w")} AS score
         |FROM wide e CROSS JOIN q
         |ORDER BY score ASC, e.vec_id ASC LIMIT 10""".stripMargin,

    // A51: the two-hop budget curve's literal floors — the oracle
    // asserts the measured knee (tri-scale min − margin, SURVEY §8r);
    // a `gain` row below its floor means the bridge LOST recall at
    // equal budget
    "recall_hnsw_2hop" ->
      """SELECT CAST(budget AS BIGINT) AS budget, mode,
        |  CAST(n_hit_floor AS BIGINT) AS n_hit_floor
        |FROM (VALUES
        |  (4, 'one', 0), (4, 'two', 0), (4, 'gain', 0),
        |  (8, 'one', 0), (8, 'two', 0), (8, 'gain', 0),
        |  (16, 'one', 1), (16, 'two', 1), (16, 'gain', 0),
        |  (32, 'one', 2), (32, 'two', 2), (32, 'gain', 0),
        |  (64, 'one', 4), (64, 'two', 4), (64, 'gain', 0)
        |) t(budget, mode, n_hit_floor)""".stripMargin,

    // A51b: the wide curve's literal floors — re-measured AT the d=2048
    // configuration (§8s); the grid happens to coincide with the d=64
    // knee, but it is its own measurement, not a copy
    "recall_hnsw_2hop_2048" ->
      """SELECT CAST(budget AS BIGINT) AS budget, mode,
        |  CAST(n_hit_floor AS BIGINT) AS n_hit_floor
        |FROM (VALUES
        |  (4, 'one', 0), (4, 'two', 0), (4, 'gain', 0),
        |  (8, 'one', 0), (8, 'two', 0), (8, 'gain', 0),
        |  (16, 'one', 1), (16, 'two', 1), (16, 'gain', 0),
        |  (32, 'one', 2), (32, 'two', 2), (32, 'gain', 0),
        |  (64, 'one', 4), (64, 'two', 4), (64, 'gain', 0)
        |) t(budget, mode, n_hit_floor)""".stripMargin,

    // A50b: the capstone recall row's literal floors (A35h convention)
    "acorn_pipeline_recall" ->
      """SELECT cls, CAST(n_hit_floor AS BIGINT) AS n_hit_floor
        |FROM (VALUES ('c1', 48), ('c2', 58), ('c3', 55)
        |) t(cls, n_hit_floor)""".stripMargin,

    // A50d: the pipeline matrix's literal floors — acorn cells are the
    // A50b measurement (same configuration); post cells measured
    // tri-scale over the parsed pass sets (§8t)
    "acorn_pipeline_recall_2048" ->
      """SELECT cls, strategy, CAST(n_hit_floor AS BIGINT) AS n_hit_floor
        |FROM (VALUES
        |  ('c1', 'acorn', 48), ('c1', 'post', 68),
        |  ('c2', 'acorn', 58), ('c2', 'post', 76),
        |  ('c3', 'acorn', 55), ('c3', 'post', 76)
        |) t(cls, strategy, n_hit_floor)""".stripMargin,

    // attribute-specific graph: membership (attr present) AND the
    // query-time predicate both apply; saturated walk == exact
    "attr_specific_knn_hnsw" ->
      s"""SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM embeddings e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 9) q
         |WHERE e.vec_id <> 9
         |  AND d.n_chars IS NOT NULL
         |  AND d.n_chars <= 400
         |  AND d.lang IS NOT NULL AND position('e' IN d.lang) > 0
         |ORDER BY score ASC, e.vec_id ASC LIMIT 3""".stripMargin,

    // the oracle asserts the recall FLOOR: the engine emits
    // least(n_hit, floor), so equality holds iff measured recall ≥ floor —
    // a realistic-beam regression turns this row red (r5 verdict #1)
    "recall_hnsw_beam" ->
      """SELECT cls, strategy, CAST(floor AS BIGINT) AS n_hit_floor FROM (VALUES
        |  ('c1', 'beam', 76), ('c1', 'acorn', 50), ('c1', 'post', 68),
        |  ('c2', 'beam', 76), ('c2', 'acorn', 56), ('c2', 'post', 76),
        |  ('c3', 'beam', 76), ('c3', 'acorn', 52), ('c3', 'post', 76)
        |) AS t(cls, strategy, floor)""".stripMargin,

    // A48: the width matrix's floors — same least(n_hit, floor) contract,
    // measured over the d=2048 persisted graphs (SURVEY §8q)
    "recall_hnsw_beam_2048" ->
      """SELECT cls, strategy, CAST(floor AS BIGINT) AS n_hit_floor FROM (VALUES
        |  ('c1', 'beam', 76), ('c1', 'acorn', 48), ('c1', 'post', 68),
        |  ('c2', 'beam', 76), ('c2', 'acorn', 58), ('c2', 'post', 76),
        |  ('c3', 'beam', 76), ('c3', 'acorn', 56), ('c3', 'post', 76)
        |) AS t(cls, strategy, floor)""".stripMargin,

    // the 'acorn' row ASSERTS perfect filtered recall (n_hit = n_ret =
    // |exact|); the 'post' row is computed honestly and collapses
    "recall_hnsw_filtered" ->
      s"""WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 11),
         |e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 11),
         |exact AS (
         |  SELECT e.vec_id FROM e JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
         |  WHERE d.lang IS NOT NULL AND d.lang = 'zh'
         |    AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |  ORDER BY ${l2Sql("e.embedding", "q.embedding")} ASC, e.vec_id ASC LIMIT 10),
         |cand AS (
         |  SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |  FROM e CROSS JOIN q ORDER BY score ASC, e.vec_id ASC LIMIT 50),
         |post AS (
         |  SELECT c.vec_id FROM cand c JOIN documents d ON d.doc_id = c.vec_id
         |  WHERE d.lang IS NOT NULL AND d.lang = 'zh'
         |    AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |  ORDER BY c.score ASC, c.vec_id ASC LIMIT 10)
         |SELECT 'acorn' AS strategy, (SELECT count(*) FROM exact) AS n_ret,
         |  (SELECT count(*) FROM exact) AS n_hit
         |UNION ALL
         |SELECT 'post' AS strategy, (SELECT count(*) FROM post) AS n_ret,
         |  (SELECT count(*) FROM post JOIN exact USING (vec_id)) AS n_hit""".stripMargin,

    // A13d: the A13b replay with every CTE at width — wide labeled frame,
    // top-50 candidates by wide cosine, per-label 2048-slot centroids,
    // probe-2 by wide cosine; per class the exact/post/hybrid counts are
    // computed honestly on both sides
    "recall_filtered_2048" -> {
      val preds = Seq(
        ("class1_selective",
          "d.lang IS NOT NULL AND d.lang = 'zh' AND d.n_chars IS NOT NULL AND d.n_chars < 150"),
        ("class2_mid", "d.lang IS NOT NULL AND d.lang = 'zh'"),
        ("class3_broad", "d.n_chars IS NOT NULL AND d.n_chars <= 400"))
      val classCtes = preds.zipWithIndex.map { case ((_, p), i) =>
        s"""exact$i AS (
           |  SELECT e.vec_id FROM e JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
           |  WHERE $p ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id ASC LIMIT 10),
           |post$i AS (
           |  SELECT c.vec_id FROM cand c JOIN documents d ON d.doc_id = c.vec_id
           |  WHERE $p ORDER BY c.score DESC, c.vec_id ASC LIMIT 10),
           |hyb$i AS (
           |  SELECT e.vec_id FROM e JOIN probes pr ON e.label = pr.label
           |  JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
           |  WHERE $p ORDER BY ${cosSql("e.embedding", "q.embedding")} DESC, e.vec_id ASC LIMIT 10)"""
          .stripMargin
      }.mkString(",\n")
      val rows = preds.zipWithIndex.flatMap { case ((cls, _), i) =>
        Seq(
          s"""SELECT '$cls' AS cls, 'post' AS strategy,
             |  (SELECT count(*) FROM post$i) AS n_ret,
             |  (SELECT count(*) FROM post$i JOIN exact$i USING (vec_id)) AS n_hit""".stripMargin,
          s"""SELECT '$cls' AS cls, 'hybrid' AS strategy,
             |  (SELECT count(*) FROM hyb$i) AS n_ret,
             |  (SELECT count(*) FROM hyb$i JOIN exact$i USING (vec_id)) AS n_hit""".stripMargin)
      }.mkString("\nUNION ALL\n")
      s"""WITH ${wideLabeledCtes}q AS (SELECT embedding FROM wide WHERE vec_id = 11),
         |e AS MATERIALIZED (SELECT vec_id, embedding, label FROM wl WHERE vec_id <> 11),
         |cand AS (
         |  SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |  FROM e CROSS JOIN q ORDER BY score DESC, e.vec_id ASC LIMIT 50),
         |cent AS (${DuckDialect.centSql("e", WideDims)}),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2),
         |$classCtes
         |$rows""".stripMargin
    },

    // A13e: the A13c replay at width — the 'acorn' row ASSERTS perfect
    // filtered recall over the wide vectors (the saturated wide walk is
    // exact); the 'post' row is computed honestly and collapses
    "recall_hnsw_filtered_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS embedding FROM embeddings),
         |q AS (SELECT embedding FROM wide WHERE vec_id = 11),
         |e AS (SELECT vec_id, embedding FROM wide WHERE vec_id <> 11),
         |exact AS (
         |  SELECT e.vec_id FROM e JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
         |  WHERE d.lang IS NOT NULL AND d.lang = 'zh'
         |    AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |  ORDER BY ${l2Sql("e.embedding", "q.embedding")} ASC, e.vec_id ASC LIMIT 10),
         |cand AS (
         |  SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |  FROM e CROSS JOIN q ORDER BY score ASC, e.vec_id ASC LIMIT 50),
         |post AS (
         |  SELECT c.vec_id FROM cand c JOIN documents d ON d.doc_id = c.vec_id
         |  WHERE d.lang IS NOT NULL AND d.lang = 'zh'
         |    AND d.n_chars IS NOT NULL AND d.n_chars < 150
         |  ORDER BY c.score ASC, c.vec_id ASC LIMIT 10)
         |SELECT 'acorn' AS strategy, (SELECT count(*) FROM exact) AS n_ret,
         |  (SELECT count(*) FROM exact) AS n_hit
         |UNION ALL
         |SELECT 'post' AS strategy, (SELECT count(*) FROM post) AS n_ret,
         |  (SELECT count(*) FROM post JOIN exact USING (vec_id)) AS n_hit""".stripMargin,

    // A11c: the attr_specific_knn replay at width — membership restricts
    // the sub-frame, centroids/probes/scoring all over the 2048 slots
    "attr_specific_knn_2048" ->
      s"""WITH ${wideLabeledCtes}sub AS MATERIALIZED (
         |  SELECT w.vec_id, w.embedding, w.label FROM wl w
         |  JOIN documents d ON d.doc_id = w.vec_id
         |  WHERE d.lang IS NOT NULL AND d.lang = 'zh'),
         |cent AS (${DuckDialect.centSql("sub", WideDims)}),
         |q AS (SELECT embedding FROM wide WHERE vec_id = 7),
         |probes AS (
         |  SELECT c.label FROM cent c CROSS JOIN q
         |  ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC LIMIT 2)
         |SELECT s.vec_id, ${cosSql("s.embedding", "q.embedding")} AS score
         |FROM sub s JOIN probes p ON s.label = p.label CROSS JOIN q
         |WHERE s.vec_id <> 7
         |ORDER BY score DESC, s.vec_id ASC LIMIT 5""".stripMargin,

    // A11d: attribute-specific wide graph — membership (attr present) AND
    // the query-time predicate both apply; the saturated wide walk == exact
    "attr_specific_knn_hnsw_2048" ->
      s"""WITH wide AS MATERIALIZED (SELECT vec_id, $wideDuck AS embedding FROM embeddings)
         |SELECT e.vec_id, ${l2Sql("e.embedding", "q.embedding")} AS score
         |FROM wide e
         |JOIN documents d ON d.doc_id = e.vec_id
         |CROSS JOIN (SELECT embedding FROM wide WHERE vec_id = 9) q
         |WHERE e.vec_id <> 9
         |  AND d.n_chars IS NOT NULL
         |  AND d.n_chars <= 400
         |  AND d.lang IS NOT NULL AND position('e' IN d.lang) > 0
         |ORDER BY score ASC, e.vec_id ASC LIMIT 3""".stripMargin,

    // A10c: the adaptive-widening replay at width — the probe ranking,
    // the per-level survivor counts, the min-sufficient-probe choice, and
    // the final scoring all over the wide labeled frame; the chosen CTE
    // hash-gates the LOOP'S DECISION at d=2048
    "hybrid_knn_adaptive_2048" ->
      s"""WITH ${wideLabeledCtes}q AS (SELECT embedding FROM wide WHERE vec_id = 3),
         |cent AS (${DuckDialect.centSql("wl", WideDims)}),
         |ranked AS (
         |  SELECT c.label AS label, row_number() OVER (
         |    ORDER BY ${cosSql("c.cent", "q.embedding")} DESC, c.label ASC) AS pr
         |  FROM cent c CROSS JOIN q),
         |nc AS (SELECT count(*) AS n FROM cent),
         |nps AS (
         |  SELECT DISTINCT LEAST(p.v, nc.n) AS np
         |  FROM (SELECT unnest([1,2,4,8,16,32,64,128,256,512,1024,2048,4096,
         |                       8192,16384,32768,65536]) AS v) p CROSS JOIN nc),
         |surv AS (
         |  SELECT n.np AS np, count(*) AS cnt
         |  FROM nps n JOIN ranked r ON r.pr <= n.np
         |  JOIN wl e ON e.label = r.label
         |  JOIN documents d ON d.doc_id = e.vec_id
         |  WHERE d.lang IS NOT NULL AND d.lang = 'fr' AND d.doc_id <> 3
         |  GROUP BY n.np),
         |chosen AS (
         |  SELECT COALESCE((SELECT min(np) FROM surv WHERE cnt >= 10),
         |                  (SELECT max(np) FROM nps)) AS np)
         |SELECT e.vec_id, ${cosSql("e.embedding", "q.embedding")} AS score
         |FROM wl e JOIN ranked r ON e.label = r.label CROSS JOIN chosen ch
         |JOIN documents d ON d.doc_id = e.vec_id CROSS JOIN q
         |WHERE r.pr <= ch.np AND d.lang IS NOT NULL AND d.lang = 'fr' AND d.doc_id <> 3
         |ORDER BY score DESC, e.vec_id ASC LIMIT 10""".stripMargin
  )
}
