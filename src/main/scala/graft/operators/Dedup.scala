package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{scaled, vectors}

/** Deduplication operators for training-data pipelines (SURVEY §2 B1–B5).
  *
  * All variants key their shuffles on content-derived values (hash, LSH
  * bucket, shared shingle) — no O(n²) cross joins on the scale path. The
  * shared 60-bit md5 hash (`graft.functions.md5Hash60` SQL form) keeps
  * results reproducible across engines.
  */
object Dedup {

  // Spark SQL dialect fragments (shared with the oracle-generating queries)
  val TokExpr = "filter(split(text, '\\\\s+'), x -> x != '')"
  def hashExpr(v: String) = s"CAST(conv(substring(md5($v), 1, 15), 16, 10) AS BIGINT)"

  val P = 1000000007L
  def minhashA(j: Int): Long = (2654435761L * (j + 1)) % (P - 1) + 1
  def minhashB(j: Int): Long = (40503L * (j + 1) % P) * 2654435761L % P

  /** Eager materialization for the iterative operators (CC rounds, Lloyd's
    * sampling). Default is `localCheckpoint`: executor-local storage —
    * fastest, but NON-REPLICATED and lineage-truncating, so on a real
    * cluster one lost executor kills the job with nothing to recompute
    * from. For the 100 TB path set `spark.graft.checkpoint.reliable=true`
    * (plus `SparkContext.setCheckpointDir` on durable storage): rounds then
    * go through reliable `checkpoint()` and survive executor loss at the
    * cost of a filesystem round-trip per iteration. */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption(ReliableCheckpointConf).contains("true"))
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  val ReliableCheckpointConf = "spark.graft.checkpoint.reliable"

  /** B1: exact dedup by content hash; keeps the smallest id per group. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(idCol).as("keeper"), count(lit(1)).as("n_copies"))

  /** (doc_id, g) distinct 3-gram shingles, exploded. The distinct is
    * per-document by construction, so it runs as a narrow `array_distinct`
    * on the shingle array BEFORE exploding — never a corpus-wide distinct
    * shuffle (the row set is identical: (doc_id, g) pairs are unique). */
  def shingledExploded(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.text.shingles(expr(TokExpr), 3))).as("g"))

  /** Same, WITHOUT the per-doc distinct — for consumers idempotent to
    * duplicate shingles (minhash: min over a multiset == min over its
    * set). Shingling is the codegen'd `WordShingles` kernel + explode: a
    * pure narrow map, NO shuffle. (The earlier posexplode + lead-window
    * form shuffled the fully tokenized corpus by doc_id just to see
    * adjacent tokens; the `transform` lambda form stays narrow but is
    * CodegenFallback — interpreted per element.) */
  def shingledExplodedRaw(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.text.shingles(expr(TokExpr), 3)).as("g"))

  /** B19: normalized exact dedup + canonical keep-best selection — the
    * "fuzzy-exact" stage between B1 (byte-identical) and B2/B3 (near-dup).
    * Case/whitespace/punctuation variants collapse under lower+non-alnum
    * normalization; each group keeps its LONGEST original text (`lenCol`),
    * ties to the smallest id. The argmin rides a single packed BIGINT
    * ((cap−len)·2³² + id) — no engine-specific struct/arg_min tie
    * semantics — through a partition-only window over the normal-form
    * hash: ONE shuffle, one pass, per-doc output in place. (The
    * aggregate+join-back alternative shuffles three times and computes
    * the regex+md5 projection twice — 2.5× slower at the 500k probe; the
    * window's sort is on the shuffle key only, and normalization groups
    * are tiny, so there is no large-partition sort hazard.) Contract:
    * `lenCol` < 10⁶ and ids < 2³² (widen the packing for larger spaces).
    *
    * Returns one row per doc: (doc_id, keeper, n_variants, keep 0/1). */
  def normalizedKeepBest(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id", lenCol: String = "n_chars"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    docs.selectExpr(idCol, lenCol,
        s"md5(trim(regexp_replace(lower($textCol), '[^a-z0-9]+', ' '))) AS h")
      .withColumn("packed",
        expr(s"(1000000L - least($lenCol, 999999L)) * 4294967296L + $idCol"))
      .withColumn("keeper", (min("packed").over(w) % 4294967296L))
      .withColumn("n_variants", count(lit(1)).over(w))
      .selectExpr(idCol, "keeper", "n_variants",
        s"CAST(CASE WHEN $idCol = keeper THEN 1 ELSE 0 END AS BIGINT) AS keep")
  }

  /** B2: pairs with Jaccard(shingles) ≥ tauScaled/10^6. Candidates come
    * from an equi-join on the shingle (superset of any positive-Jaccard
    * pair), so the shuffle is keyed by shingle.
    *
    * `maxDf`: the equi-join emits m²/2 candidate rows for a shingle shared
    * by m docs — one stop-phrase across a billion docs is a quadratic
    * blowup. With a cap, shingles whose document frequency exceeds `maxDf`
    * are dropped from BOTH the intersection and the set sizes (Jaccard over
    * non-stop shingles — the standard similarity-join df-pruning contract);
    * `hotShingles` reports what was dropped. */
  def ngramJaccard(docs: DataFrame, tauScaled: Long, maxDf: Option[Int] = None): DataFrame = {
    // per-doc set semantics come from the narrow array_distinct inside
    // shingledExploded — no corpus-wide distinct shuffle anywhere. Shingles
    // then collapse to the shared 60-bit hash key, so every downstream
    // shuffle (df cap, candidate equi-join) moves 8-byte longs instead of
    // 3-gram strings. Both engines distinct the shingle STRINGS and hash
    // after, counting the same multiset even under (vanishingly rare)
    // 60-bit collisions.
    val all0 = shingledExploded(docs)
      .selectExpr("doc_id", s"${hashExpr("g")} AS g")
    // the df-cap branch consumes `all` twice (df count + anti-join);
    // caching keeps the scan+shingle+hash subtree from recomputing per
    // consumer
    val all = maxDf.fold(all0)(_ => all0.cache())
    val kept = maxDf.fold(all) { cap =>
      // anti-join against the (small, stop-shingle) hot set: the df count
      // partial-aggregates map-side and nothing is sorted — unlike a window
      // count over g, which sorts the full shingle table
      val hot = all.groupBy("g").agg(count(lit(1)).as("_df"))
        .filter(col("_df") > cap).select("g")
      all.join(hot, Seq("g"), "left_anti")
    }
    // cache, not materialize (r18 A/B: checkpointing this cheap-to-derive
    // shingle table measured 2.2 → 2.6 s — the eager write outweighs the
    // shallow consumer plans; the minhash SIGNATURE tables, expensive to
    // recompute, go the other way)
    val exploded = kept.cache()
    val sizes = exploded.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = exploded.as("a")
      .join(exploded.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jac", scaled(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jac") >= tauScaled)
      .select("a_id", "b_id", "jac")
  }

  /** Triage report for `ngramJaccard(maxDf=...)`: the stop-shingles the df
    * cap dropped, with their frequency and a sample carrier doc (pattern:
    * minhash's `bucketClusters`). */
  def hotShingles(docs: DataFrame, maxDf: Int): DataFrame =
    shingledExploded(docs).groupBy("g")
      .agg(count(lit(1)).as("df"), min("doc_id").as("sample_doc"))
      .filter(col("df") > maxDf)

  /** B29: the candidate stage of [[jaccardPrefixJoin]], exposed for plan
    * audit and the spec's pruning measurement. One row per candidate pair
    * (a_id < b_id) that shares a PREFIX shingle. */
  def jaccardPrefixCandidates(docs: DataFrame, tauScaled: Long): DataFrame = {
    val pfx = prefixTokens(shingledExploded(docs)
      .selectExpr("doc_id", s"${hashExpr("g")} AS g"), tauScaled)
    pfx.as("a").join(pfx.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Per-doc PREFIX under the global rare-first (df asc, g asc) shingle
    * order: the first n − ⌈τ·n⌉ + 1 shingles. Prefix-filter lemma
    * (SSJoin/PPJoin): any pair with Jaccard ≥ τ has |a∩b| ≥ ⌈τ·max(na,nb)⌉,
    * and two sets with overlap ≥ t must collide inside their first
    * (n − t + 1)-length prefixes of ANY shared total order — so the
    * candidate equi-join over prefixes alone is LOSSLESS. */
  private def prefixTokens(all: DataFrame, tauScaled: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("g").asc)
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    all.join(all.groupBy("g").agg(count(lit(1)).as("df")), "g")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      // integer-exact ⌈τ·n⌉ = (τ_scaled·n + 10⁶−1) div 10⁶ (all operands ≥ 0)
      .filter(col("rnk") <= col("n") - expr(s"($tauScaled * n + 999999) div 1000000") + 1)
      .select("doc_id", "g")
  }

  /** B29: prefix-filtered Jaccard similarity join — the published scale
    * algorithm for similarity self-joins (SSJoin, Chaudhuri et al. ICDE'06;
    * PPJoin, Xiao et al. WWW'08). B2 joins on EVERY shared shingle, so a
    * doc's candidate fan-out is its full shingle count; here only the
    * n − ⌈τ·n⌉ + 1 RAREST shingles (global df-ascending order) generate
    * candidates — at τ=0.7 that is ~30% of each doc, and the rarest 30%,
    * so hot-shingle quadratic blowup is pruned by ORDER rather than
    * dropped by a df cap. Candidates are then verified with exact Jaccard
    * (array_intersect over per-doc sorted sets), so the result is
    * IDENTICAL to the uncapped all-pairs join — the oracle proves the
    * losslessness. Shuffles: df count + df join key by g (8-byte longs),
    * rank window + set-agg key by doc_id, verify joins key by candidate
    * id — every one on a content-derived key, none quadratic.
    * Reference: acorn.py's predicate-filtered search is the same
    * prune-then-verify contract applied to vectors. */
  def jaccardPrefixJoin(docs: DataFrame, tauScaled: Long): DataFrame = {
    val all = shingledExploded(docs)
      .selectExpr("doc_id", s"${hashExpr("g")} AS g").cache()
    val pfx = prefixTokens(all, tauScaled)
    val cand = pfx.as("a").join(pfx.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val sets = all.groupBy("doc_id")
      .agg(sort_array(collect_set("g")).as("set"), count(lit(1)).as("n"))
    cand
      .join(sets.select(col("doc_id").as("a_id"), col("set").as("sa"), col("n").as("na")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("set").as("sb"), col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jac", scaled(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jac") >= tauScaled)
      .select("a_id", "b_id", "jac")
  }

  /** MinHash signatures: explode shingles, hash once, then `numHashes`
    * permutation minima in ONE codegen'd hash aggregate (map-side partial
    * min, single shuffle keyed by doc_id). */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val minExprs = (0 until numHashes).map { j =>
      s"min((${minhashA(j)}L * h + ${minhashB(j)}L) % $P) AS m$j"
    }
    shingledExplodedRaw(docs)
      .selectExpr("doc_id", s"${hashExpr("g")} % $P AS h")
      .groupBy("doc_id")
      .agg(expr(minExprs.head), minExprs.tail.map(expr): _*)
  }

  /** B3: banded-LSH candidate pairs; shuffle keyed by (band, bucket).
    *
    * `maxBucket`: a duplicate-saturated corpus turns hot buckets into
    * quadratic pair blowups (m²/2 pairs for an m-doc bucket). With a cap,
    * buckets larger than `maxBucket` skip pairwise expansion — use
    * `bucketClusters` (same threshold) to report the skipped buckets
    * wholesale, and `duplicateClusters` for exact-signature groups. */
  def minhashLsh(docs: DataFrame, numHashes: Int, bands: Int,
                 maxBucket: Option[Int] = None): DataFrame =
    pairsFromBanded(bandedSignatures(docs, numHashes, bands).cache(), maxBucket)

  /** Distinct (a_id, b_id) candidate pairs from a banded-signature table,
    * with the optional hot-bucket pair cap. The cap is an anti-join against
    * the (few, over-cap) buckets — the df count partial-aggregates
    * map-side; never a full window sort of the banded table. */
  private def pairsFromBanded(banded: DataFrame, maxBucket: Option[Int]): DataFrame = {
    val joinable = maxBucket.fold(banded) { cap =>
      val hot = banded.groupBy("band", "bkey").agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") > cap).select("band", "bkey")
      banded.join(hot, Seq("band", "bkey"), "left_anti")
    }
    joinable.as("a")
      .join(joinable.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Estimator-quality evaluation for the minhash family — the dedup
    * analogue of the ANN side's `recall_eval`: for every LSH candidate
    * pair, the signature-estimated Jaccard (matching minhash components /
    * numHashes) next to the EXACT shingle-set Jaccard, both as ×10⁶
    * integers (truncating division — no fp rounding boundary in either
    * engine).
    *
    * Scale shape: the signature pipeline is computed ONCE (cached) and
    * feeds both the banded candidate join and the per-pair signature
    * comparison; the exact side is restricted to candidate docs by a
    * broadcast semi-join BEFORE the shingle equi-join, so the expensive
    * all-co-shingled-pairs intersection never materializes — only the
    * (few) candidate pairs' rows do. */
  def minhashEstimate(docs: DataFrame, numHashes: Int, bands: Int,
                      maxBucket: Option[Int] = None,
                      oneBit: Boolean = false): DataFrame = {
    // materialize (not cache) the two shared frames (r18): sigs feeds the
    // banding AND both per-pair signature joins, cand feeds the estimate
    // join AND the exact-verify restriction — with lazy caches every
    // consumer subtree re-enters the cached plan through AQE's stage
    // machinery; checkpointed RDD scans keep the downstream plans shallow
    val sigs = materialize(minhashSignatures(docs, numHashes))
    val cand = materialize(
      pairsFromBanded(bandedFromSigs(sigs, numHashes, bands), maxBucket))

    val matchSum = (0 until numHashes)
      .map(j => s"(CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END)").mkString(" + ")
    // `oneBit`: b-bit minhash (Li & König, WWW 2010, b = 1) — the lowest
    // bit of each permutation minimum, packed into ONE BIGINT per doc, so
    // the whole signature costs numHashes BITS instead of numHashes·64:
    // at 100 TB the packed word is the column a store can always keep
    // resident, and pair similarity is one bit_count(xor). Accidental
    // parity collisions halve the signal, so the estimator debiases via
    // Ĵ = 2·(m/k) − 1 (C = 1/2 for 1 bit), floored at 0 — integer ppm
    // arithmetic end to end, from the SAME cached signatures (one scan).
    def packExpr(side: String) = (0 until numHashes)
      .map(j => s"(($side.m$j % 2) * ${1L << j}L)").mkString(" + ")
    val oneBitCols =
      if (!oneBit) Seq.empty
      else Seq(
        s"CAST($numHashes - bit_count(sa_p ^ sb_p) AS BIGINT) AS n_match1",
        s"greatest(0L, ((2 * ($numHashes - bit_count(sa_p ^ sb_p)) - $numHashes)" +
          s" * 1000000L) div $numHashes) AS est1_jac")
    val pairSel = Seq("a_id", "b_id",
      s"(($matchSum) * 1000000L) div $numHashes AS est_jac") ++
      (if (oneBit) Seq(s"(${packExpr("sa")}) AS sa_p", s"(${packExpr("sb")}) AS sb_p")
       else Seq.empty)
    val est = cand
      .join(sigs.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("b_id") === col("sb.doc_id"))
      .selectExpr(pairSel: _*)
    est.join(exactJaccard(docs, cand), Seq("a_id", "b_id"))
      .selectExpr(Seq("a_id", "b_id", "est_jac", "jac") ++ oneBitCols: _*)
  }

  /** Exact shingle Jaccard per candidate pair (a_id, b_id, jac) — exact
    * shingle sets restricted to candidate docs via broadcast semi-join
    * BEFORE the shingle equi-join, so only the (few) candidate pairs'
    * intersections materialize. Shared by B20/B41/B41b. */
  private def exactJaccard(docs: DataFrame, cand: DataFrame): DataFrame = {
    val inCand = cand.select(col("a_id").as("doc_id"))
      .union(cand.select(col("b_id").as("doc_id"))).distinct()
    val ex = shingledExploded(docs)
      .selectExpr("doc_id", s"${hashExpr("g")} AS g")
      .join(broadcast(inCand), "doc_id").cache()
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = ex.as("x")
      .join(ex.as("y"), col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("inter"))
    cand.select("a_id", "b_id")
      .join(inter, Seq("a_id", "b_id"), "left")
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .selectExpr("a_id", "b_id",
        "(coalesce(inter, 0L) * 1000000L) div (na + nb - coalesce(inter, 0L)) AS jac")
  }

  /** B41b: the b-bit fidelity SWEEP (Li & König 2010's central trade-off,
    * measured the way `lshSweep` measures banding): for each b, chunk
    * every permutation minimum to its lowest b bits, count matching
    * chunks per candidate pair, debias with C = 2⁻ᵇ
    * (Ĵ_b = (m/k − C)/(1 − C), integer ppm, floored at 0), and report
    * the per-b mean/max absolute error against exact shingle Jaccard.
    * ONE signature scan and ONE exact-verification join feed every b —
    * the curve an operator reads before fixing the signature store's
    * bit width (b bits ⇒ 64/b× compression; error shrinks as b grows).
    * All cuts integer-exact, so both engines compute identical rows. */
  def minhashBbitSweep(docs: DataFrame, numHashes: Int, bands: Int,
                      maxBucket: Option[Int], bs: Seq[Int]): DataFrame = {
    // the debias numerator m·10⁶·2ᵇ (m ≤ numHashes) must fit a BIGINT:
    // past maxB Spark would WRAP silently and emit wrong est_b values
    // (DuckDB errors on overflow, so only the engine side is quiet) —
    // r10 ADVICE: bound b by the arithmetic, not just the chunk modulus
    val maxB = 63 - (64 - java.lang.Long.numberOfLeadingZeros(numHashes * 1000000L))
    require(bs.nonEmpty && bs.distinct.size == bs.size &&
        bs.forall(b => b >= 1 && b <= maxB),
      s"bit widths must be distinct, within [1, $maxB], and non-empty, got $bs — " +
        "b = 0 degenerates the debias divisor (2^b - 1) to zero, " +
        s"b > $maxB overflows the debias numerator numHashes·10⁶·2^b " +
        s"(numHashes=$numHashes) and Spark wraps silently, and " +
        "duplicates collide on the est_<b> column names")
    // materialize, not cache — same sharing argument as minhashEstimate
    val sigs = materialize(minhashSignatures(docs, numHashes))
    val cand = materialize(
      pairsFromBanded(bandedFromSigs(sigs, numHashes, bands), maxBucket))
    def estB(b: Int): String = {
      val p = 1L << b
      val m = (0 until numHashes)
        .map(j => s"(CASE WHEN sa.m$j % ${p}L = sb.m$j % ${p}L THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"greatest(0L, ((CAST(($m) AS BIGINT) * 1000000L * ${p}L)" +
        s" div $numHashes - 1000000L) div ${p - 1}L)"
    }
    val perPair = cand
      .join(sigs.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("b_id") === col("sb.doc_id"))
      .selectExpr(Seq("a_id", "b_id") ++ bs.map(b => s"${estB(b)} AS est_$b"): _*)
      .join(exactJaccard(docs, cand), Seq("a_id", "b_id"))
    perPair
      .selectExpr("jac",
        s"stack(${bs.size}, ${bs.map(b => s"${b}L, est_$b").mkString(", ")}) AS (b, est)")
      .groupBy("b")
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(abs(est - jac)) div count(1)").as("mae_ppm"),
        max(abs(col("est") - col("jac"))).as("max_err_ppm"))
  }

  /** (doc_id, band, bkey) banded minhash signatures. */
  def bandedSignatures(docs: DataFrame, numHashes: Int, bands: Int): DataFrame =
    bandedFromSigs(minhashSignatures(docs, numHashes), numHashes, bands)

  /** Band a precomputed (doc_id, m0..m{n-1}) signature table — lets a
    * cached signature pipeline feed banding AND per-pair comparison. */
  def bandedFromSigs(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(bands >= 1 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands); " +
        "otherwise hashes are silently dropped or band keys degenerate to empty")
    val rows = numHashes / bands
    val bandExprs = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => s"m${b * rows + r}").mkString(", ")
      s"$b, concat_ws('_', $cols)"
    }.mkString(", ")
    sigs.selectExpr("doc_id", s"stack($bands, $bandExprs) AS (band, bkey)")
  }

  /** B38: banding-ALLOCATION sweep over one fixed signature budget — the
    * LSH tuning curve (Leskovec-Rajaraman-Ullman MMDS ch.3 s-curve: with
    * n = b·r hashes fixed, the collision threshold sits near (1/b)^(1/r);
    * few wide bands → high precision/low recall, many narrow bands → the
    * reverse). For each allocation: candidate count, exact-verified
    * positives (shingle Jaccard ≥ tauScaled, truncating ppm), precision,
    * and recall vs the union of every allocation's positives (the
    * b = n, r = 1 allocation's candidates are a superset of every other
    * allocation's up to the shared hot-bucket cap, so the union is the
    * discoverable frontier at this budget).
    *
    * Scale shape: the signature table computes ONCE and feeds every
    * allocation's banding (the whole curve costs one shingle scan + one
    * signature aggregate); exact verification joins once against the
    * UNION of candidates, never per-allocation; per-allocation stats are
    * counts over the tagged pair set. What a planner reads before fixing
    * (b, r) at 100 TB — the knob that trades dedup recall against bucket
    * fan-out. */
  def lshBandSweep(docs: DataFrame, numHashes: Int, bandsList: Seq[Int],
                   tauScaled: Long, maxBucket: Int): DataFrame = {
    val sigs = materialize(minhashSignatures(docs, numHashes))
    val all = shingledExploded(docs)
      .selectExpr("doc_id", s"${hashExpr("g")} AS g")
    val sets = all.groupBy("doc_id")
      .agg(sort_array(collect_set("g")).as("set"), count(lit(1)).as("n"))
    // (r18: materializing the 5 allocations' candidate sets concurrently
    // via Par.ordered was A/B-measured and REJECTED — 3.4 → 4.0 s at
    // sf0.1: the eager per-cell checkpoints cost more than the lazy
    // union's AQE stage serialization they replaced)
    val cands = bandsList.map { b =>
      pairsFromBanded(bandedFromSigs(sigs, numHashes, b), Some(maxBucket))
        .withColumn("bands", lit(b.toLong))
    }.reduce(_ unionAll _)
    val uniq = cands.select("a_id", "b_id").distinct()
    val jac0 = uniq
      .join(sets.select(col("doc_id").as("a_id"), col("set").as("sa"), col("n").as("na")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("set").as("sb"), col("n").as("nb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .selectExpr("a_id", "b_id", "(inter * 1000000) div (na + nb - inter) AS jac")
    // the exact-verify table feeds TWO subtrees (the frontier denominator
    // and the per-allocation stats join) — materialize it once (r18)
    // instead of re-paying the shingle-set joins per consumer
    val jac = materialize(jac0)
    val denom = jac.filter(col("jac") >= tauScaled)
      .agg(count(lit(1)).as("n_union_pos"))
    val stats = cands.join(jac, Seq("a_id", "b_id"))
      .groupBy("bands")
      .agg(count(lit(1)).as("n_cand0"),
        sum(when(col("jac") >= tauScaled, 1L).otherwise(0L)).as("n_pos0"))
    // every allocation reports a row, even one whose candidate set is
    // empty at this corpus (the sweep-grid contract)
    val spark = docs.sparkSession
    import spark.implicits._
    bandsList.map(_.toLong).toDF("bands")
      .join(stats, Seq("bands"), "left")
      .selectExpr("bands", s"CAST($numHashes AS BIGINT) div bands AS rows_per_band",
        "coalesce(n_cand0, CAST(0 AS BIGINT)) AS n_cand",
        "CAST(coalesce(n_pos0, 0) AS BIGINT) AS n_pos")
      .crossJoin(broadcast(denom))
      .selectExpr("bands", "rows_per_band", "n_cand", "n_pos",
        "CASE WHEN n_cand = 0 THEN CAST(0 AS BIGINT) ELSE (n_pos * 1000000) div n_cand END AS precision_ppm",
        "CASE WHEN n_union_pos = 0 THEN CAST(0 AS BIGINT) ELSE (n_pos * 1000000) div n_union_pos END AS recall_ppm")
  }

  /** Incremental near-dup ADMISSION — the batch backstop of the lambda
    * dedup contract (streaming.DedupStream's fast path + periodic batch
    * pass): probe an ARRIVING batch against the EXISTING corpus's banded
    * minhash index and report, per arriving doc, its best existing match.
    *
    * At 100 TB the banded signature table of the existing corpus is the
    * PERSISTED index artifact (append-only, partitionable by (band,
    * bkey)); each ingest batch bands only its own docs and joins — the
    * shuffle carries the (small) arriving bands against the bucket-pruned
    * index, and AQE broadcasts the arriving side. `maxBucket` applies the
    * same hot-bucket cap (and triage contract) as `minhashLsh`. Here both
    * sides derive from one corpus scan split on `splitId`, standing in
    * for index-vs-batch. */
  def incrementalMinhash(docs: DataFrame, splitId: Long, numHashes: Int,
                         bands: Int, maxBucket: Option[Int] = None): DataFrame = {
    val banded = bandedSignatures(docs, numHashes, bands).cache()
    val capped = maxBucket.fold(banded) { cap =>
      banded.join(
        banded.groupBy("band", "bkey").agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= cap).drop("_n"),
        Seq("band", "bkey"))
    }
    val ex = capped.filter(col("doc_id") < splitId)
      .select(col("band"), col("bkey"), col("doc_id").as("old_id"))
    val ar = capped.filter(col("doc_id") >= splitId)
      .select(col("band"), col("bkey"), col("doc_id").as("new_id"))
    ar.join(ex, Seq("band", "bkey"))
      .select("new_id", "old_id").distinct()
      .groupBy("new_id")
      .agg(min("old_id").as("dup_of"), count(lit(1)).as("n_matches"))
  }

  /** Exact-duplicate cluster report: docs sharing the FULL minhash
    * signature form one cluster — non-overlapping rows, safe to sum.
    * Returns (sig, n_docs, sample_doc) for clusters ≥ `minSize`. */
  def duplicateClusters(docs: DataFrame, numHashes: Int, minSize: Int): DataFrame = {
    val sigKey = concat_ws("_", (0 until numHashes).map(j => col(s"m$j")): _*)
    minhashSignatures(docs, numHashes)
      .groupBy(sigKey.as("sig"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("sample_doc"))
      .filter(col("n_docs") >= minSize)
  }

  /** The companion report for `minhashLsh(maxBucket=...)`: the hot BAND
    * BUCKETS that pairwise expansion skipped. NEAR-duplicate clusters land
    * here even when their full signatures differ (a band matches with
    * probability j^rows). Rows can overlap across bands — this is a
    * triage report keyed (band, bkey), not a partition of the corpus. */
  def bucketClusters(docs: DataFrame, numHashes: Int, bands: Int, minSize: Int): DataFrame =
    bandedSignatures(docs, numHashes, bands)
      .groupBy("band", "bkey")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("sample_doc"))
      .filter(col("n_docs") >= minSize)

  /** B25: passage-level duplication — sub-document dedup at fixed
    * `chunkTokens`-token granularity (the chunked approximation of exact
    * substring dedup: a repeated span ≥ 2·chunk tokens always shares at
    * least one aligned chunk with its twin). Emits each passage hash that
    * occurs in ≥ 2 distinct documents, with its document frequency,
    * occurrence count, and first carrier — the boilerplate report a
    * curation pipeline subtracts before training.
    *
    * Scale shape: chunking is a narrow HOF map (no tokenized-corpus
    * shuffle — same contract as the WordShingles kernel), then ONE shuffle
    * keyed by the 8-byte passage hash with map-side partial aggregation. */
  def passageDups(docs: DataFrame, chunkTokens: Int): DataFrame =
    docs.selectExpr("doc_id", s"$TokExpr AS tk")
      .filter(size(col("tk")) > 0)
      .selectExpr("doc_id",
        s"""transform(sequence(0, (size(tk) - 1) div $chunkTokens),
           |  i -> array_join(slice(tk, i * $chunkTokens + 1, $chunkTokens), ' ')) AS chunks""".stripMargin)
      .select(col("doc_id"), explode(col("chunks")).as("passage"))
      .selectExpr("doc_id", s"${hashExpr("passage")} AS ph")
      .groupBy("ph")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"),
        min("doc_id").as("first_doc"))
      .filter(col("n_docs") >= 2)

  /** 64-bit SimHash signatures as two 32-bit halves: `lo` (bits 0–31, from
    * md5 hex chars 1–8 of each token) and `hi` (bits 32–63, hex chars 9–16).
    * Two halves keep every intermediate in non-negative BIGINT range — a
    * single 64-bit value needs `1L << 63` = Long.MinValue, which ANSI-mode
    * addition rejects and whose arithmetic shiftright sign-extends in both
    * engines. 64 conditional bit-sums run in ONE codegen'd aggregate. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val bitSums = (0 until 64).map { b =>
      val (src, bit) = if (b < 32) ("h1", b) else ("h2", b - 32)
      s"sum(CASE WHEN (shiftright($src, $bit) & 1) = 1 THEN 1 ELSE -1 END) AS s$b"
    }
    def compose(from: Int): String = (0 until 32).map { b =>
      s"(CASE WHEN s${from + b} > 0 THEN ${1L << b}L ELSE 0L END)"
    }.mkString(" + ")
    docs.selectExpr("doc_id", s"explode($TokExpr) AS tok")
      .selectExpr("doc_id", "md5(tok) AS m")
      .selectExpr("doc_id",
        "CAST(conv(substring(m, 1, 8), 16, 10) AS BIGINT) AS h1",
        "CAST(conv(substring(m, 9, 8), 16, 10) AS BIGINT) AS h2")
      .groupBy("doc_id")
      .agg(expr(bitSums.head), bitSums.tail.map(expr): _*)
      .selectExpr("doc_id", s"${compose(0)} AS lo", s"${compose(32)} AS hi")
  }

  /** B4: pairs with hamming(64-bit simhash) ≤ maxHamming — all-pairs
    * reference form (small corpora / verification). */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sig = simhashSignatures(docs).cache()
    sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        expr("CAST(bit_count(a.lo ^ b.lo) + bit_count(a.hi ^ b.hi) AS BIGINT)").as("ham"))
      .filter(col("ham") <= maxHamming)
  }

  /** Cost-based B4: all-pairs wins while n²/2 comparisons are cheaper than
    * the banded form's extra joins; banded wins asymptotically. Both
    * produce identical results (see simhashPairsBanded), so this is pure
    * physical-plan selection — the same philosophy as Spark's
    * broadcast-vs-shuffle join choice. */
  def simhashPairsAuto(docs: DataFrame, maxHamming: Int,
                       bandedThreshold: Long = 50000L): DataFrame =
    if (docs.count() <= bandedThreshold) simhashPairs(docs, maxHamming)
    else simhashPairsBanded(docs, maxHamming)

  /** B4 at scale: byte-banded simhash pairs, EXACTLY equal to
    * `simhashPairs` for `maxHamming < bands` by pigeonhole — ≤ maxHamming
    * differing bits can touch at most maxHamming of the `bands` disjoint
    * bit ranges, so every true pair collides in ≥ 1 band. The shuffle is
    * keyed by (band, byte value): no O(n²) cross join; candidates are
    * distinct-ed then exact-hamming filtered. Default 8 bands of 8 bits
    * over the 64-bit signature (4 per 32-bit half). */
  def simhashPairsBanded(docs: DataFrame, maxHamming: Int, bands: Int = 8): DataFrame = {
    require(maxHamming < bands,
      s"banded equality needs maxHamming ($maxHamming) < bands ($bands) [pigeonhole]")
    require(bands % 2 == 0 && 32 % (bands / 2) == 0,
      s"bands ($bands) must split the two 32-bit signature halves evenly")
    val halfBands = bands / 2
    val width = 32 / halfBands
    val mask = (1L << width) - 1
    val sig = simhashSignatures(docs).cache()
    val bandExprs = (0 until bands).map { b =>
      val (src, off) = if (b < halfBands) ("lo", b * width) else ("hi", (b - halfBands) * width)
      s"$b, shiftright($src, $off) & ${mask}L"
    }.mkString(", ")
    val banded = sig.selectExpr("doc_id", s"stack($bands, $bandExprs) AS (band, bkey)")
    val candidates = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    candidates
      .join(sig.select(col("doc_id").as("a_id"), col("lo").as("alo"), col("hi").as("ahi")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("lo").as("blo"), col("hi").as("bhi")), "b_id")
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(alo ^ blo) + bit_count(ahi ^ bhi) AS BIGINT)").as("ham"))
      .filter(col("ham") <= maxHamming)
  }

  /** Connected components over an undirected candidate-pair edge list —
    * the step that turns ANY pairwise dedup output (B2–B5) into dedup
    * GROUPS: each doc labeled with the smallest doc id reachable through
    * shared-duplicate edges, so "keep one per cluster" is `WHERE
    * doc_id = cluster`.
    *
    * Iterative min-label propagation: per round, one edge-keyed join + one
    * (vertex)-keyed min aggregate, converging when no label changes — at
    * most `diameter` rounds, and near-dup graphs have tiny, shallow
    * components (a pile of copies is a clique: diameter 1). Every round
    * eagerly materializes via localCheckpoint so lineage stays flat and
    * the convergence count() reuses the same job. At extreme scale the
    * round count can be driven to O(log d) with large-star/small-star
    * (alternating conditional stars); the per-round plan shape is
    * identical, so this is the faithful small-diameter form. */
  def connectedComponents(pairs: DataFrame,
                          aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    // materialize the (possibly expensive) pair pipeline ONCE — a plain
    // union of two selects over it would inline two full copies of the
    // upstream plan and compute the candidate generation twice
    val p0 = materialize(pairs.selectExpr(s"$aCol AS src", s"$bCol AS dst"))
    val sym = p0.union(p0.select(col("dst").as("src"), col("src").as("dst")))
    var labels = materialize(sym.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")))
    // per round: ONE edge-keyed join + ONE vertex min-aggregate — the
    // vertex's own label enters the same aggregate via union, so no
    // second (labels ⋈ update) join is needed. Labels only ever
    // decrease, so the rounds converge exactly when the label sum stops
    // falling; the sum is read off the just-checkpointed result (a
    // near-free scan), replacing the old compare-join + filter-count.
    // Decimal(38) keeps the sum exact at any corpus size.
    def labelSum(l: DataFrame): java.math.BigDecimal =
      Option(l.agg(sum(col("lbl").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val upd = materialize(sym
        .join(labels.select(col("id").as("dst"), col("lbl").as("nl")), "dst")
        .select(col("src").as("id"), col("nl").as("lbl"))
        .union(labels)
        .groupBy("id").agg(min("lbl").as("lbl")))
      val s = labelSum(upd)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = upd
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * the O(log n)-round alternative to `connectedComponents`' min-label
    * propagation, whose round count is the component DIAMETER.
    *
    * Near-dup graphs are usually shallow cliques (diameter 1–2) where the
    * propagation form wins on constant factors; but adversarial corpora
    * produce CHAINS — doc₁≈doc₂≈…≈docₘ under an overlapping-window crawl,
    * each ≈ its neighbor only. There propagation runs m rounds (m shuffles
    * over the full edge set) while star-contraction runs O(log m): each
    * large-star hooks every node above its neighborhood minimum directly
    * onto that minimum, halving chain depth per round; small-star then
    * re-canonicalizes so the next large-star sees the contracted graph.
    *
    * Per round: two (groupBy + join) shuffles keyed by vertex — the same
    * plan shape as one propagation round — over an edge set that only
    * SHRINKS (toward one star edge per non-root vertex), where
    * propagation re-joins the full original edge set every round.
    * Convergence = edge-set fixpoint, checked with ONE aggregate per round
    * — (edge count, Σ xxhash64(u,v)) compared to the previous round's pair
    * (the r2 verdict's single-action convergence; the old form launched a
    * count() AND a left_anti.isEmpty on top of the checkpoint, three
    * driver round-trips per iteration). The checksum is an
    * order-independent sum of 64-bit edge hashes in decimal(38,0): at the
    * true fixpoint upd == edges exactly, and a premature stop would need a
    * colliding hash SUM across consecutive shrinking rounds — negligible
    * against the driver-latency cost the extra jobs charge every round at
    * scale.
    *
    * Contract: vertices appearing ONLY in self-loops are dropped (the
    * dedup pair generators emit a_id < b_id, so none exist there);
    * `connectedComponents` keeps them as singletons. */
  def connectedComponentsStar(pairs: DataFrame,
                              aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    // canonical (hi, lo) form: u > v for every stored edge, no self-loops
    def canon(df: DataFrame): DataFrame = df
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

    // (count, checksum) read off the just-checkpointed frame — near-free
    def edgeStats(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("chk")).head
      (r.getLong(0), Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var edges = materialize(canon(pairs.selectExpr(s"$aCol AS u", s"$bCol AS v")))
    var prev = edgeStats(edges)
    var converged = prev._1 == 0L
    while (!converged) {
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      // large-star: every neighbor v > u links to min(Γ(u) ∪ {u})
      val mAll = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val large = canon(
        sym.filter(col("v") > col("u"))
          .join(mAll, "u")
          .select(col("v").as("u"), col("m").as("v")))
      // small-star: u and every neighbor v < u link to min(Γ⁻(u) ∪ {u});
      // all small neighbors are < u, so the min is just min(v)
      val symL = large.union(large.select(col("v").as("u"), col("u").as("v")))
      val smallNbr = symL.filter(col("v") < col("u"))
      val mSmall = smallNbr.groupBy("u").agg(min("v").as("m"))
      val upd = materialize(canon(
        smallNbr.join(mSmall, "u").select(col("v").as("u"), col("m").as("v"))
          .union(mSmall.select(col("u"), col("m").as("v")))))
      val cur = edgeStats(upd)
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      edges = upd
    }
    // converged edges form stars (node, root); a root's neighbors are all
    // larger, so least(min(v), u) is the component minimum for every node
    val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
    sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u").as("doc_id"), least(col("mv"), col("u")).as("cluster"))
  }

  /** B5: embedding-cosine near-dup pairs ≥ tauScaled/10^4 (exact all-pairs
    * baseline; `embeddingPairsBucketed` is the scale path). */
  def embeddingPairs(emb: DataFrame, tauScaled: Long): DataFrame =
    emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cs", scaled(
        vectors.cosine(col("a.embedding"), col("b.embedding")), Knn.ScoreDigits))
      .filter(col("cs") >= tauScaled)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), col("cs"))

  /** B5 at scale: candidate pairs share a random-hyperplane LSH bucket —
    * shuffle keyed by bucket, never n². APPROXIMATE: a subset of the exact
    * result (P[same bucket] = (1 − θ/π)^planes for angle θ; identical
    * vectors always collide). Fewer planes → higher recall, bigger
    * buckets. */
  def embeddingPairsBucketed(emb: DataFrame, tauScaled: Long,
                             numPlanes: Int, dims: Int): DataFrame = {
    val bucketed = Lsh.withBucket(emb, numPlanes, dims).cache()
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cs", scaled(
        vectors.cosine(col("a.embedding"), col("b.embedding")), Knn.ScoreDigits))
      .filter(col("cs") >= tauScaled)
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"), col("cs"))
  }

  /** Cost/contract dispatch for B5, the analogue of `simhashPairsAuto`.
    * Below `bucketedThreshold` rows the exact all-pairs baseline runs
    * (recall 1.0; n²·d/2 flops is trivial there). Above it the LSH-bucketed
    * path IS the product contract: near-dup candidates must share a
    * deterministic hyperplane bucket — identical vectors always do, a pair
    * at angle θ with probability (1−θ/π)^planes. Unlike simhash's banding
    * (pigeonhole-exact) this switch changes the recall contract, because
    * exact cosine-threshold pairs have no subquadratic form — at corpus
    * scale, cluster-scoped near-dup (SemDeDup-style) is the semantics. */
  def embeddingPairsAuto(emb: DataFrame, tauScaled: Long,
                         numPlanes: Int = 4, dims: Int = 64,
                         bucketedThreshold: Long = 1000L): DataFrame =
    if (emb.count() <= bucketedThreshold) embeddingPairs(emb, tauScaled)
    else embeddingPairsBucketed(emb, tauScaled, numPlanes, dims)
}
