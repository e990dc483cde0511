package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, Hll, Hnsw, Ivf, Knn, Pq}

/** Scale dry-run: synthetic 100×-sf corpora generated distributively
  * (range + hash-derived values, no driver materialization), timing the
  * operators whose plans must hold at 100 TB. Not part of the correctness
  * gate — a per-round regression probe for the scale story.
  *
  * Usage: `sbt "runMain graft.ScaleProbe [nVecs] [nDocs]"` (defaults
  * 500k/500k, local[32]).
  */
object ScaleProbe {

  /** Per-probe cache hygiene mirrors Bench: operators cache() intermediates
    * (signature frames, shingle sets) — without clearing, ~20 probes in one
    * 8 GB JVM accumulate cached partitions until the LATER probes measure
    * GC pressure, not their plans (observed: identical early probes stable
    * across runs while later ones inflated 3–8×). */
  private var clearAfter: () => Unit = () => ()
  private def time[A](label: String)(f: => A): (String, Double) = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    clearAfter()
    (label, s)
  }

  def syntheticEmbeddings(spark: SparkSession, n: Long, dims: Int = 64,
                          clusters: Int = 64): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr(s"transform(sequence(0, ${dims - 1}), d -> " +
        s"CAST(pmod(xxhash64(id * $dims + d), 997) / 997.0 AS FLOAT))").as("embedding"),
      pmod(col("id"), lit(clusters)).cast("int").as("label"))

  def syntheticDocs(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("doc_id"),
      // ~40 tokens/doc, zipf-ish vocabulary via nested hash
      expr("""concat_ws(' ', transform(sequence(0, 39), t ->
        concat('w', pmod(xxhash64(id * 40 + t), 5000))))""").as("text"),
      expr("CAST(pmod(xxhash64(id), 5) AS INT)").as("lang_k"),
      pmod(col("id"), lit(997)).as("n_chars"))

  /** Clickstream-shaped events: ~n/40 users, ~30-day span, second
    * resolution — the fan-out and session shapes the C48/C51 probes need. */
  def syntheticEvents(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("event_id"),
      pmod(xxhash64(col("id")), lit(n / 40 max 1L)).as("user_id"),
      (lit(1700000000000000L) +
        pmod(xxhash64(col("id") + 7), lit(2592000L)) * 1000000L).as("us"),
      expr("element_at(array('view', 'click', 'purchase'), " +
        "CAST(pmod(xxhash64(id + 13), 3) AS INT) + 1)").as("event_type"),
      pmod(xxhash64(col("id") + 19), lit(100000L)).as("cents"))

  /** Shared BPE apply-kernel workload (used by both the default and wide
    * probes — one rule list, one pipeline, so the two can't silently
    * desynchronize): n distinct ~11-char words × an 8-rule cascade-heavy
    * merge table in ONE compiled BpeApplyMerges pass. */
  private def bpeApplyKernelProbe(spark: SparkSession, n: Long): Unit = {
    val rules = Seq(("w", "1"), ("w1", "2"), ("1", "0"), ("0", "0"),
      ("2", "3"), ("w", "9"), ("9", "9"), ("w19", "0"))
    spark.range(n).selectExpr(
        "concat('w', CAST(1000000000 + pmod(xxhash64(id), 1000000000) AS STRING)) AS word")
      .selectExpr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1)) AS syms")
      .select(graft.functions.bpe.applyMerges(col("syms"), rules).as("s"))
      .selectExpr("sum(size(s))").collect()
  }

  /** Wide-vector probe at the REFERENCE'S dimensionality: 2048-d ResNet-50
    * embeddings over its 123k-image corpus (vector_embeddings.py:1–135,
    * README §3: 51.35 s single-node HNSW build, 2.4 GB RSS). Answers "do
    * the codegen kernels and the graph build hold at d=2048", which the
    * d=64 gate corpus cannot. `sbt "runMain graft.ScaleProbe wide"`. */
  private def runWide(spark: SparkSession, nVecs: Long): Unit = {
    val dims = 2048
    val embPath = graft.TmpDirs.path("probe_emb2048")
    syntheticEmbeddings(spark, nVecs, dims)
      .write.mode("overwrite").parquet(embPath)
    val e = spark.read.parquet(embPath)
    val q1 = e.filter(col("vec_id") === 7).select(col("embedding").as("q_vec"))
    val results = Seq(
      // brute-force cosine top-10: one narrow codegen'd scan + k-heap
      time("exact_knn_2048")(
        Knn.topK(e.select("vec_id", "embedding"), q1, 10, Knn.Cosine).count()),
      // per-cluster centroid build: (labels×dims) values cross the shuffle
      time("centroids_vecsum_2048")(Ivf.centroids(e).count()),
      // integer Lloyd's: the kernel assignment E-step at full width
      time("kmeans_assign_2048")(graft.operators.KMeans.fitInt(
        e.select("vec_id", "embedding"), k = 16, iters = 1)._1.size),
      // PQ: 16 subspaces × 128 dims, full encode + ADC shortlist + rerank
      time("pq_encode_adc_2048")(graft.operators.Pq.searchRerank(
        e, qid = 7, k = 10, numSub = 16, subDim = 128, numCodes = 64,
        shortlist = 100).count()),
      // r12: the full three-stage funnel at width over the probe corpus —
      // BqPackVec (64-long codes) → Hamming → sq8 → exact cosine; the
      // kernels' 123k-row cost, not just the 2k-row gate corpus
      time("casc_funnel_2048")(graft.operators.Cascade.searchWide(
        e.select("vec_id", "embedding"), qid = 7, stage1 = 100, stage2 = 25,
        k = 10, dims = dims).count()),
      // r13 (A42d at the probe shape): the residual-IVFPQ serving
      // composition — quantize, floor-mean centroids, probe, residual
      // encode of the probed clusters, per-cluster ADC, exact rerank —
      // over 123k×2048-d; the FAISS-default encoding's cost next to the
      // direct-encode pq_encode_adc_2048 row
      time("ivfpq_residual_2048")(graft.operators.Pq.ivfpqResidual(
        e, qid = 7, k = 10, numSub = 16, subDim = 128, numCodes = 16,
        nProbe = 2, shortlist = 100).count()),
      // r14 (A24d at the probe shape): the amortized wide-batch IVF×PQ
      // serving plan — 8 queries, one probed-union encode + one code
      // scan, membership+ADC in a single label-keyed broadcast join —
      // the per-query cost a capacity planner divides by |Q| next to the
      // single-query pq_encode_adc_2048 row
      time("ivfpq_batch8_wide_2048")(graft.operators.Pq.ivfpqBatchWide(
        e, qids = (0L until 8L), k = 10, numSub = 16, subDim = 128,
        numCodes = 64, nProbe = 2, shortlist = 100).count()),
      // the reference's headline: HNSW build+search over the same corpus
      time("hnsw_build_search_2048") {
        val qv = e.filter(col("vec_id") === 7).select("embedding")
          .head.getSeq[Float](0).toArray
        Hnsw.searchPerPartition(
          e.select("vec_id", "embedding").repartition(32, col("vec_id")),
          qv, 10).count()
      }) ++ {
      // the PERSISTED lifecycle at the reference's shape (r5 verdict #6:
      // "restore amortizes" needs a measured number at 123k×2048-d, not
      // just the gate corpus): build→persist once, then restore→serve,
      // batched serve, append-while-serving, and the ACORN filtered walk
      // at realistic constants — the four serving paths a reference user
      // would run against the one on-disk index.
      val qv = e.filter(col("vec_id") === 7).select("embedding")
        .head.getSeq[Float](0).toArray
      val idxPath = graft.TmpDirs.path("probe_hnsw2048")
      Seq(
        time("hnsw_persist_build_2048")(
          Hnsw.buildAndWrite(e.select("vec_id", "embedding"), idxPath,
            dims = dims, numParts = 32)),
        time("hnsw_restore_serve_2048")(
          Hnsw.searchPersisted(spark, idxPath, qv, 10).count()),
        time("hnsw_serve_batch8_2048") {
          val qs = e.filter(col("vec_id") < 8).select("vec_id", "embedding")
            .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
            .sortBy(_._1)
          Hnsw.searchPersistedBatch(spark, idxPath, qs, 10).count()
        },
        time("hnsw_append_serve_2048")(
          Hnsw.searchAppended(spark, idxPath,
            spark.range(nVecs, nVecs + 1000).select(
              col("id").as("vec_id"),
              expr(s"transform(sequence(0, ${dims - 1}), d -> " +
                s"CAST(pmod(xxhash64(id * $dims + d), 997) / 997.0 AS FLOAT))")
                .as("embedding")),
            numParts = 32, qv, 10).count()),
        time("hnsw_filtered_serve_2048")(
          Hnsw.searchFilteredPersisted(spark, idxPath,
            e.filter(col("vec_id") % 10 === 0).select("vec_id"),
            numParts = 32, qv, 10, metaSearch = 100).count())) ++ {
        // A21f at the reference shape: one-time base build+persist, then
        // the incremental add (1000 arrivals encode with the STORED
        // codebook — the add_items maintenance path), then a serve from
        // the appended code table (the serve's rerank pages floats for
        // base ∪ arriving, so an appended row reaching the shortlist
        // reranks like any other). The add should cost ~|arriving|/|base|
        // of the build; the serve reads codes, never re-encodes.
        val pqPath = graft.TmpDirs.path("probe_pq2048")
        val arriving = syntheticEmbeddings(spark, nVecs + 1000, dims)
          .filter(col("vec_id") >= nVecs).select("vec_id", "embedding")
        val full = e.select("vec_id", "embedding").union(arriving)
        Seq(
          time("pq_persist_build_2048")(Pq.buildAndWriteIndex(
            e.select("vec_id", "embedding"), pqPath,
            numSub = 16, subDim = 128, numCodes = 64)),
          time("pq_append_1000_2048")(Pq.appendToIndex(spark, pqPath,
            arriving, numSub = 16, subDim = 128)),
          time("pq_appended_serve_2048")(Pq.searchPersisted(spark,
            pqPath, full, qid = 7, k = 10,
            numSub = 16, subDim = 128, shortlist = 100).count()))
      }
    }
    val results2 = results ++ Seq(
      // r13 (r12 verdict next #7): NN-embed throughput — the
      // IntMlpEmbedModel forward pass (histogram+taps featurize, W1
      // matmul, ReLU, requantize, W2 matmul) over 123k ~500-byte binary
      // payloads through the per-partition batch path. This is the
      // inference-at-ingest cost a capacity planner reads next to
      // casc_funnel_2048: embedding THE corpus is the one pass every
      // multimodal pipeline pays before any index exists.
      time("intmlp_embed_123k") {
        import spark.implicits._
        val media = spark.range(nVecs).selectExpr(
            "id AS media_id",
            "CAST(concat('payload_', CAST(id AS STRING), '_', " +
              "repeat(CAST(pmod(xxhash64(id), 9973) AS STRING), 120)) AS BINARY) AS bytes",
            "'application/x-probe' AS mime",
            "'probe' AS source")
          .as[graft.sources.Multimodal.MediaRecord]
        graft.sources.Multimodal.embedWith(spark, media,
          new graft.sources.Multimodal.IntMlpEmbedModel).count()
      },
      // the r7 BPE kernel at its bench-relevant shape (r7 verdict "next"
      // #3 asks the wide probe to carry this row) — the throughput bound
      // of every tokenizer-apply entry
      time("bpe_apply_kernel_500k")(bpeApplyKernelProbe(spark, 500000)),
      // batched BPE training end-to-end: 8 scan jobs over a 20M-token
      // corpus (500k docs × 40 tokens, 5k-word vocabulary) → 64+ merges
      // (jobs-per-merge ≈ 0.1 vs sequential training's 1.0)
      time("bpe_train_batched_20Mtok")(
        Bpe.trainBatchedMerges(syntheticDocs(spark, 500000)
          .select(col("doc_id"), col("text"))).size))
    val js = results2.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe_wide","n_vecs":$nVecs,"dims":$dims,"sec":$js}""")
  }

  /** Root-cause decomposition of the `kmeans_assign_2048` variance (r10
    * verdict "what's wrong" #1 / next #3): the wide row swung 37–260 s
    * across same-code quiet runs. This mode splits fitInt's cost into its
    * physical steps — raw float scan, the quantize projection, the
    * TakeOrdered init collect, the E-step assign, the E-step vector-sum
    * aggregate — each timed twice in-process with per-step GC-time deltas
    * (the MXBean sum), so the record names WHICH allocation dominates and
    * whether it is GC. `sbt "runMain graft.ScaleProbe kmeansdiag"`. */
  private def runKmeansDiag(spark: SparkSession, nVecs: Long): Unit = {
    val dims = 2048
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def timeGc[A](label: String)(f: => A): (String, Double, Double) = {
      val g0 = gcMs; val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      val g = (gcMs - g0) / 1e3
      spark.catalog.clearCache()
      (label, s, g)
    }
    val embPath = graft.TmpDirs.path("probe_emb2048")
    syntheticEmbeddings(spark, nVecs, dims)
      .write.mode("overwrite").parquet(embPath)
    val e = spark.read.parquet(embPath)
    val emb = e.select("vec_id", "embedding")
    // the HOF form fitInt USED to project (2048 boxed lambda evals + a
    // boxed array per row) vs the QuantizeVec kernel it projects now
    // (one primitive loop + one UnsafeArrayData per row) — timed side by
    // side so the record names the allocation surface, not a guess
    val qembHof = emb.select(col("vec_id"),
      expr(graft.functions.quantizeVecSql("embedding")).as("q"))
    val qemb = emb.select(col("vec_id"),
      graft.functions.vectors.quantize(col("embedding")).as("q"))
    val cent: Seq[(Long, Array[Long])] = qemb.orderBy(col("vec_id").asc)
      .limit(16).select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq
    def steps(tag: String) = Seq(
      // one raw float pass — the floor any scan pays
      timeGc(s"scan_floats$tag")(
        emb.selectExpr("sum(element_at(embedding, 1))").collect()),
      // the quantize transform HOF (the pre-r11 fitInt projection)
      timeGc(s"quantize_hof$tag")(
        qembHof.selectExpr("sum(element_at(q, 1))").collect()),
      // the QuantizeVec kernel (fitInt's projection since r11)
      timeGc(s"quantize_kernel$tag")(
        qemb.selectExpr("sum(element_at(q, 1))").collect()),
      // the init model-state collect (16 × 2048-long rows via TakeOrdered)
      timeGc(s"init_takeordered$tag")(
        qemb.orderBy(col("vec_id").asc).limit(16).select(col("q")).collect()),
      // E-step assign only: quantize + NearestCentroidLong, no vector agg
      timeGc(s"estep_assign$tag")(
        qemb.select(graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"))
          .groupBy("cluster").count().collect()),
      // full E-step: assign + VecSumLong + floor-mean + 16-row collect
      timeGc(s"estep_full$tag")(
        qemb.select(graft.functions.centroids.nearestLong(col("q"), cent)
            .getField("label").as("cluster"), col("q"))
          .groupBy("cluster")
          .agg(graft.functions.aggs.vecSumLong(col("q")).as("sv"), count(lit(1)).as("cnt"))
          .select(col("cluster"),
            expr(graft.functions.floorMeanVecSql("sv", "cnt")).as("cent"))
          .collect()),
      // the undivided operator, as the wide probe times it
      timeGc(s"fitInt_full$tag")(graft.operators.KMeans.fitInt(
        emb, k = 16, iters = 1)._1.size))
    val results = steps("_a") ++ steps("_b")
    val js = results.map { case (k, v, g) =>
      s"""\"$k\":{\"sec\":$v,\"gc_sec\":$g}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"kmeans_diag_2048","n_vecs":$nVecs,"dims":$dims,"steps":$js}""")
  }

  def main(args: Array[String]): Unit = {
    val wide = args.contains("wide")
    val diag = args.contains("kmeansdiag")
    val sized = args.filterNot(a => a == "wide" || a == "kmeansdiag")
    val nVecs = sized.lift(0).map(_.toLong)
      .getOrElse(if (wide || diag) 123000L else 500000L)
    val nDocs = sized.lift(1).map(_.toLong).getOrElse(500000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // NOTE: driver heap cannot be set here in local mode (the JVM is
      // already running) — size it via the launcher (sbt -J-Xmx…)
    Tables.SessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    clearAfter = () => spark.catalog.clearCache()

    if (diag) { runKmeansDiag(spark, nVecs); spark.stop(); return }
    if (wide) { runWide(spark, nVecs); spark.stop(); return }

    val emb = syntheticEmbeddings(spark, nVecs)
    val docs = syntheticDocs(spark, nDocs)
    val nEvents = 4 * nDocs
    emb.write.mode("overwrite").parquet("/root/repo/target/probe/emb")
    docs.write.mode("overwrite").parquet("/root/repo/target/probe/docs")
    syntheticEvents(spark, nEvents)
      .write.mode("overwrite").parquet("/root/repo/target/probe/events")
    val e = spark.read.parquet("/root/repo/target/probe/emb")
    val d = spark.read.parquet("/root/repo/target/probe/docs")
    val ev = spark.read.parquet("/root/repo/target/probe/events")

    val q1 = e.filter(col("vec_id") === 7).select(col("embedding").as("q_vec"))
    val qs = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val meta = d.select(col("doc_id"), col("lang_k"), col("n_chars"))

    // set by the bpe_train_batched_1k_merges row; recorded as its own
    // JSON row so merge depth is diffable across probe records
    var bpe1kDepth = -1.0
    val results = Seq(
      time("exact_knn")(Knn.topK(e.select("vec_id", "embedding"), q1, 10, Knn.Cosine).count()),
      time("batch_knn_8q")(Knn.batchKnn(e.select("vec_id", "embedding"), qs, 10, Knn.Cosine).count()),
      time("centroids_vecsum")(Ivf.centroids(e).count()),
      time("hybrid_batch_8q")(Ivf.hybridBatchKnn(
        e, meta, col("n_chars") < 500, qs, k = 10, nProbe = 4).count()),
      time("simhash_sigs")(Dedup.simhashSignatures(d).count()),
      time("minhash_sigs")(Dedup.minhashSignatures(d, 12).count()),
      // the codegen'd WordShingles kernel: ~38 shingles × nDocs rows out
      // of a pure narrow map — no window, no shuffle
      time("shingle_kernel")(Dedup.shingledExplodedRaw(d).count()),
      // normalized keep-best dedup: one shuffle + partition-only window
      // (sum over an output column — a bare count() lets the optimizer
      // prune the window, timing an empty plan)
      time("keep_best")(Dedup.normalizedKeepBest(d)
        .agg(sum("keep"), sum("keeper")).collect()),
      // boolean-AND keyword retrieval: narrow contains-filter, no shuffle
      time("keyword_and")(
        d.selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') AS tk")
          .filter(expr("array_contains(tk, 'w1') AND array_contains(tk, 'w42')"))
          .count()),
      time("ngram_jaccard_hashed")(
        Dedup.ngramJaccard(d.limit(100000), 800000L, maxDf = Some(64)).count()),
      // PQ: full encode of the corpus + ADC shortlist + rerank (the 32×
      // compressed-scan path — holds iff encode stays one narrow crossJoin)
      time("pq_search")(Pq.searchRerank(e, qid = 7, k = 10,
        numSub = 8, subDim = 8, numCodes = 64, shortlist = 100).count()),
      // A43 three-stage cascade funnel at probe scale: the Hamming stage
      // scans all nVecs 8-byte sign codes, sq8 touches 100 rows, floats 25
      time("cascade_knn")(graft.operators.Cascade.search(
        e.select("vec_id", "embedding"), qid = 7,
        stage1 = 100, stage2 = 25, k = 10).count()),
      // HLL distinct sketch per lang_k — must stay two map-side partial aggs
      time("hll_distinct")(Hll.estimate(Hll.sketchAgg(Hll.bucketRho(
        d.select(col("lang_k"), col("doc_id")),
        "concat('hll', CAST(doc_id AS STRING))", Seq("lang_k")),
        Seq("lang_k")), Seq("lang_k")).count()),
      // BM25 postings: explode-filter-aggregate over the full token stream
      time("bm25_postings")(
        d.selectExpr("doc_id", "filter(split(text, ' '), x -> x != '') AS tk")
          .selectExpr("doc_id", "CAST(size(tk) AS BIGINT) AS dl", "explode(tk) AS tok")
          .filter(col("tok").isin("w1", "w42", "w4999"))
          .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).as("tf")).count()),
      // connected components over 2·nDocs vertices in 4-chains (diameter 3:
      // the convergence-round count, not the edge count, drives cost)
      time("connected_components")(Dedup.connectedComponents(
        spark.range(2 * nDocs).filter(col("id") % 4 =!= 3)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))).count()),
      // star-contraction CC over the propagation worst case: 64-deep
      // chains (propagation would need 64 full-edge-set rounds; star
      // contraction halves chain depth per round → ~6 shrinking rounds)
      time("cc_star_deep_chain")(Dedup.connectedComponentsStar(
        spark.range(2 * nDocs).filter(col("id") % 64 =!= 63)
          .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))).count()),
      // histogram quantile sketch: only (group, bin, count) rows shuffle
      time("quantile_hist")(
        d.select(col("lang_k"), col("n_chars").as("cents"))
          .withColumn("bin", expr("(cents * 256) div 997"))
          .groupBy("lang_k", "bin").agg(count(lit(1)).as("cnt")).count()),
      // passage-level dedup: narrow HOF chunking, one 8-byte-key shuffle
      time("passage_dedup")(Dedup.passageDups(d, chunkTokens = 4).count()),
      // trained-BPE apply at the dictionary-encode scale: nDocs DISTINCT
      // words (≈9–11 chars), an 8-rule cascade-heavy merge table in ONE
      // compiled BpeApplyMerges pass — the r7 hot-spot fix's throughput
      // probe (the interpreted fold chain it replaced pinned one core for
      // >100 min on 1/10 this word count)
      time("bpe_apply_kernel")(bpeApplyKernelProbe(spark, nDocs)),
      // B34d batched BPE training at probe scale: BatchScans(=8) pair-count
      // scan jobs over ~nDocs distinct words yield 64+ merges — the
      // jobs-per-merge probe (sequential training pays 1 job per merge;
      // batched pays scans/merges ≈ 0.1). The kernel re-applies the full
      // flat rule list per scan, so this also exercises cascade re-encode
      // at dictionary scale.
      time("bpe_train_batched_8scans")(
        graft.operators.Bpe.trainBatchedMerges(d.select("doc_id", "text")).size),
      // THOUSAND-merge batched training (r8 verdict next #2: the gate
      // corpus's 31-word vocabulary caps at ~82 merges, so production
      // depth rested on extrapolation): a 20k-word vocabulary trained to
      // ≥1000 merges in ~scans jobs — the row that turns "could train a
      // production tokenizer" into a measurement. poolC widens with the
      // vocabulary (the r7/r8 design note) so batches stay near-full.
      time("bpe_train_batched_1k_merges") {
        val wide = spark.range(100000).select(
          col("id").as("doc_id"),
          expr("""concat_ws(' ', transform(sequence(0, 39), t ->
            concat('w', pmod(xxhash64(id * 40 + t), 20000))))""").as("text"))
        val m = graft.operators.Bpe.trainBatchedMerges(wide,
          scans = 100, batchM = 16, poolC = 256)
        // the measured depth is its own JSON row (appended below) so a
        // shortfall is a REPORTED regression diffable across committed
        // probe records, not a probe abort (r9 ADVICE); 100 scans ×
        // batchM=16 caps at 1600, so ≥1000 needs a ≥62.5% average
        // acceptance rate — warn loudly when the corpus drifts under it
        bpe1kDepth = m.size.toDouble
        if (m.size < 1000) System.err.println(
          s"WARN bpe_train_batched_1k_merges: depth ${m.size} < 1000 in " +
            "100 scans — regression vs the committed probe record")
        m.size
      },
      // z-order write of the full corpus: narrow Morton map + range
      // exchange + in-partition sort — the layout cost a 2-D-box workload
      // amortizes
      time("zorder_write") {
        val zd = d.selectExpr("doc_id % 256 AS u", "n_chars % 256 AS dd")
          .withColumn("zval", expr(graft.operators.ZOrder.zvalExpr("u", "dd", 8)))
        graft.operators.ZOrder.writeZOrdered(
          zd, "zval", "/root/repo/target/probe/zorder", nFiles = 64)
      },
      // multi-probe LSH: 1-flip Hamming ball, still one narrow scan + heap
      time("multiprobe_lsh")(graft.operators.Lsh.multiProbeSearch(
        e.select("vec_id", "embedding"), q1, 10, numPlanes = 8, dims = 64).count()),
      // per-partition HNSW: build 32 partition-local graphs + beam-search
      // each — the high-recall path for near-uniform corpora; build
      // dominates (one-time at ingest in production), so this is the
      // worst-case bound
      time("hnsw_build_search") {
        val qv = e.filter(col("vec_id") === 7).select("embedding")
          .head.getSeq[Float](0).toArray
        graft.operators.Hnsw.searchPerPartition(
          e.select("vec_id", "embedding").repartition(32, col("vec_id")),
          qv, 10).count()
      },
      // integer Lloyd's (the oracle-checkable index build): kernel E-step
      // (narrow) + VecSumLong M-step per iteration
      time("kmeans_int_fit")(graft.operators.KMeans.fitInt(
        e.select("vec_id", "embedding"), k = 16, iters = 3)._1.size),
      // C48 path mining over 4·nDocs events: one user-keyed shuffle for
      // the session windows, per-session in-group sort (bounded by session
      // length, never the corpus), one path-keyed aggregate
      time("path_topk") {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
        val cum = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.withColumn("prev_us", lag(col("us"), 1).over(byUser))
          .withColumn("new_sess", when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
          .withColumn("sess_idx", sum("new_sess").over(cum))
          .groupBy("user_id", "sess_idx")
          .agg(expr("array_join(transform(array_sort(collect_list(" +
            "struct(us, event_id, event_type))), x -> x.event_type), '>')").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path").asc).limit(10).count()
      },
      // C49 Bloom-pruned join: 4096-bit/3-hash filter over the selective
      // dim keys compiled into a narrow bit-test — non-members drop BEFORE
      // the join shuffle (the whole point at fact scale)
      time("bloom_prune_join") {
        val m = 4096
        val dim = spark.range(nEvents / 40 max 1L)
          .filter(col("id") % 5 === 0).select(col("id").as("k"))
        val setBits = dim.select(explode(array((1 to 3).map(sd =>
            pmod(xxhash64(col("k"), lit(sd)), lit(m.toLong))): _*)).as("b"))
          .distinct().collect().map(_.getLong(0))
        val words = new Array[Long](m / 64)
        setBits.foreach(b => words((b / 64).toInt) |= (1L << (b % 64).toInt))
        val wordsLit = s"array(${words.map(w => s"${w}L").mkString(",")})"
        val bitTest = (1 to 3).map { sd =>
          val bit = s"pmod(xxhash64(user_id, $sd), $m)"
          s"((shiftright(element_at($wordsLit, CAST($bit div 64 AS INT) + 1), " +
            s"CAST($bit % 64 AS INT))) & 1) = 1"
        }.mkString(" AND ")
        ev.filter(expr(bitTest))
          .join(dim, col("user_id") === col("k"))
          .agg(count(lit(1)), sum("cents")).collect()
      },
      // C50 count-min sketch: 4 seeded rows × 256 cells — the explode is
      // narrow, the aggregate carries ≤1024 counter rows
      time("cms_cells")(
        ev.select(col("user_id"), explode(expr("sequence(1, 4)")).as("r"))
          .withColumn("cell", pmod(graft.functions.md5Hash60(
            concat(lit("cms"), col("r").cast("string"), lit("_"),
              col("user_id").cast("string"))), lit(256L)))
          .groupBy("r", "cell").agg(count(lit(1)).as("cnt")).count()),
      // C51 bucketed BIG×BIG interval join: hour-bucket equi-keys + 2-way
      // probe explode + residual time predicate — SortMergeJoin fan-out
      // bounded by the bucket width, never a per-user cartesian
      time("attribution_bucketed") {
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"), col("us").as("c_us"))
          .withColumn("bucket", expr("c_us div 3600000000"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
        purchases.select(col("user_id"), col("p_id"), col("p_us"),
            explode(expr("sequence(p_us div 3600000000 - 1, p_us div 3600000000)")).as("bucket"))
          .join(clicks, Seq("user_id", "bucket"))
          .filter(col("c_us") >= col("p_us") - lit(3600000000L) && col("c_us") <= col("p_us"))
          .groupBy("p_id").agg(count(lit(1)).as("n_clicks")).count()
      },
      // C54 snapshot diff by bucket checksums: each side reduces to 256
      // (bucket, count, checksum) rows in one narrow scan + tiny aggregate
      time("table_diff_buckets") {
        def side(perturbed: Boolean) = {
          val base = if (perturbed)
            ev.filter(expr("event_id % 997 != 0"))
              .withColumn("cents", expr(
                "CASE WHEN event_id % 499 = 0 THEN cents + 1 ELSE cents END"))
          else ev
          base.selectExpr("pmod(event_id, 256) AS bucket",
              s"${graft.functions.md5Hash60Sql(
                "concat_ws('|', CAST(event_id AS STRING), CAST(user_id AS STRING), " +
                  "event_type, CAST(cents AS STRING))")} % 1048576 AS h")
            .groupBy("bucket").agg(count(lit(1)).as("n"), sum("h").as("chk"))
        }
        side(perturbed = false).as("a")
          .join(side(perturbed = true).as("b"), Seq("bucket"), "full_outer")
          .filter(!(col("a.n") <=> col("b.n")) || !(col("a.chk") <=> col("b.chk")))
          .count()
      },
      // B24 incremental admission: the arriving half probes the existing
      // half's banded minhash index — the persisted-index ingest path
      time("incremental_minhash")(Dedup.incrementalMinhash(
        d, splitId = nDocs / 2, numHashes = 12, bands = 4,
        maxBucket = Some(64)).count())
    )
    val js = (results :+ ("bpe_train_batched_1k_depth", bpe1kDepth))
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","n_vecs":$nVecs,"n_docs":$nDocs,"sec":$js}""")
    spark.stop()
  }
}
