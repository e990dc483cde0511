package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.StreamingQueries

/** The streaming oracle entries' determinism contracts: each entry runs a
  * REAL streaming query (file source → AvailableNow → memory sink) and must
  * equal its batch mirror over the same files — the property the driver's
  * DuckDB hash gate checks at sf0.01 is asserted here in-process at
  * sf0.001, where the batch mirror is computed with Spark itself. */
class StreamingQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = StreamingQueries.defs(name)(spark, dir)

  test("streaming_cascade_rerank equals the batch cascade funnel row for row") {
    // C71b (r11 verdict next #8): the streamed stage-1 sink reranked
    // downstream through Cascade.rerankShortlist must equal
    // knn_cascade_batch exactly — stream stage-1 ≡ batch stage-1
    // (complete-mode heap over the whole table) and the rerank tail is
    // the same code path by construction; this pins the composition.
    val streamed = run("streaming_cascade_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    val batch = SparkEntry.queries("knn_cascade_batch")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming_pq_serve_external equals the batch ADC ranking over the same external queries") {
    // C66b: external (non-indexed) queries served as a stream must equal
    // the identical batch pipeline — same codes, same adcDistCol, same
    // heap — proving the complete-mode streaming aggregation adds nothing
    import graft.operators.Pq
    val streamed = run("streaming_pq_serve_external").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(streamed.map(_._1).distinct.sorted == (1000L to 1007L),
      "external queries live in the vec_id + 1000 id space")
    assert(streamed.groupBy(_._1).forall(_._2.size == 10))
    val emb = Tables(spark, dir, "embeddings")
    val cbRows = Pq.seededCodebook(emb, 8, 8, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"), cbRows, 8, 8)
    val batch = emb.filter(col("vec_id") < 8)
      .selectExpr("vec_id + 1000 AS q_id",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(x * 1.5D AS FLOAT)) AS ARRAY<DOUBLE>) AS qv")
      .withColumn("one", lit(1))
      .join(broadcast(codes.withColumn("one", lit(1))), "one").drop("one")
      .withColumn("adist", Pq.adcDistCol(cbRows, 8, 8))
      .groupBy("q_id")
      .agg(graft.functions.aggs.topK(col("adist"), col("vec_id"), 10, asc = true).as("hits"))
      .select(col("q_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as("vec_id"), col("hit.score").as("adist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(streamed == batch)
  }

  test("streaming_window equals the batch windowed aggregate") {
    val streamed = run("streaming_window").collect().toSet
    val batch = graft.streaming.EventsStream
      .windowedAggExact(Tables(spark, dir, "events"))
      .select(expr("unix_micros(window_start) div 60000000").as("hour_min"),
        col("event_type"), col("n"), col("sum_cents"))
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming_topk equals the batch per-type top-5 leaderboard") {
    val streamed = run("streaming_topk").collect().toSet
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("event_id").asc)
    val batch = Tables(spark, dir, "events")
      .selectExpr("event_type", "event_id", "CAST(floor(value * 100) AS BIGINT) AS cents")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select("event_type", "rank", "event_id", "cents")
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming_pq_serve equals the batch ADC ranking (knn_pq minus rerank)") {
    import graft.operators.Pq
    val streamed = run("streaming_pq_serve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch mirror: same codebook, same encodeFast codes, same inline ADC
    // distance, per-query rank replayed with a window
    val emb = Tables(spark, dir, "embeddings")
    val cbRows = Pq.seededCodebook(emb, 8, 8, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 8, 8)
    val qs = emb.filter(col("vec_id") < 8)
      .selectExpr("vec_id AS q_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = qs.crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adist", Pq.adcDistCol(cbRows, 8, 8))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 8L).toSet, "every query answered")
    // and the ADC ranking is knn_pq's shortlist stage: the top-10 by adist
    // for q0 must equal searchRerank's shortlist prefix ranked by adist
    assert(streamed.count(_._1 == 0L) == 10)
  }

  test("streaming_pq_serve_2048 equals the batch wide ADC ranking") {
    // C66e: stream ≡ batch at the reference width — same wide codebook,
    // same encodeFast codes, same inline ADC-table projection, per-query
    // rank replayed with a window
    import graft.operators.Pq
    val streamed = run("streaming_pq_serve_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
    val cbRows = Pq.seededCodebook(w, 16, 128, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      w.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 16, 128)
    val win = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = w.filter(col("vec_id") < 8)
      .selectExpr("vec_id AS q_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
      .withColumn("tds", Pq.adcTableCol(cbRows, 16, 128))
      .crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adist", expr(Pq.wideAdistSql(16)).cast("long"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 8L).toSet, "every query answered")
  }

  test("streaming_ivfpq_serve_2048 equals the batch wide probe-restricted ADC ranking") {
    // C66f: stream ≡ batch at width — Ivf.probeBatch replays the probe
    // structs' (scaled-cosine desc, label asc) contract, the same wide
    // codebook/codes/ADC-table machinery ranks only probed members
    import graft.operators.{Ivf, Pq}
    val streamed = run("streaming_ivfpq_serve_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
      .join(Tables(spark, dir, "embeddings").select("vec_id", "label"), "vec_id")
    val cbRows = Pq.seededCodebook(w, 16, 128, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      w.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 16, 128)
      .join(w.selectExpr("vec_id", "CAST(label AS BIGINT) AS label"), "vec_id")
    val qs = w.filter(col("vec_id") < 8)
      .selectExpr("vec_id AS q_id", "embedding AS q_vec",
        "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    val probes = Ivf.probeBatch(Ivf.centroids(w), qs, nProbe = 2)
      .selectExpr("q_id", "CAST(label AS BIGINT) AS label")
    val win = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = qs.drop("q_vec")
      .withColumn("tds", Pq.adcTableCol(cbRows, 16, 128))
      .crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .join(probes, Seq("q_id", "label"))
      .withColumn("adist", expr(Pq.wideAdistSql(16)).cast("long"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 8L).toSet, "every query answered")
  }

  test("streaming_pq_serve_external_2048 equals the batch wide ADC ranking over the same external queries") {
    // C66g: external (non-indexed) wide queries served as a stream must
    // equal the identical batch pipeline — same wide codebook, same
    // derivation (widen-then-scale, one float round), same ADC-table
    // projection, NO self-exclusion
    import graft.operators.Pq
    val streamed = run("streaming_pq_serve_external_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(streamed.map(_._1).distinct.sorted == (1000L to 1007L),
      "external queries live in the vec_id + 1000 id space")
    assert(streamed.groupBy(_._1).forall(_._2.size == 10))
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
    val cbRows = Pq.seededCodebook(w, 16, 128, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      w.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 16, 128)
    val win = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = w.filter(col("vec_id") < 8)
      .selectExpr("vec_id + 1000 AS q_id",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(x * 1.5D AS FLOAT)) AS ARRAY<DOUBLE>) AS qv")
      .withColumn("tds", Pq.adcTableCol(cbRows, 16, 128))
      .crossJoin(codes)
      .withColumn("adist", expr(Pq.wideAdistSql(16)).cast("long"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(streamed == batch)
  }

  test("streaming_ivfpq_serve_external_2048 equals the batch wide probe-restricted external ranking") {
    // C66h: external wide queries through the coarse-quantized serve —
    // Ivf.probeBatch over the DERIVED external vectors replays the probe
    // structs' contract, no self-exclusion anywhere
    import graft.operators.{Ivf, Pq}
    val streamed = run("streaming_ivfpq_serve_external_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(streamed.map(_._1).distinct.sorted == (1000L to 1007L),
      "external queries live in the vec_id + 1000 id space")
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
      .join(Tables(spark, dir, "embeddings").select("vec_id", "label"), "vec_id")
    val cbRows = Pq.seededCodebook(w, 16, 128, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      w.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 16, 128)
      .join(w.selectExpr("vec_id", "CAST(label AS BIGINT) AS label"), "vec_id")
    val qs = w.filter(col("vec_id") < 8)
      .selectExpr("vec_id + 1000 AS q_id",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(x * 1.5D AS FLOAT)) AS ARRAY<FLOAT>) AS q_vec")
      .withColumn("qv", col("q_vec").cast("array<double>"))
    val probes = Ivf.probeBatch(Ivf.centroids(w), qs, nProbe = 2)
      .selectExpr("q_id", "CAST(label AS BIGINT) AS label")
    val win = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = qs.drop("q_vec")
      .withColumn("tds", Pq.adcTableCol(cbRows, 16, 128))
      .crossJoin(codes)
      .join(probes, Seq("q_id", "label"))
      .withColumn("adist", expr(Pq.wideAdistSql(16)).cast("long"))
      .withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(streamed == batch)
  }

  test("adcTableCol lookups equal adcDistCol per (query, candidate) at d=64") {
    // the HOF-projected ADC table and the inlined per-candidate
    // expression are the same arithmetic — every (q, candidate) adist
    // must agree bit-for-bit (the wide serve rides the former, the d=64
    // serves the latter)
    import graft.operators.Pq
    val emb = Tables(spark, dir, "embeddings")
    val cbRows = Pq.seededCodebook(emb, 8, 8, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 8, 8)
    val joined = emb.filter(col("vec_id") < 4)
      .selectExpr("vec_id AS q_id", "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
      .withColumn("tds", Pq.adcTableCol(cbRows, 8, 8))
      .crossJoin(codes)
      .withColumn("a1", expr(Pq.wideAdistSql(8)).cast("long"))
      .withColumn("a2", Pq.adcDistCol(cbRows, 8, 8))
    assert(joined.count() > 0)
    assert(joined.filter(col("a1") =!= col("a2")).count() == 0)
  }

  test("streaming_ivfpq_serve equals the batch probe-restricted ADC ranking") {
    import graft.operators.{Ivf, Pq}
    val streamed = run("streaming_ivfpq_serve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch mirror: Ivf.probeBatch probes per q_id, membership via the
    // label join, then the same inline ADC distance + window rank
    val emb = Tables(spark, dir, "embeddings")
    val cbRows = Pq.seededCodebook(emb, 8, 8, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 8, 8)
      .join(emb.selectExpr("vec_id", "CAST(label AS BIGINT) AS label"), "vec_id")
    val qs = emb.filter(col("vec_id") < 8)
      .selectExpr("vec_id AS q_id", "embedding AS q_vec",
        "CAST(embedding AS ARRAY<DOUBLE>) AS qv")
    val probes = Ivf.probeBatch(Ivf.centroids(emb), qs, nProbe = 2)
      .selectExpr("q_id", "CAST(label AS BIGINT) AS label")
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = qs.drop("q_vec").crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .join(probes, Seq("q_id", "label"))
      .withColumn("adist", Pq.adcDistCol(cbRows, 8, 8))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 8L).toSet, "every query answered")
    // the probe restriction is real: every served id is in its query's
    // probed clusters
    val probedPairs = probes.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val labelOf = emb.selectExpr("vec_id", "CAST(label AS BIGINT) AS label")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    streamed.foreach { case (qid, _, vid, _) =>
      assert(probedPairs.contains((qid, labelOf(vid))),
        s"vec $vid served for q$qid outside its probed clusters")
    }
  }

  test("streaming_ivfpq_serve_external equals the batch external probe-restricted ranking") {
    import graft.operators.{Ivf, Pq}
    val streamed = run("streaming_ivfpq_serve_external").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val emb = Tables(spark, dir, "embeddings")
    val cbRows = Pq.seededCodebook(emb, 8, 8, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val codes = Pq.encodeFast(
      emb.selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 8, 8)
      .join(emb.selectExpr("vec_id", "CAST(label AS BIGINT) AS label"), "vec_id")
    val qs = emb.filter(col("vec_id") < 8)
      .selectExpr("vec_id + 1000 AS q_id",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(x * 1.5D AS FLOAT)) AS ARRAY<FLOAT>) AS q_vec")
      .withColumn("qv", col("q_vec").cast("array<double>"))
    val probes = Ivf.probeBatch(Ivf.centroids(emb), qs, nProbe = 2)
      .selectExpr("q_id", "CAST(label AS BIGINT) AS label")
    val w = Window.partitionBy("q_id").orderBy(col("adist").asc, col("vec_id").asc)
    val batch = qs.drop("q_vec").crossJoin(codes)
      .join(probes, Seq("q_id", "label"))
      .withColumn("adist", Pq.adcDistCol(cbRows, 8, 8))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "rank", "vec_id", "adist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (1000L until 1008L).toSet,
      "external queries must answer in the external id space")
    // no self-exclusion: base row vec_id n is servable for external query
    // n+1000 (the derivation preserves the nearest-neighbor structure)
    assert(streamed.exists { case (qid, _, vid, _) => vid == qid - 1000L },
      "an external query's own base row should be servable")
  }

  test("streaming_cascade_serve_2048 equals the batch wide Hamming ranking; funnel-consistent") {
    val streamed = run("streaming_cascade_serve_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch mirror: same WidenVec→BqPackVec codes, same HammingDistLong,
    // per-q rank via a window
    val vecs = graft.functions.vectors
    val wide = Tables(spark, dir, "embeddings").select(col("vec_id"),
      vecs.widen(col("embedding"), 64, 2048).as("embedding"))
    val codes = wide.select(col("vec_id"), vecs.bqPack(col("embedding"), 64).as("p"))
    val qs = codes.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("p").as("qp"))
    val w = Window.partitionBy("q_id").orderBy(col("ham").asc, col("vec_id").asc)
    val batch = qs.crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("ham", vecs.hammingLong(col("p"), col("qp")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 100)
      .select("q_id", "rank", "vec_id", "ham")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 8L).toSet, "every query answered")
    // funnel consistency: knn_cascade_2048 (qid 3, full-corpus stage-1 at
    // the same width 100) can only return ids from q3's served stage-1
    val served3 = streamed.collect { case (3L, _, vid, _) => vid }
    val funnel = SparkEntry.queries("knn_cascade_2048")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(funnel.subsetOf(served3.toSet),
      "the wide funnel's final top-10 must come from the served stage-1 shortlist")
  }

  test("streaming_cascade_serve_external_2048: external ids, wide derived codes, no exclusion, stream ≡ batch") {
    // C71e: the C71c pin at the reference width — widen, derive
    // (x−0.25, one float round), pack with BqPackVec, Hamming-rank the
    // wide sign-code table, NO self-exclusion
    val vecs = graft.functions.vectors
    val groups = graft.queries.HybridQueries.WideDims / 32
    val streamed = run("streaming_cascade_serve_external_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.map(_._1) == (1000L until 1008L).toSet,
      "external id space: every derived query answered")
    val wide = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
    val codes = wide.select(col("vec_id"), vecs.bqPack(col("embedding"), groups).as("p"))
    val qs = wide.filter(col("vec_id") < 8)
      .selectExpr("vec_id + 1000 AS q_id",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(x - 0.25D AS FLOAT)) AS ARRAY<FLOAT>) AS qe")
      .select(col("q_id"), vecs.bqPack(col("qe"), groups).as("qp"))
    val w = Window.partitionBy("q_id").orderBy(col("ham").asc, col("vec_id").asc)
    val batch = qs.crossJoin(codes)
      .withColumn("ham", vecs.hammingLong(col("p"), col("qp")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 100)
      .select("q_id", "rank", "vec_id", "ham")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    // the wide derivation must flip at least one sign bit, or the
    // external code equals the base row's and the entry pins nothing new
    val flipped = wide.filter(col("vec_id") < 8)
      .select(vecs.bqPack(col("embedding"), groups).as("bp"),
        vecs.bqPack(expr("CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(x - 0.25D AS FLOAT)) AS ARRAY<FLOAT>)"), groups).as("qp"))
      .collect().exists(r => r.getSeq[Long](0) != r.getSeq[Long](1))
    assert(flipped, "x - 0.25 must change at least one wide sign bit")
  }

  test("streaming_hll_rollup equals the batch sketch estimates, state bounded at G*256") {
    import graft.operators.Hll
    val streamed = run("streaming_hll_rollup").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val d = Tables(spark, dir, "documents")
    val batch = Hll.estimate(
        Hll.sketchAgg(Hll.bucketRho(d, "concat('hrm', text)", Seq("source", "lang")),
          Seq("source", "lang")), Seq("source", "lang"))
      .select("source", "lang", "est")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    // the stream's whole state is the register table: ≤ groups·256 rows
    val groups = d.select("source", "lang").distinct().count()
    val stateRows = spark.table("sq_hll_rollup").count()
    assert(stateRows <= groups * 256,
      s"register state $stateRows exceeds groups($groups)*256")
  }

  test("streaming_pq_ingest equals the batch encode of the arriving ids") {
    import graft.operators.Pq
    val streamed = run("streaming_pq_ingest").collect()
      .map(r => (0 to 8).map(r.getLong).toList).toSet
    val emb = Tables(spark, dir, "embeddings")
    val cbRows = Pq.seededCodebook(emb, 8, 8, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val batch = Pq.encodeFast(
      emb.filter(col("vec_id") >= 400)
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 8, 8)
      .collect().map(r => (0 to 8).map(r.getLong).toList).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.forall(_.head >= 400L),
      "only arriving ids are encoded")
  }

  test("streaming_pq_ingest_2048 equals the batch wide encode of the arriving ids") {
    // C58e: the C58c pin at width — same wide codebook, same kernel,
    // arriving rows widened inline in the stream projection
    import graft.operators.Pq
    val streamed = run("streaming_pq_ingest_2048").collect()
      .map(r => (0 to 16).map(r.getLong).toList).toSet
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
    val cbRows = Pq.seededCodebook(w, 16, 128, 64).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
    val batch = Pq.encodeFast(
      w.filter(col("vec_id") >= 400)
        .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v"),
      cbRows, 16, 128)
      .collect().map(r => (0 to 16).map(r.getLong).toList).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.forall(_.head >= 400L),
      "only arriving ids are encoded")
  }

  test("streaming_ivf_ingest_2048 equals the batch wide nearest-centroid assignment") {
    // C58d: the C58 pin at width — wide base centroids, inline widen,
    // one output row per arriving vector
    val streamed = run("streaming_ivf_ingest_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
      .join(Tables(spark, dir, "embeddings").select("vec_id", "label"), "vec_id")
    val cent = graft.operators.Ivf.centroids(w.filter(col("vec_id") < 400))
    val batch = graft.operators.Ivf
      .assignToNearest(w.filter(col("vec_id") >= 400).drop("label"), cent)
      .select(col("vec_id"), col("label").cast("long"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    val arriving = w.filter(col("vec_id") >= 400).count()
    assert(streamed.size.toLong == arriving)
  }

  test("streaming_hnsw_append_2048: streamed wide delta + persisted wide base equals exact") {
    // C58f: the append ≡ fresh ≡ exact identity at width, saturating beam
    val streamed = run("streaming_hnsw_append_2048").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val w = graft.queries.HybridQueries.wideEmbeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qv = w(6L)
    def l2s(a: Array[Float], b: Array[Float]): Long = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      math.floor(math.sqrt(acc) * 10000 + 0.5).toLong
    }
    val expect = w.toSeq.map { case (id, v) => (id, l2s(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    assert(streamed == expect)
  }

  test("streaming_cascade_serve equals the batch Hamming stage-1 ranking") {
    import graft.operators.Cascade
    val streamed = run("streaming_cascade_serve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch mirror: same sign-code projection, same Hamming expression,
    // per-query rank replayed with a window at the heap's tie order
    val codes = Tables(spark, dir, "embeddings").selectExpr("vec_id",
      s"${Cascade.bqHalf("embedding", 0)} AS lo",
      s"${Cascade.bqHalf("embedding", 32)} AS hi")
    val qs = Tables(spark, dir, "embeddings").filter(col("vec_id") < 8)
      .selectExpr("vec_id AS q_id",
        s"${Cascade.bqHalf("embedding", 0)} AS q_lo",
        s"${Cascade.bqHalf("embedding", 32)} AS q_hi")
    val w = Window.partitionBy("q_id").orderBy(col("ham").asc, col("vec_id").asc)
    val batch = qs.crossJoin(codes)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("ham",
        expr("CAST(bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi) AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 100)
      .select("q_id", "rank", "vec_id", "ham")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (0L until 8L).toSet, "every query answered")
    // the emitted shortlist is the funnel's stage-1 cut: 100 per query
    assert(streamed.count(_._1 == 0L) == 100)
  }

  test("streaming_cascade_serve_external: external ids, derived codes, no exclusion, stream ≡ batch") {
    import graft.operators.Cascade
    val streamed = run("streaming_cascade_serve_external").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch mirror: the x−0.25 derivation packed, NO self-exclusion
    val codes = Tables(spark, dir, "embeddings").selectExpr("vec_id",
      s"${Cascade.bqHalf("embedding", 0)} AS lo",
      s"${Cascade.bqHalf("embedding", 32)} AS hi")
    val qs = Tables(spark, dir, "embeddings").filter(col("vec_id") < 8)
      .selectExpr("vec_id + 1000 AS q_id",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(x - 0.25D AS FLOAT)) AS ARRAY<FLOAT>) AS qe")
      .selectExpr("q_id",
        s"${Cascade.bqHalf("qe", 0)} AS q_lo",
        s"${Cascade.bqHalf("qe", 32)} AS q_hi")
    val w = Window.partitionBy("q_id").orderBy(col("ham").asc, col("vec_id").asc)
    val batch = qs.crossJoin(codes)
      .withColumn("ham",
        expr("CAST(bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi) AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 100)
      .select("q_id", "rank", "vec_id", "ham")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(_._1) == (1000L until 1008L).toSet,
      "external id space: every derived query answered")
    // the derivation must actually flip signs somewhere, or the external
    // code would equal the base row's and the entry would pin nothing new
    val flipped = Tables(spark, dir, "embeddings").filter(col("vec_id") < 8)
      .selectExpr(
        s"${Cascade.bqHalf("embedding", 0)} AS base_lo",
        "CAST(transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(x - 0.25D AS FLOAT)) AS ARRAY<FLOAT>) AS qe")
      .selectExpr("base_lo", s"${Cascade.bqHalf("qe", 0)} AS q_lo")
      .collect().exists(r => r.getLong(0) != r.getLong(1))
    assert(flipped, "x - 0.25 must change at least one sign bit")
    // no self-exclusion: the base row may appear in its derived query's
    // shortlist (it is just another candidate)
    assert(streamed.exists { case (q, _, v, _) => q == v + 1000 },
      "the base row should be servable to its own derived external query")
  }

  test("streaming_drift equals the batch integer centroid per source") {
    val streamed = run("streaming_drift").collect().toSet
    val batch = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", s"${graft.functions.quantizeVecSql("embedding")} AS q")
      .join(Tables(spark, dir, "documents").select(col("doc_id"), col("source")),
        col("vec_id") === col("doc_id"))
      .groupBy("source")
      .agg(graft.functions.aggs.vecSumLong(col("q")).as("sv"),
        count(org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .select(col("source"),
        posexplode(expr(graft.functions.floorMeanVecSql("sv", "cnt")))
          .as(Seq("dim", "cmean")))
      .selectExpr("source", "CAST(dim AS BIGINT) AS dim", "cmean")
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming_dedup emits exactly one row per distinct non-null text") {
    val streamed = run("streaming_dedup").collect().map(_.getString(0))
    val expected = Tables(spark, dir, "documents")
      .filter(col("text").isNotNull).select(md5(col("text"))).distinct().count()
    assert(streamed.length == expected)
    assert(streamed.distinct.length == streamed.length)
  }

  test("streaming_ivf_ingest equals the batch nearest-centroid assignment") {
    val streamed = run("streaming_ivf_ingest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val e = Tables(spark, dir, "embeddings")
    val cent = graft.operators.Ivf.centroids(e.filter(col("vec_id") < 400))
    val batch = graft.operators.Ivf
      .assignToNearest(e.filter(col("vec_id") >= 400).drop("label"), cent)
      .select(col("vec_id"), col("label").cast("long"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // stateless append: one output row per arriving vector, none dropped
    val arriving = e.filter(col("vec_id") >= 400).count()
    assert(streamed.size.toLong == arriving)
  }

  test("streaming_join emits exactly the batch interval-join pairs") {
    val streamed = run("streaming_join").collect().toSet
    val ev = Tables(spark, dir, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val batch = c.join(p, expr(
        "user_id = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 1 hour"))
      .select(col("user_id"), col("c_id"), col("p_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming_join_outer: inner matches plus exactly the watermark-closed unmatched") {
    val streamed = run("streaming_join_outer").collect()
    val matched = streamed.filter(r => !r.isNullAt(2))
    val unmatched = streamed.filter(r => r.isNullAt(2))
    assert(matched.nonEmpty && unmatched.nonEmpty)
    // every unmatched click's hour must be closed by the final watermark
    val ev = Tables(spark, dir, "events")
    import org.apache.spark.sql.Row
    val Row(maxC: Long) = ev.filter(col("event_type") === "click")
      .selectExpr("max(unix_micros(ts))").head()
    val Row(maxP: Long) = ev.filter(col("event_type") === "purchase")
      .selectExpr("max(unix_micros(ts))").head()
    val wm = math.min(maxC, maxP) - 60000000L
    val clickUs = ev.filter(col("event_type") === "click")
      .selectExpr("event_id", "unix_micros(ts)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    unmatched.foreach { r =>
      assert(clickUs(r.getLong(1)) + 3600000000L < wm,
        "an unmatched click emitted before its window closed")
    }
    // the matched set equals the inner streaming join's output
    val inner = run("streaming_join").collect().toSet
    assert(matched.toSet == inner)
  }

  test("streaming_sessionize emits every batch session except each user's open last") {
    val streamed = run("streaming_sessionize").collect().toSet
    val w = Window.partitionBy("user_id")
    val batch = graft.queries.PipelineQueries.defs("events_sessionize")(spark, dir)
      .withColumn("last_idx", max("sess_idx").over(w))
      .filter(col("sess_idx") < col("last_idx"))
      .select("user_id", "n_events", "sess_start", "sess_end")
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming_decontaminate equals batch decontaminate (same gate, kernel path)") {
    val streamed = run("streaming_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.queries.CurationQueries.defs("decontaminate")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("CountInSortedSet kernel: interpreted eval == codegen, boundary membership") {
    import spark.implicits._
    val set = Array(3L, 7L, 100L, Long.MaxValue)
    val df = Seq(
      (1L, Seq(3L, 7L, 100L, Long.MaxValue)), // all present
      (2L, Seq(1L, 2L, 4L, 99L, 101L)),       // none
      (3L, Seq(7L, 7L, 7L)),                  // duplicates each counted
      (4L, Seq.empty[Long]),
      (5L, Seq(Long.MinValue, 0L, 3L))
    ).toDF("id", "xs")
    def run() = df.select($"id", graft.functions.sets.countIn($"xs", set).as("n"))
      .as[(Long, Long)].collect().toMap
    val expect = Map(1L -> 4L, 2L -> 0L, 3L -> 3L, 4L -> 0L, 5L -> 1L)
    assert(run() == expect)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == expect)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("streaming_bpe_tokens equals the batch per-source aggregate (same dictionary)") {
    val streamed = run("streaming_bpe_tokens").collect().toSet
    val docs = Tables(spark, dir, "documents")
    val wl = graft.operators.Bpe.wordSymLens(docs, dir)
    val batch = graft.streaming.TokenStream.tokenTotals(docs, wl)
      .select(col("source"), col("n_ws"), col("n_bpe"))
      .collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // every word encodes to ≥1 symbol, so n_bpe ≥ n_ws by construction
    streamed.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"source ${r.getString(0)}: n_bpe < n_ws")
    }
  }
}
