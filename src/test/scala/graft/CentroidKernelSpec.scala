package graft

import org.apache.spark.sql.functions._
import graft.functions.vectors
import graft.operators.{Dedup, Ivf, KMeans}

/** The `NearestCentroid` assignment kernel: bit-equivalence with the
  * crossJoin+argmin form it replaced, the zero-shuffle plan shape, and the
  * reliable-checkpoint switch for iterative operators. */
class CentroidKernelSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables(spark, dir, "embeddings")

  test("kernel assignment equals the crossJoin argmin (labels, distances)") {
    val cent = Ivf.centroids(emb.filter(col("vec_id") < 400)).cache()
    try {
      val kernel = Ivf.assignToNearest(emb.filter(col("vec_id") >= 400), cent)
        .selectExpr("vec_id", "CAST(label AS BIGINT) AS label", "d")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // the r2 form: broadcast crossJoin, quantized distance, argmin with
      // (d, label) tie order — the kernel must reproduce it exactly
      val reference = emb.filter(col("vec_id") >= 400)
        .select("vec_id", "embedding")
        .crossJoin(broadcast(cent))
        .withColumn("d", graft.functions.scaled(
          vectors.l2(col("embedding"), col("cent")), operators.Knn.ScoreDigits))
        .groupBy("vec_id")
        .agg(min_by(struct(col("label"), col("d")), struct(col("d"), col("label"))).as("m"))
        .selectExpr("vec_id", "CAST(m.label AS BIGINT) AS label", "m.d AS d")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(kernel == reference)
      assert(kernel.nonEmpty)
    } finally cent.unpersist()
  }

  test("assignment plan is a narrow projection: no Exchange, no Join") {
    val cent = Ivf.centroids(emb.filter(col("vec_id") < 400))
    val p = Ivf.assignToNearest(emb.filter(col("vec_id") >= 400), cent)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("nearest_centroid"), p.take(2000))
  }

  test("KMeans.fit per-iteration plan shuffles only the M-step aggregate") {
    // fit itself loops; audit the one-iteration frame it builds: kernel
    // E-step + VecSum M-step = exactly one Exchange (the groupBy(cluster))
    val table = emb.orderBy(col("vec_id").asc).limit(4)
      .select(col("embedding")).collect()
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Float](0).toArray) }.toSeq
    val mStep = emb
      .select(graft.functions.centroids.nearest(col("embedding"), table)
        .getField("label").cast("int").as("cluster"), col("embedding"))
      .groupBy("cluster")
      .agg(graft.functions.aggs.vecSum(col("embedding")).as("vsum"))
    val p = mStep.queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange")) == 1, p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("partial_vec_sum"), p.take(3000))
  }

  test("KMeans.assign returns every vector with a valid cluster") {
    val cents = KMeans.fit(spark, emb, k = 4, iters = 2)
    val assigned = KMeans.assign(emb, cents.select(col("cluster"), col("cent")))
    assert(assigned.count() == emb.count())
    val clusters = assigned.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf(Set(0, 1, 2, 3)))
  }

  test("reliable-checkpoint mode produces identical CC fixpoints") {
    import spark.implicits._
    val edges = ((1L to 9L).map(x => (x, x + 1)) ++ Seq((20L, 21L), (21L, 22L)))
      .toDF("a_id", "b_id")
    val localProp = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    val localStar = Dedup.connectedComponentsStar(edges).as[(Long, Long)].collect().toMap
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set(Dedup.ReliableCheckpointConf, "true")
    try {
      val relProp = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
      val relStar = Dedup.connectedComponentsStar(edges).as[(Long, Long)].collect().toMap
      assert(relProp == localProp)
      assert(relStar == localStar)
    } finally {
      spark.conf.unset(Dedup.ReliableCheckpointConf)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckDir))
    }
  }
}
