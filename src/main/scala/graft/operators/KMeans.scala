package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** Distributed Lloyd's k-means over an embedding column — the index-build
  * path when no pre-clustering (label) exists (reference: the HNSW build in
  * /root/reference/acorn.py:35 `init_index`; here the "index" is the
  * centroid table + cluster assignment used by graft.operators.Ivf).
  *
  * Scale shape per iteration: one broadcast of the k·d centroid table, one
  * scan computing argmin via the codegen'd L2 kernel, one (cluster, dim)
  * keyed aggregation with map-side partials. Centroids (k·d doubles) are
  * driver-side model state, like MLlib — the DATA never collects.
  *
  * Deterministic: seeds are the k lowest-id vectors; ties in assignment
  * break toward the lower cluster id.
  */
object KMeans {

  /** (cluster: Int, cent: array<float>) — the fitted centroid table. */
  def fit(spark: SparkSession, emb: DataFrame, k: Int, iters: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import spark.implicits._
    var cent = emb.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol)).as[Array[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v) }

    for (_ <- 0 until iters) {
      val centDf = spark.createDataFrame(cent.toIndexedSeq).toDF("cluster", "cent")
      // VecSum partial-aggregates one d-vector per (cluster, partition) —
      // the shuffle carries k·P small arrays, never posexploded n·d rows
      val next = assign(emb, centDf, idCol, vecCol)
        .join(emb, idCol)
        .groupBy("cluster")
        .agg(graft.functions.aggs.vecSum(col(vecCol)).as("vsum"), count(col(vecCol)).as("n"))
        .select(col("cluster"),
          transform(col("vsum"), v => v / col("n")).cast("array<float>").as("cent"))
        .as[(Int, Array[Float])].collect()
      // empty clusters keep their previous centroid
      val updated = next.toMap
      cent = cent.map { case (c, v) => (c, updated.getOrElse(c, v)) }
    }
    spark.createDataFrame(cent.toIndexedSeq).toDF("cluster", "cent")
  }

  /** Nearest-centroid assignment: (idCol, cluster). One broadcast + one
    * scan; `min_by` keeps it a single codegen'd aggregate. */
  def assign(emb: DataFrame, centroids: DataFrame,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(centroids))
      .withColumn("dist", vectors.l2(col(vecCol), col("cent")))
      .groupBy(idCol)
      .agg(min_by(col("cluster"), struct(col("dist"), col("cluster"))).as("cluster"))
}
