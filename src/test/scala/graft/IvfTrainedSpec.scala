package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, KMeans, Knn}

/** A14c `knn_ivf_trained`: since r3 the entry is INTEGER-EXACT (quantized
  * Lloyd's via KMeans.fitInt + NearestCentroidLong) and fully
  * oracle-checked at the driver; this spec asserts the composition's
  * internal contracts from an INDEPENDENT reconstruction — the kernel
  * argmin is cross-checked against a declarative crossJoin argmin, and
  * the probed search must equal the exact scan restricted to the probed
  * clusters.
  *
  * The testdata embeddings are near-uniform in 64-d (a query's exact
  * top-10 spreads across ~9 of the 10 intrinsic labels), so NO partition
  * keeps neighbors together and probe-limited recall is inherently modest
  * — the same recall-collapse regime the reference documents for
  * selective filters; recall vs the full exact scan is a sanity floor. */
class IvfTrainedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("trained-IVF search equals exact search restricted to its probed clusters") {
    val entry = SparkEntry.queries("knn_ivf_trained")(spark, dir)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(entry.size == 10)

    // reconstruct the same deterministic index, assigning via a
    // DECLARATIVE crossJoin argmin (not the kernel) — proves the
    // NearestCentroidLong path and the SQL-shaped path agree
    val e = Tables(spark, dir, "embeddings")
    val corpus = e.select("vec_id", "embedding").filter(col("vec_id") =!= 7)
    val (cent, qemb) = KMeans.fitInt(corpus, k = 10, iters = 3)
    val centDf = spark.createDataFrame(
      cent.map { case (c, v) => (c, v.toSeq) }).toDF("cl", "cent")
    val dExpr = graft.functions.sqDistLongSql("q", "cent")
    val assigned = qemb.crossJoin(broadcast(centDf))
      .selectExpr("vec_id", "q", "cl", s"$dExpr AS d")
      .groupBy("vec_id")
      .agg(min_by(col("cl"), struct(col("d"), col("cl"))).as("cluster"))
    val qv = graft.operators.Pq.quantized(e.filter(col("vec_id") === 7))
      .select("q").head.getSeq[Long](0).toArray
    def sqTo(c: Array[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < c.length) { val d = c(i) - qv(i); acc += d * d; i += 1 }
      acc
    }
    val probed = cent.map { case (cl, v) => (cl, sqTo(v)) }
      .sortBy { case (cl, d) => (d, cl) }.take(3).map(_._1)
    val qLit = s"array(${qv.map(v => s"${v}L").mkString(", ")})"
    val expected = qemb.join(assigned, "vec_id")
      .filter(col("cluster").isin(probed: _*))
      .selectExpr("vec_id", graft.functions.sqDistLongSql("q", qLit) + " AS score")
      .orderBy(col("score").asc, col("vec_id").asc).limit(10)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(entry == expected)

    // informational floor vs the FULL exact scan — near-uniform data keeps
    // this low by construction; it must still beat an empty intersection
    val q7 = e.filter(col("vec_id") === 7).select(col("embedding").as("q_vec"))
    val exact = Knn.topK(corpus, q7, 10, Knn.L2)
      .select("vec_id").as[Long].collect().toSet
    val recall = entry.map(_._1).count(exact)
    assert(recall >= 2, s"recall@10 = $recall/10 under probe-3-of-10")
  }

  test("trained clusters are a complete, non-degenerate partition of the corpus") {
    val corpus = Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").filter(col("vec_id") =!= 7)
    val cent = KMeans.fit(spark, corpus, k = 10, iters = 5)
    assert(cent.count() == 10)
    val assigned = KMeans.assign(corpus, cent)
    assert(assigned.count() == corpus.count()) // every vector lands somewhere
    val used = assigned.select(countDistinct("cluster")).as[Long].head
    assert(used >= 2, s"training collapsed to $used cluster(s)")
  }
}
