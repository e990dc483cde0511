package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** Random-hyperplane LSH over embedding columns — the bucketed scale path
  * for cosine ANN and embedding near-dup (SURVEY §2 B6).
  *
  * Hyperplanes are DETERMINISTIC: integer weights derived from md5 of
  * "plane_<j>_<d>" (w = md5hash60 mod 2001 − 1000). sign(v·w) is invariant
  * to the /1000 normalization, so integer weights avoid any float-literal
  * round-trip mismatch with the SQL oracle. Weights are integer-valued and
  * < 2^11, hence exactly representable as Float.
  *
  * At scale: bucket assignment is a narrow map (no shuffle); the
  * bucket-restricted search shuffles only on the bucket key.
  */
object Lsh {

  /** Same 60-bit md5 hash as graft.functions.md5Hash60, computed in Scala
    * so plane constants can be embedded identically into oracle SQL. */
  def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def planeWeights(j: Int, dims: Int): Array[Float] =
    Array.tabulate(dims)(d => ((md5Hash60(s"plane_${j}_$d") % 2001) - 1000).toFloat)

  /** bucket id = Σ_j [v·w_j > 0] · 2^j */
  def bucketCol(vecCol: Column, numPlanes: Int, dims: Int): Column =
    (0 until numPlanes).map { j =>
      when(vectors.dot(vecCol, typedLit(planeWeights(j, dims).toSeq)) > 0d, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus annotated with its LSH bucket. */
  def withBucket(df: DataFrame, numPlanes: Int, dims: Int,
                 vecCol: String = "embedding", out: String = "bucket"): DataFrame =
    df.withColumn(out, bucketCol(col(vecCol), numPlanes, dims))

  /** Multi-probe ANN: search vectors whose bucket code differs from the
    * query's in at most `maxFlips` hyperplanes (a Hamming ball around the
    * query bucket). Single-bucket LSH loses every neighbor that falls just
    * across one hyperplane; probing the 1-flip neighbors recovers most of
    * that recall WITHOUT more hash tables — the standard multi-probe trade
    * (Lv et al., VLDB'07). The Hamming test is a codegen'd integer
    * `bit_count(bucket ^ q_bucket)` — no bucket-list explosion; at scale
    * the (numPlanes+1) probed buckets are partition-prunable when the
    * corpus is laid out clustered by bucket.
    *
    * `query` must hold ONE row (same contract as `Knn.topK`'s query param —
    * batch search goes through `Knn.batchKnn`). The `distinct()` on the
    * broadcast bucket makes candidate duplication impossible even if a
    * multi-row query slips through, but the final top-k would still mix
    * query vectors — hence the documented single-row contract. */
  def multiProbeSearch(corpus: DataFrame, query: DataFrame, k: Int, numPlanes: Int,
                       dims: Int, maxFlips: Int = 1, metric: Knn.Metric = Knn.Cosine,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = withBucket(corpus, numPlanes, dims, vecCol)
    val q = withBucket(query, numPlanes, dims, "q_vec", "q_bucket")
    val candidates = bucketed
      .crossJoin(broadcast(q.select(col("q_bucket")).distinct()))
      .filter(expr(s"bit_count(bucket ^ q_bucket) <= $maxFlips"))
    Knn.topK(candidates.select(col(idCol), col(vecCol)),
      q.select("q_vec"), k, metric, idCol, vecCol)
  }

  /** In-bucket ANN: search only vectors sharing the query's bucket.
    * Single-row `query` contract, as `multiProbeSearch`. */
  def annSearch(corpus: DataFrame, query: DataFrame, k: Int, numPlanes: Int, dims: Int,
                metric: Knn.Metric = Knn.Cosine,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = withBucket(corpus, numPlanes, dims, vecCol)
    val q = withBucket(query, numPlanes, dims, "q_vec", "q_bucket")
    val inBucket = bucketed
      .crossJoin(broadcast(q.select(col("q_bucket")).distinct()))
      .filter(col("bucket") === col("q_bucket"))
    Knn.topK(inBucket.select(col(idCol), col(vecCol)),
      q.select("q_vec"), k, metric, idCol, vecCol)
  }
}
