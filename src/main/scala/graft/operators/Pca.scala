package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact principal-component extraction over an embedding column
  * (SURVEY §2 B31) — the spectral member of the embedding-analytics family
  * (embedding_drift = dispersion, this = dominant direction).
  *
  * Top component by the POWER METHOD at a fixed iteration count, entirely
  * in quantized-integer arithmetic so the loadings hash-verify against an
  * unrolled DuckDB oracle (the same contract as KMeans.fitInt / PageRank):
  *
  *  1. components quantize to scaled BIGINTs (`quantizeVecSql`, ×10⁴) and
  *     center on the element-wise integer floor-mean;
  *  2. each iteration applies the covariance WITHOUT materializing the
  *     d×d matrix: w = Σ_rows c·(c·v) — one narrow projection (integer
  *     dot, floor-scaled) + one `VecSumLong` aggregate, so a d-vector
  *     crosses the shuffle, never a d² matrix and never the rows;
  *  3. normalization is integer: flip sign so the maximum-|w| component
  *     (tie: lower dim) is positive, then floor-divide by
  *     g = max(max|w| div 10⁴, 1), renormalizing the peak to ≈10⁴.
  *
  * Per iteration: ONE distributed aggregate + a d-long (model-state)
  * collect — the KMeans.fitInt shape. The centered frame is cached once.
  *
  * Overflow budget (64 dims, |x|≤2 inputs): per-row |c·fdot| ≤ 10¹¹, so
  * the summed w stays in BIGINT up to ~10⁷ rows. Beyond that (the 100 TB
  * path) raise the dot floor-scale or sum in DECIMAL(38,0) — the same
  * documented bound as the quantized Lloyd's trainer.
  */
object Pca {

  /** (loadings after `iters` power iterations, dims) — loadings are
    * scaled integers with the peak component ≈ +10⁴. */
  def topComponentInt(emb: DataFrame, iters: Int, dims: Int,
                      vecCol: String = "embedding"): Array[Long] = {
    val q = emb.select(graft.functions.vectors.quantize(expr(vecCol)).as("q"))
    val m = q.agg(graft.functions.aggs.vecSumLong(col("q")).as("sv"),
        count(lit(1)).as("cnt"))
      .select(expr(graft.functions.floorMeanVecSql("sv", "cnt")).as("m"))
      .head.getSeq[Long](0).toArray
    val mLit = s"array(${m.map(x => s"${x}L").mkString(", ")})"
    val c = q.select(expr(s"zip_with(q, $mLit, (a, b) -> a - b)").as("c")).cache()
    try {
      var v = Array.fill(dims)(10000L)
      for (_ <- 0 until iters) {
        val vLit = s"array(${v.map(x => s"${x}L").mkString(", ")})"
        // integer dot c·v, floor-scaled down ×10⁴ (pmod identity: Spark
        // `div` truncates, floor needed for negative dots)
        val w = c
          .select(col("c"), expr(
            s"aggregate(zip_with(c, $vLit, (a, b) -> a * b), 0L, (acc, x) -> acc + x)").as("d"))
          .select(expr(
            "transform(c, x -> x * ((d - ((d % 10000 + 10000) % 10000)) div 10000))").as("w"))
          .agg(graft.functions.aggs.vecSumLong(col("w")).as("sw"))
          .head.getSeq[Long](0).toArray
        // sign fix at the max-|w| component (tie: lower dim), then integer
        // renormalize; floorDiv mirrors the oracle's `//`
        val peak = w.indices.minBy(i => (-math.abs(w(i)), i))
        require(w(peak) != 0L, "power iteration collapsed to the zero vector")
        val sgn = if (w(peak) < 0) -1L else 1L
        val g = math.max(math.abs(w(peak)) / 10000L, 1L)
        v = w.map(x => Math.floorDiv(x * sgn, g))
      }
      v
    } finally { c.unpersist(blocking = false); () }
  }
}
