package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Knn, MetaPredicate}

/** High-level facade mirroring the reference's `HNSWSearch` workflow
  * (/root/reference/acorn.py:20) on Spark:
  *
  * {{{
  * val engine = HybridSearchEngine(corpusDf, metadataDf)   // ~ init_index + add_items
  * engine.preFilterSearch(meta, query, k)                  // ~ pre-filter.py
  * engine.postFilterSearch(meta, query, k, largeK)         // ~ post_filter_search
  * engine.acornSearch(meta, query, k, nProbe)              // ~ acorn_search
  * }}}
  *
  * `meta` uses the reference's query language: `Map(attr -> (op, value))`
  * with ops `exact, <, >, leq, geq, substring`.
  *
  * The "index build" is the centroid table (cached, broadcast at probe
  * time); at 100 TB the corpus itself is written partitioned by cluster id
  * so probes prune partitions at the source.
  */
final class HybridSearchEngine private (corpus: DataFrame, metadata: DataFrame,
                                        idCol: String, vecCol: String, clusterCol: String,
                                        metaIdCol: String) {

  /** cached centroid "index" — built once, reused by every acornSearch */
  lazy val centroids: DataFrame = Ivf.centroids(corpus, idCol, vecCol, clusterCol).cache()

  private def compile(meta: Map[String, (String, Any)]): Column =
    if (meta.isEmpty) lit(true) else MetaPredicate(meta.toSeq: _*)

  /** Metadata filter first, exact kNN on survivors — perfect accuracy. */
  def preFilterSearch(meta: Map[String, (String, Any)], query: DataFrame, k: Int,
                      metric: Knn.Metric = Knn.Cosine): DataFrame =
    Knn.prefilterKnn(corpus.select(idCol, vecCol), metadata, compile(meta), query, k, metric,
      idCol = idCol, metaIdCol = metaIdCol, vecCol = vecCol)

  /** Vector top-largeK, then metadata filter, then top-k. */
  def postFilterSearch(meta: Map[String, (String, Any)], query: DataFrame, k: Int,
                       largeK: Int = 50, metric: Knn.Metric = Knn.Cosine): DataFrame =
    Knn.postfilterKnn(corpus.select(idCol, vecCol), metadata, compile(meta), query, k, largeK,
      metric, idCol = idCol, metaIdCol = metaIdCol, vecCol = vecCol)

  /** ACORN-style hybrid: probe nearest clusters with the filter pushed
    * into the pruned scan (delegates to the shared Ivf body). */
  def acornSearch(meta: Map[String, (String, Any)], query: DataFrame, k: Int,
                  nProbe: Int = 2, metric: Knn.Metric = Knn.Cosine): DataFrame =
    Ivf.searchProbed(centroids, corpus, metadata, compile(meta), query, k, nProbe, metric,
      idCol, metaIdCol, vecCol, clusterCol)

  /** Exact brute-force kNN (no filter) — the evaluation ground truth. */
  def exactSearch(query: DataFrame, k: Int, metric: Knn.Metric = Knn.Cosine): DataFrame =
    Knn.topK(corpus.select(idCol, vecCol), query, k, metric, idCol, vecCol)

  /** The reference's adaptive loop: widen the probe count until ≥ k
    * filter-passing survivors (acorn.py:162). */
  def acornSearchAdaptive(meta: Map[String, (String, Any)], query: DataFrame, k: Int,
                          metric: Knn.Metric = Knn.Cosine): DataFrame =
    Ivf.adaptiveHybridKnn(corpus, metadata, compile(meta), query, k, metric,
      idCol, metaIdCol, vecCol, clusterCol, precomputedCent = Some(centroids))

  /** Batch hybrid search: many queries in one plan, per-query probes and
    * per-query top-k via map-side k-heaps. `queries`: [q_id, q_vec]. */
  def acornSearchBatch(meta: Map[String, (String, Any)], queries: DataFrame, k: Int,
                       nProbe: Int = 2, metric: Knn.Metric = Knn.Cosine): DataFrame =
    Ivf.hybridBatchKnn(corpus, metadata, compile(meta), queries, k, nProbe, metric,
      idCol, metaIdCol, vecCol, clusterCol, precomputedCent = Some(centroids))
}

object HybridSearchEngine {
  def apply(corpus: DataFrame, metadata: DataFrame,
            idCol: String = "vec_id", vecCol: String = "embedding",
            clusterCol: String = "label", metaIdCol: String = "doc_id"): HybridSearchEngine =
    new HybridSearchEngine(corpus, metadata, idCol, vecCol, clusterCol, metaIdCol)
}
