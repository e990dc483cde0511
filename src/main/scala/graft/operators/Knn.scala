package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{aggs, scaled, vectors}

/** Distributed k-nearest-neighbor search over an embedding column.
  *
  * Spark-first re-expression of the reference's three strategies
  * (pre-filter: /root/reference/pre-filter.py:183 `prefilter_search`;
  * post-filter: /root/reference/acorn.py:52 `post_filter_search`;
  * exact scan: /root/reference/pre-filter.py:63 `ann_naive`):
  *
  *  - exact / pre-filter: one scan, score with a codegen'd kernel, then
  *    `orderBy(score).limit(k)` → Catalyst plans `TakeOrderedAndProject`
  *    (per-partition O(n·log k) heap + driver merge of k·P rows — no full
  *    sort, no shuffle of the corpus). At 100 TB this is scan-bound, and
  *    the scan reads only (id, vec) thanks to column pruning.
  *  - post-filter: vector top-`largeK` first (cheap, no filter), then join
  *    metadata + filter, then top-k — recall loss under selective filters,
  *    exactly like the reference's `post_filter_search`.
  *  - batch: queries are small → `broadcast()` cross join, per-query top-k
  *    via the `TopKHits` declarative aggregate — map-side k-heaps partial-
  *    aggregate before the shuffle, so only |Q|·k rows leave each partition
  *    (two-phase local/global top-k; scales to any corpus size).
  */
object Knn {

  sealed trait Metric {
    def score(a: Column, b: Column): Column
    /** ordering: best first */
    def order(score: Column): Column
    /** true iff a LOWER score is better (distances vs similarities) */
    def ascending: Boolean
  }
  case object Cosine extends Metric {
    def score(a: Column, b: Column): Column = vectors.cosine(a, b)
    def order(s: Column): Column = s.desc
    def ascending: Boolean = false
  }
  case object L2 extends Metric {
    def score(a: Column, b: Column): Column = vectors.l2(a, b)
    def order(s: Column): Column = s.asc
    def ascending: Boolean = true
  }
  /** hnswlib's third space, `space='ip'` (inner product). */
  case object Dot extends Metric {
    def score(a: Column, b: Column): Column = vectors.dot(a, b)
    def order(s: Column): Column = s.desc
    def ascending: Boolean = false
  }

  /** Ranking happens on the decimal-scaled score (`scaled(score, digits)`)
    * with id tie-break, so results are bit-deterministic across engines and
    * summation orders. */
  val ScoreDigits = 4

  /** Exact brute-force top-k of `query` (single-row DF: [q_id, q_vec]) against
    * `corpus` [id, vec]. Ties broken by id for determinism. */
  def topK(corpus: DataFrame, query: DataFrame, k: Int, metric: Metric,
           idCol: String = "vec_id", vecCol: String = "embedding",
           qVecCol: String = "q_vec"): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(query))
      .withColumn("score", scaled(metric.score(col(vecCol), col(qVecCol)), ScoreDigits))
    scored
      .orderBy(metric.order(col("score")), col(idCol).asc)
      .limit(k)
  }

  /** Radius (range) search: ALL vectors whose scaled score is strictly
    * better than `limitScaled` — scan + codegen'd score + filter. Unlike
    * top-k there is no driver-side merge at all: every partition emits its
    * own matches, so this is the most scale-friendly query shape the
    * engine has (pure map), and having no k-boundary means no tie-break
    * subtleties either. */
  def radius(corpus: DataFrame, query: DataFrame, limitScaled: Long, metric: Metric,
             idCol: String = "vec_id", vecCol: String = "embedding",
             qVecCol: String = "q_vec"): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(query))
      .withColumn("score", scaled(metric.score(col(vecCol), col(qVecCol)), ScoreDigits))
    val keep = if (metric.ascending) col("score") < limitScaled
               else col("score") > limitScaled
    scored.filter(keep)
  }

  /** Pre-filter search: metadata predicate first, exact kNN on survivors.
    * Perfect accuracy; cost scales with filter selectivity — the predicate
    * is pushed to the scan, so a selective filter reads less data. */
  def prefilterKnn(corpus: DataFrame, meta: DataFrame, pred: Column,
                   query: DataFrame, k: Int, metric: Metric,
                   idCol: String = "vec_id", metaIdCol: String = "doc_id",
                   vecCol: String = "embedding"): DataFrame = {
    val filtered = corpus.join(meta.filter(pred), corpus(idCol) === meta(metaIdCol))
    topK(filtered, query, k, metric, idCol, vecCol)
  }

  /** Post-filter search: vector top-`largeK` first, then metadata filter,
    * then top-k of what survives (may return < k — same recall collapse the
    * reference documents for selective filters). */
  def postfilterKnn(corpus: DataFrame, meta: DataFrame, pred: Column,
                    query: DataFrame, k: Int, largeK: Int, metric: Metric,
                    idCol: String = "vec_id", metaIdCol: String = "doc_id",
                    vecCol: String = "embedding"): DataFrame = {
    val candidates = topK(corpus, query, largeK, metric, idCol, vecCol)
    candidates
      .join(meta.filter(pred), candidates(idCol) === meta(metaIdCol))
      .orderBy(metric.order(col("score")), col(idCol).asc)
      .limit(k)
      .select(candidates.columns.map(col).toIndexedSeq: _*)
  }

  /** Batch kNN: top-k per query for a (small, broadcast) query set.
    * Returns [q_id, id, rank, score].
    *
    * Two-phase top-k via the `TopKHits` declarative aggregate: every map
    * task keeps a k-bounded heap per query id (partial aggregation), so the
    * shuffle carries ≤ |Q|·k rows per partition — never the full
    * |corpus|×|Q| scored set into |Q| window reducers. */
  def batchKnn(corpus: DataFrame, queries: DataFrame, k: Int, metric: Metric,
               idCol: String = "vec_id", vecCol: String = "embedding",
               qIdCol: String = "q_id", qVecCol: String = "q_vec",
               excludeSelf: Boolean = true): DataFrame = {
    var scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("score", scaled(metric.score(col(vecCol), col(qVecCol)), ScoreDigits))
    if (excludeSelf) scored = scored.filter(col(idCol) =!= col(qIdCol))
    scored
      .groupBy(col(qIdCol))
      .agg(aggs.topK(col("score"), col(idCol), k, metric.ascending).as("hits"))
      .select(col(qIdCol), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col(qIdCol), col("hit.id").as(idCol),
        (col("pos") + 1).cast("long").as("rank"), col("hit.score").as("score"))
  }
}
