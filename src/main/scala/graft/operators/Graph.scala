package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames (SURVEY §2 C57).
  *
  * Complements the connected-components family in [[Dedup]]: those iterate
  * to a data-dependent fixpoint (and so need per-round convergence
  * actions); PageRank here runs a FIXED iteration count, so the whole
  * computation is one lazy plan — ZERO driver actions inside the loop, no
  * checkpoint round-trips, and the scheduler sees all five rounds at once.
  * That is the right trade for rank-style scores, which are consumed as
  * relative weights and converge geometrically (d^k): fixed k=5 bounds the
  * error at d^5 ≈ 0.44 of the remaining mass, plenty for ranking ties on
  * integer-scaled output, and keeps the operator deterministic enough to
  * hash-verify against an unrolled SQL oracle.
  */
object Graph {

  /** Integer-exact PageRank: ranks ×10⁶, damping 85/100, floor division
    * everywhere (all operands non-negative ⇒ Spark `div` ≡ DuckDB `//`).
    *
    * `edges` must be DISTINCT (src, dst) pairs; the node set is the
    * distinct src side (for the symmetric co-occurrence graphs this is
    * every endpoint; a directed caller must union endpoints first).
    * Simplified model without dangling-mass redistribution — symmetric
    * graphs have no dangling nodes, so nothing leaks there.
    *
    * `symmetric = true` declares that every node also appears as a `dst`
    * (true for any symmetric edge set, and for any directed graph whose
    * dst side covers its src side). Under that contract each node
    * receives ≥1 contribution every round, so the per-iteration
    * `nodes LEFT JOIN contrib` completion is the identity — skipping it
    * removes one join + one |nodes|-row shuffle per iteration (5 stages
    * at k=5). Results are bit-identical where the contract holds; the
    * default keeps the general left-join path.
    *
    * Scale shape at 100 TB: the edge table (with out-degrees) is hash
    * partitioned by src ONCE and cached — each iteration re-shuffles only
    * the rank table (|nodes| rows, ≪ |edges|) to meet it, then one
    * partial-agg shuffle keyed by dst. Plan depth is linear in `iters`;
    * no lineage blow-up, no checkpoint needed at fixed k.
    */
  def pageRank(edges: DataFrame, iters: Int, symmetric: Boolean = false): DataFrame = {
    val e = edges.select("src", "dst")
    val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // partition by the join key once; every iteration's join reuses it
    val eo = e.join(out, "src").repartition(col("src")).cache()
    val nodes = e.select(col("src").as("node")).distinct().cache()
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      // SHUFFLE_HASH on the rank side (r17 optimization, guide §3.1): the
      // default sort-merge join re-SORTS the cached 2-columns-per-edge
      // table every iteration (the cache preserves partitioning, not
      // order) — k iterations pay k full edge-table sorts for a join
      // whose per-partition rank side is tiny. A shuffled-hash join
      // builds the |nodes|/P-row hash table per partition and probes the
      // edges unsorted; same rows out, measured −1 s/entry at sf0.1 and
      // the same argument holds at 100 TB (|nodes| ≪ |edges| and the
      // rank table is the side that fits per-partition memory).
      val contrib = eo.join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("s"))
      ranks =
        if (symmetric)
          contrib.select(col("node"),
            expr("CAST(150000 + (85 * s) div 100 AS BIGINT)").as("r"))
        else
          nodes.join(contrib, Seq("node"), "left")
            .select(col("node"),
              expr("CAST(150000 + (85 * coalesce(s, 0)) div 100 AS BIGINT)").as("r"))
    }
    ranks
  }

  /** Per-node triangle counts by the degree-oriented wedge join — the
    * standard distributed algorithm (Suri & Vassilvitskii WWW'11 /
    * Schank-Wagner): orient every undirected edge from its
    * (degree, id)-smaller endpoint to the larger, enumerate wedges only
    * from each node's ORIENTED out-neighbors, then close them against the
    * oriented edge set. Orientation bounds every node's out-degree by
    * O(√m), so wedge fan-out is O(m^{3/2}) total instead of Σ deg² — the
    * difference between a skew-killed and a scalable self-join when a hub
    * node has millions of neighbors.
    *
    * `edges` must be the DISTINCT SYMMETRIC pair set ((a,b) ⇔ (b,a),
    * a ≠ b) — the same contract as [[pageRank]]'s co-occurrence graphs.
    * Each triangle is found exactly once (its orientation-ordered corner
    * triple) and credited to all three corners. Output: (node, n_tri),
    * one row per node appearing in ≥1 triangle — all-integer, engine-
    * exact by construction.
    *
    * Scale shape: two shuffle joins on node keys (wedge build + closure)
    * plus one explode + partial aggregate; no cartesian anywhere. The
    * (deg, id) total order travels WITH the oriented edges (deg columns
    * carried, compared tuple-wise) so no global rank assignment — and so
    * no global sort — is ever needed.
    *
    * Fast path: when the ORIENTED half-edge set is small enough to ship,
    * both probe sides broadcast and the count becomes one shuffle-free
    * scan + a tiny aggregate. The engine decides from its own exact count
    * of the cached set (better stats than AQE's estimates); the shuffle
    * shape above remains the default the moment the edge set outgrows the
    * broadcast budget.
    *
    * Budget honesty (ADVICE r5): the resident cost is NOT the 24 raw
    * column bytes/row — each probe side becomes a HashedRelation
    * (~150–250 bytes/row with the hash map + UnsafeRow overhead), and the
    * two joins key differently (wedge on `a`, closure on `(a, b)`), so
    * they CANNOT share one relation — two copies live on the driver and
    * every executor. The default therefore sizes against the actual heap:
    * ~7.5% of Runtime.maxMemory across both relations at 400 B/row (an
    * 8 GiB heap → ~1.6M edges, which keeps the sf0.1 co-purchase graph's
    * 1.2M oriented edges — measured ~480 MB resident for both relations,
    * r5 — on the fast path). Pass an explicit cap to pin behavior.
    *
    * The heap term is measured on the JVM that PLANS the query — the
    * driver — but the relations live on every EXECUTOR too (ADVICE r6):
    * on clusters where executors have less heap than the driver, a
    * driver-heap-proportional budget could broadcast what executors
    * cannot hold, and a small-heap CI JVM would silently flip a fixture
    * off the fast path. The default therefore CLAMPS at an absolute 4M
    * edges (~1.6 GB resident for both relations — sized for the common
    * ≥4 GiB executor, and plan-stable across driver heaps ≥ ~21 GiB);
    * deployments with fatter executors raise it explicitly per call. */
  val AbsoluteBroadcastMaxEdges = 4000000L
  def defaultBroadcastMaxEdges: Long =
    math.min(AbsoluteBroadcastMaxEdges,
      math.max(250000L, (Runtime.getRuntime.maxMemory() * 0.075 / 400).toLong))

  def triangleCounts(edges: DataFrame,
                     broadcastMaxEdges: Long = -1L): DataFrame = {
    val maxEdges =
      if (broadcastMaxEdges >= 0) broadcastMaxEdges else defaultBroadcastMaxEdges
    val e = edges.select("src", "dst")
    val deg = e.groupBy(col("src").as("n")).agg(count(lit(1)).as("deg"))
    // orient each undirected edge once: (deg, id)-smaller endpoint first
    val o = e
      .join(deg.withColumnRenamed("n", "src").withColumnRenamed("deg", "dsrc"), "src")
      .join(deg.withColumnRenamed("n", "dst").withColumnRenamed("deg", "ddst"), "dst")
      .filter(col("dsrc") < col("ddst") ||
        (col("dsrc") === col("ddst") && col("src") < col("dst")))
      .select(col("src").as("a"), col("dst").as("b"),
        col("ddst").as("degb"))
      // o feeds THREE scans (both wedge sides + the closure probe):
      // materialize the oriented half-edges once — the upstream edge
      // build (fact self-join + distinct + two degree joins) is the
      // expensive part and must not run three times
      .cache()
    // the cache is materialized by this count, which is then FREE stats
    val small = o.count() <= maxEdges
    def probe(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // wedges from the orientation-least corner; b1 ≺ b2 in the SAME
    // (deg, id) order so the closing edge (b1 → b2) is oriented if present
    val wedges = o.as("x").join(probe(o.as("y")), col("x.a") === col("y.a") &&
        (col("x.degb") < col("y.degb") ||
          (col("x.degb") === col("y.degb") && col("x.b") < col("y.b"))))
      .select(col("x.a").as("a"), col("x.b").as("b1"), col("y.b").as("b2"))
    val tris = wedges.as("w").join(probe(o.as("z")),
        col("w.b1") === col("z.a") && col("w.b2") === col("z.b"))
      .select(col("w.a").as("a"), col("w.b1").as("b1"), col("w.b2").as("b2"))
    tris
      .select(explode(array(col("a"), col("b1"), col("b2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }
}
