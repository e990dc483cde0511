package graft

import graft.operators.Graph
import graft.queries.AnalyticsQueries

/** §2.C57 fixed-iteration integer PageRank. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("a cycle is an exact fixpoint: every rank stays 10^6") {
    // ring: each node has outdeg 1, so contrib = 10^6 and
    // r' = 150000 + 85*10^6/100 = 10^6 exactly — for ANY iteration count
    val ring = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L)
    for (k <- Seq(1, 5)) {
      val r = ranks(ring, k)
      assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
    }
  }

  test("a star hub outranks its leaves, leaves tie") {
    // symmetric star 0–{1,2,3,4}: hub receives 4 full contributions,
    // leaves receive 1/4 of the hub's
    val star = (1L to 4L).flatMap(l => Seq(0L -> l, l -> 0L))
    val r = ranks(star, 5)
    val leaves = (1L to 4L).map(r)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie")
    assert(r(0L) > leaves.head, "hub must outrank leaves")
    // one iteration by hand: hub gets 4·(10^6 div 1)·85/100 + 150000
    assert(ranks(star, 1)(0L) == 150000L + 85L * 4000000L / 100L)
    assert(ranks(star, 1)(1L) == 150000L + 85L * (1000000L / 4) / 100L)
  }

  test("symmetric fast path ≡ general left-join path on a symmetric graph") {
    // symmetric contract: every node appears as a dst, so skipping the
    // per-iteration nodes-completion join must be bit-identical
    val g = Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L,
      0L -> 3L, 3L -> 0L)
    val gen = Graph.pageRank(g.toDF("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    val sym = Graph.pageRank(g.toDF("src", "dst"), 5, symmetric = true)
      .as[(Long, Long)].collect().toMap
    assert(sym == gen)
  }

  test("parts_pagerank is deterministic and covers every co-purchased part") {
    val dir = "/root/testdata/sf0.001"
    val a = AnalyticsQueries.defs("parts_pagerank")(spark, dir)
      .as[(Long, Long)].collect().toMap
    val b = AnalyticsQueries.defs("parts_pagerank")(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(a == b, "re-run must be bit-identical")
    assert(a.nonEmpty)
    assert(a.values.forall(_ >= 150000L), "rank lower bound is the reset mass")
    val parts = Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
      .groupBy(_._1).values.filter(_.map(_._2).distinct.size >= 2)
      .flatMap(_.map(_._2)).toSet
    assert(a.keySet == parts, "node set = parts sharing an order with another part")
  }
}
