package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.aggs

/** `TopKHits` / `VecSum` — the typed aggregates behind batch top-k and
  * centroid builds. The load-bearing property is partial aggregation:
  * results must be identical no matter how rows are split across
  * partitions (map-side heaps/sums merge associatively). */
class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def scoredDf(parts: Int) = {
    // 3 groups × 40 scores with deliberate ties (score = i % 7)
    val rows = for (g <- 0 until 3; i <- 0 until 40)
      yield (g.toLong, (i % 7).toLong, (g * 100 + i).toLong)
    rows.toDF("g", "score", "id").repartition(parts)
  }

  test("topK matches window row_number under every partitioning") {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val expected = scoredDf(1)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("g", "score", "id").as[(Long, Long, Long)].collect().toSet
    for (parts <- Seq(1, 3, 8)) {
      val got = scoredDf(parts)
        .groupBy("g")
        .agg(aggs.topK(col("score"), col("id"), 5, asc = false).as("hits"))
        .select(col("g"), explode(col("hits")).as("h"))
        .select("g", "h.score", "h.id").as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"parts=$parts")
    }
  }

  test("topK asc takes the lowest scores; ties break to the lower id") {
    val df = Seq((1L, 5L, 9L), (1L, 5L, 3L), (1L, 2L, 8L), (1L, 7L, 1L))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(aggs.topK(col("score"), col("id"), 2, asc = true).as("hits"))
      .select(explode(col("hits")).as("h")).select("h.score", "h.id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 8L), (5L, 3L)))
  }

  test("topK returns fewer than k when the group is small, ordered best-first") {
    val df = Seq((1L, 4L, 2L), (1L, 9L, 1L)).toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(aggs.topK(col("score"), col("id"), 10, asc = false).as("hits"))
      .select(explode(col("hits")).as("h")).select("h.score", "h.id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((9L, 1L), (4L, 2L)))
  }

  test("topK ignores null scores and ids") {
    val df = Seq((1L, Some(4L), Some(2L)), (1L, None, Some(1L)), (1L, Some(6L), None))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(aggs.topK(col("score"), col("id"), 3, asc = false).as("hits"))
      .select(size(col("hits"))).as[Int].collect().head
    assert(got == 1)
  }

  test("vecSum sums element-wise regardless of partitioning") {
    val rows = (0 until 30).map(i => (i % 2, Array(1.0f * i, 2.0f, 0.5f)))
    for (parts <- Seq(1, 4)) {
      val df = rows.toDF("g", "v").repartition(parts)
      val got = df.groupBy("g").agg(aggs.vecSum(col("v")).as("s"))
        .orderBy("g").as[(Int, Array[Double])].collect()
      val even = (0 until 30 by 2).map(_.toDouble).sum
      val odd = (1 until 30 by 2).map(_.toDouble).sum
      assert(got(0)._2.toSeq == Seq(even, 30.0, 7.5))
      assert(got(1)._2.toSeq == Seq(odd, 30.0, 7.5))
    }
  }

  test("vecSum fails loudly on dimension mismatch") {
    val df = Seq((1, Array(1.0f)), (1, Array(1.0f, 2.0f))).toDF("g", "v")
    val ex = intercept[Exception] {
      df.groupBy("g").agg(aggs.vecSum(col("v"))).collect()
    }
    assert(ex.getMessage.contains("dimensions differ") ||
      ex.getCause != null && ex.getCause.getMessage.contains("dimensions differ"))
  }

  test("batchKnn plan partial-aggregates: no full-width shuffle keyed by q_id only") {
    val corpus = (0L until 50L).map(i => (i, Array((i % 13).toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val qs = corpus.limit(2).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val plan = operators.Knn.batchKnn(corpus, qs, 3, operators.Knn.Cosine)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate/SortAggregate with partial_top_k_hits before the
    // exchange = map-side heaps; a window top-k would show Window + full sort
    assert(plan.contains("partial_top_k_hits"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
