package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** B27's two-level distributed prefix-sum (CurationQueries.packOffsets):
  * the bucket span is an implementation knob, not a semantic one — any
  * two bucketings must produce identical offsets, including across every
  * bucket and superbucket boundary. Sparse/irregular doc_ids exercise
  * empty buckets and empty superbuckets.
  */
class PackOffsetsSpec extends SparkSpec {

  private def offsets(rows: Seq[(Long, Long)], span: Long): Map[Long, Long] = {
    val nt = spark.createDataFrame(rows).toDF("doc_id", "n")
    CurationQueries.packOffsets(spark, nt, span)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("off")).toMap
  }

  test("offsets are span-invariant and match the sequential exclusive scan") {
    // irregular ids: gaps larger than a superbucket at span=4, runs that
    // straddle bucket boundaries at every tested span
    val ids = Seq(0L, 1L, 2L, 3L, 5L, 31L, 32L, 33L, 63L, 64L, 100L,
      1023L, 1024L, 1025L, 5000L)
    val rows = ids.zipWithIndex.map { case (id, i) => (id, (i % 7 + 1).toLong) }
    var acc = 0L
    val expected = rows.sortBy(_._1).map { case (id, n) =>
      val r = id -> acc; acc += n; r
    }.toMap
    for (span <- Seq(2L, 4L, 32L, 128L, 100000L)) {
      assert(offsets(rows, span) === expected, s"span=$span")
    }
  }

  test("offsets partition the total token count with no overlap") {
    val rows = (0L until 200L).filter(i => i % 3 != 1).map(i => (i, i % 11 + 1))
    val got = offsets(rows, 32L).toSeq.sortBy(_._2)
    val total = rows.map(_._2).sum
    // consecutive offsets differ by exactly the preceding doc's count
    val byId = rows.toMap
    got.sliding(2).foreach {
      case Seq((idA, offA), (_, offB)) => assert(offB - offA === byId(idA))
      case _ =>
    }
    assert(got.head._2 === 0L)
    assert(got.last._2 + byId(got.last._1) === total)
  }
}
