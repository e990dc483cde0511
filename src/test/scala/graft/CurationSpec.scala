package graft

import org.apache.spark.sql.functions._
import graft.queries.CurationQueries

/** §2.B13–B15 corpus curation: vocabulary cutoff, deterministic mixture
  * sampling, benchmark decontamination. */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = CurationQueries.defs(name)(spark, dir)

  test("text_vocab returns a descending count cutoff with token tiebreak") {
    val rows = q("text_vocab").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    val resorted = rows.sortBy { case (tok, n) => (-n, tok) }
    assert(rows.toSeq == resorted.toSeq, "vocab must arrive ordered by (n desc, tok)")
  }

  test("sample_mixture is deterministic and honors per-source rates") {
    val a = q("sample_mixture").collect().map(_.toSeq).toSet
    val b = q("sample_mixture").collect().map(_.toSeq).toSet
    assert(a == b, "hash-based sampling must be reproducible run-to-run")
    q("sample_mixture").collect().foreach { r =>
      val rate = r.getLong(r.fieldIndex("rate"))
      val bucket = r.getLong(r.fieldIndex("bucket"))
      assert(bucket < rate && rate >= 10 && rate <= 89)
    }
    // the mixture must actually differentiate sources (not one global rate)
    val rates = q("sample_mixture").select("source", "rate").distinct().collect()
      .map(r => r.getLong(1)).toSet
    assert(rates.size > 1)
  }

  test("pii_scrub leaves no digits and counts every masked run") {
    q("pii_scrub").collect().foreach { r =>
      assert(!r.getString(1).exists(_.isDigit), "scrubbed payload must carry no digits")
      assert(r.getLong(2) == r.getString(1).count(_ == '#'),
        "redaction count must equal the masked runs")
    }
  }

  test("sample_group_topk keeps at most 10 docs per source, reproducibly") {
    val a = q("sample_group_topk").collect().map(_.toSeq).toSet
    val b = q("sample_group_topk").collect().map(_.toSeq).toSet
    assert(a == b)
    val bySource = a.groupBy(_.head)
    assert(bySource.nonEmpty)
    bySource.values.foreach(rows => assert(rows.size <= 10))
  }

  test("decontaminate flags only non-benchmark docs above the overlap floor") {
    val docs = Tables(spark, dir, "documents")
    val benchIds = docs.filter(col("source") === "src0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = q("decontaminate").collect()
    assert(flagged.nonEmpty)
    flagged.foreach { r =>
      assert(!benchIds.contains(r.getLong(0)), "benchmark docs must never self-flag")
      assert(r.getLong(1) >= 5)
    }
  }
}
