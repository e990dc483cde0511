package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CurationStream

case class CurDoc(doc_id: Long, text: String, source: String,
                  n_chars: Long, ts: Timestamp)

/** C35: streaming curation — the batch pipeline's gates + watermarked
  * content-hash dedup over continuous ingest, with batch-backfill parity. */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  private val MinQ = 5500L

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  // real corpus rows (so the language/quality gates exercise actual text),
  // arrival order = doc_id order, plus injected later-arriving duplicates
  private lazy val base: Seq[CurDoc] = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text", "source", "n_chars")
    .orderBy("doc_id").limit(120)
    .as[(Long, String, String, Long)].collect().toSeq
    .map { case (id, tx, src, nc) => CurDoc(id, tx, src, nc, t((id % 50).toInt)) }
  private lazy val dups: Seq[CurDoc] = base.take(5)
    .map(d => d.copy(doc_id = d.doc_id + 100000, ts = t(55)))

  test("streamed curation equals the batch backfill over the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[CurDoc]
    val sq = CurationStream.curated(stream.toDF(), "2 hours", MinQ)
      .writeStream.format("memory").queryName("curated_docs")
      .outputMode("append").start()
    try {
      stream.addData(base)
      sq.processAllAvailable()
      stream.addData(dups) // duplicates of already-seen content, later ts
      sq.processAllAvailable()
      val streamed = spark.table("curated_docs")
        .as[(String, Long, Long)].collect().toSet

      val batch = CurationStream.curatedBatch((base ++ dups).toDF(), MinQ)
        .as[(String, Long, Long)].collect().toSet
      assert(streamed.nonEmpty, "gates rejected the whole corpus")
      assert(streamed == batch, "stream and batch curation must agree")
      // the injected duplicates never survive on either path
      assert(!streamed.exists(_._2 >= 100000L))
    } finally sq.stop()
  }

  test("gates reject low-quality and non-en documents, never silently mutate") {
    val out = CurationStream.curatedBatch((base ++ dups).toDF(), MinQ)
    assert(out.filter(col("quality") < MinQ).isEmpty)
    // every emitted doc_id exists in the input exactly once
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.distinct.length == ids.length)
    val inIds = (base ++ dups).map(_.doc_id).toSet
    assert(ids.forall(inIds))
    // and the en-gate is really the B7 predictor: rerunning the gate
    // stages over survivors predicts 'en' for all of them
    import graft.queries.TextScoring._
    val pred = (base ++ dups).toDF()
      .join(out.select("doc_id"), "doc_id")
      .selectExpr("doc_id", s"${graft.operators.Dedup.TokExpr} AS tk")
      .selectExpr(Seq("doc_id") ++ sLangScores: _*)
      .selectExpr("doc_id", s"$LangPred AS pred")
    assert(pred.filter(col("pred") =!= "en").isEmpty)
  }
}
