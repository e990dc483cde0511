package graft

import org.scalatest.BeforeAndAfterEach
import graft.plans.AnnIndexRegistry
import graft.plans.AnnIndexRegistry.IvfIndex

class AnnRewriteSpec extends SparkSpec with BeforeAndAfterEach {

  // a sibling session carrying the graft extensions (functions + ANN rule)
  private lazy val extSpark = {
    spark // force base session first
    org.apache.spark.sql.graftbridge.Bridge
      .newSessionWithExtensions(spark, ext => new GraftExtensions().apply(ext))
  }

  // cluster 0 around (1,0); cluster 1 around (0,1)
  private val data = Seq(
    (1L, Array(1.0f, 0.05f), 0), (2L, Array(1.0f, -0.05f), 0), (3L, Array(0.95f, 0.0f), 0),
    (4L, Array(0.05f, 1.0f), 1), (5L, Array(-0.05f, 1.0f), 1), (6L, Array(0.0f, 0.95f), 1))

  override def beforeEach(): Unit = {
    extSpark.createDataFrame(data).toDF("vec_id", "embedding", "label")
      .createOrReplaceTempView("ann_corpus")
    AnnIndexRegistry.clear()
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "false")
    super.beforeEach()
  }

  private val knnSql =
    """SELECT vec_id FROM ann_corpus
      |ORDER BY vec_cosine(embedding, array(1.0F, 0.0F)) DESC, vec_id ASC
      |LIMIT 2""".stripMargin

  private def registerIndex(): Unit =
    AnnIndexRegistry.register(IvfIndex("label", Seq(
      0 -> Array(0.98f, 0.0f), 1 -> Array(0.0f, 0.98f)), nProbe = 1))

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  /** did the rewrite inject its `label IN (...)` probe filter? */
  private def probeFilterIn(df: org.apache.spark.sql.DataFrame): Boolean =
    "label#\\d+ IN ".r.findFirstIn(df.queryExecution.analyzed.toString).isDefined

  // (0.95, 0) is exactly collinear with the query -> cosine 1.0 wins; then
  // 1 and 2 tie and the id tie-break picks 1
  test("disabled by default: plan untouched, exact scan") {
    registerIndex()
    val df = extSpark.sql(knnSql)
    assert(!probeFilterIn(df))
    assert(ids(df) == Seq(3L, 1L))
  }

  test("enabled + registered: probe filter injected, top-k from the probed cluster") {
    registerIndex()
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    val df = extSpark.sql(knnSql)
    assert(probeFilterIn(df), s"no probe filter in:\n${df.queryExecution.analyzed}")
    assert(ids(df) == Seq(3L, 1L)) // nearest cluster holds the true top-k
  }

  test("scaled/cast sort keys (the scaled() convention) are unwrapped") {
    registerIndex()
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    val df = extSpark.sql(
      """SELECT vec_id FROM ann_corpus
        |ORDER BY CAST(round(vec_cosine(embedding, array(1.0F, 0.0F)) * 10000) AS BIGINT) DESC, vec_id
        |LIMIT 2""".stripMargin)
    assert(probeFilterIn(df))
    assert(ids(df) == Seq(3L, 1L))
  }

  test("wrong direction (ASC cosine) is never rewritten") {
    registerIndex()
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    val df = extSpark.sql(
      """SELECT vec_id FROM ann_corpus
        |ORDER BY vec_cosine(embedding, array(1.0F, 0.0F)) ASC, vec_id LIMIT 2""".stripMargin)
    assert(!probeFilterIn(df))
    // farthest from (1,0): cluster-1 vectors; 4 and 5 tie symmetric, 6 exact 0
    assert(ids(df).toSet.subsetOf(Set(4L, 5L, 6L)))
  }

  test("l2 ascending probes via l2 centroid distance") {
    registerIndex()
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    val df = extSpark.sql(
      """SELECT vec_id FROM ann_corpus
        |ORDER BY vec_l2(embedding, array(0.0F, 1.0F)) ASC, vec_id LIMIT 2""".stripMargin)
    assert(probeFilterIn(df))
    assert(ids(df).toSet.subsetOf(Set(4L, 5L, 6L)))
  }

  test("Ivf.buildAndRegisterIndex wires real centroids into the rewrite") {
    val corpusDf = extSpark.createDataFrame(data).toDF("vec_id", "embedding", "label")
    val ix = graft.operators.Ivf.buildAndRegisterIndex(corpusDf, nProbe = 1)
    assert(ix.centroids.map(_._1).sorted == Seq(0, 1))
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    val df = extSpark.sql(knnSql)
    assert(probeFilterIn(df))
    assert(ids(df) == Seq(3L, 1L))
  }

  test("an index built in another session does not leak into this one") {
    // build+register on the BASE session; query on the extensions session —
    // the session-scoped registration must not apply (the cross-session
    // footgun the registry scoping removes)
    val otherDf = spark.createDataFrame(data).toDF("vec_id", "embedding", "label")
    graft.operators.Ivf.buildAndRegisterIndex(otherDf, nProbe = 1)
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    val df = extSpark.sql(knnSql)
    assert(!probeFilterIn(df))
    assert(ids(df) == Seq(3L, 1L))
  }

  test("explicit global register IS visible across sessions (opt-in sharing)") {
    registerIndex() // plain register() = global scope
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    assert(probeFilterIn(extSpark.sql(knnSql)))
  }

  test("no registered index for any output column: untouched even when enabled") {
    extSpark.conf.set(AnnIndexRegistry.EnabledConf, "true")
    AnnIndexRegistry.register(IvfIndex("some_other_col", Seq(0 -> Array(1f, 0f))))
    val df = extSpark.sql(knnSql)
    assert(!probeFilterIn(df))
    assert(ids(df) == Seq(3L, 1L))
  }
}
