package graft

/** Every SparkEntry query runs at sf0.001 and returns rows with a stable
  * schema; every query with an oracle has matching column sets is checked
  * by the driver — here we sanity-run the whole surface end-to-end. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Entries the driver checks rows-only (no DuckDB oracle), each with the
    * SURVEY §2 rationale. Additions here must be justified in §2. */
  private val RowsOnly = Set(
    "knn_pq_trained", // A25: iterative fp KMeans training is engine-specific
    "knn_ivf_trained" // A14c: same rationale for the trained-IVF composition
  )

  test("every declared query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- RowsOnly
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
    val stale = RowsOnly -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"rows-only allowlist names unknown queries: $stale")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      // all queries must produce deterministic, materializable output
      df.collect()
    }
  }

  test("entry() smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
