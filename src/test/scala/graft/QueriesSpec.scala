package graft

/** Every SparkEntry query runs at sf0.001 and returns rows with a stable
  * schema; every query with an oracle has matching column sets is checked
  * by the driver — here we sanity-run the whole surface end-to-end. */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every declared query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle SQL: $noOracle")
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
