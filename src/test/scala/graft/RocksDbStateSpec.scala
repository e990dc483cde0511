package graft

import graft.queries.StreamingQueries

/** The large-state option: `spark.graft.stream.statestore=rocksdb` routes
  * every stateful streaming entry through Spark's bundled RocksDB state
  * store (disk-spilling, off-heap — the 100 TB state path; the default
  * HDFSBacked provider keeps all state on executor heap). State is an
  * execution detail, so each entry's OUTPUT must be bit-identical under
  * either provider — asserted here on one entry per stateful operator
  * family: dropDuplicatesWithinWatermark (dedup), stream-stream join
  * state, and a complete-mode aggregation.
  */
class RocksDbStateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def runWith(provider: Option[String], name: String): Set[String] = {
    provider.fold(spark.conf.unset(StreamingQueries.StateStoreConf))(v =>
      spark.conf.set(StreamingQueries.StateStoreConf, v))
    try StreamingQueries.defs(name)(spark, dir)
      .collect().map(_.toString).toSet
    finally spark.conf.unset(StreamingQueries.StateStoreConf)
  }

  for (entry <- Seq("streaming_dedup", "streaming_join", "streaming_window")) {
    test(s"$entry is provider-independent (RocksDB ≡ HDFSBacked state)") {
      val default = runWith(None, entry)
      val rocks = runWith(Some("rocksdb"), entry)
      assert(rocks.nonEmpty)
      assert(rocks == default)
    }
  }
}
