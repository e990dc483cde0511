package graft

import java.nio.file.Files
import graft.operators.Ivf

/** The 100 TB IVF layout: corpus written partitionBy(cluster), probes prune
  * partitions at the file index — asserted on the physical plan. */
class ClusteredLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("clustered write + probed read prunes partitions at the source") {
    val dir = Files.createTempDirectory("graft_ivf").toString
    val emb = (0L until 100L).map(i => (i, Array(i.toFloat, 1f), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
    Ivf.writeClustered(emb, dir)

    val probed = Ivf.readProbed(spark, dir, Seq(3, 7))
    assert(probed.count() == 20)

    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(plan.contains("label#") && (plan.contains("IN (3,7)") || plan.contains("in(3,7")),
      s"partition filter on label missing in:\n$plan")

    // directory layout really is cluster-partitioned
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.count(_.startsWith("label=")) == 10)
  }

  test("clustered_probe queries entry scans through PartitionFilters") {
    val df = SparkEntry.queries("clustered_probe")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the probed-cluster isin() must sit in the partition filters (directory
    // pruning), NOT only as a data filter after the scan — the clustered
    // scan shows `PartitionFilters: [label#N IN (...)]`
    assert(plan.contains("PartitionFilters: [label"),
      s"no label partition filter in:\n$plan")
    assert(df.count() > 0)
  }
}
