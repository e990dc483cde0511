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

  test("z-order layout prunes a 2-D box in BOTH dims; a 1-D sort prunes only one") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, "/root/testdata/sf0.001", "events").selectExpr(
      "user_id % 256 AS u", "(unix_micros(ts) div 86400000000) % 256 AS d")
      .withColumn("zval", expr(graft.operators.ZOrder.zvalExpr("u", "d", 8)))
    val (uLo, uHi, dLo, dHi) = (40, 120, 15, 30)
    def prunable(path: String): (Long, Long, Long) = {
      val st = graft.operators.ZOrder.fileStats(spark.read.parquet(path), "u", "d")
        .as[(String, Long, Long, Long, Long)].collect()
      val byU = st.count { case (_, ulo, uhi, _, _) => uhi < uLo || ulo > uHi }
      val byD = st.count { case (_, _, _, dlo, dhi) => dhi < dLo || dlo > dHi }
      val either = st.count { case (_, ulo, uhi, dlo, dhi) =>
        uhi < uLo || ulo > uHi || dhi < dLo || dlo > dHi }
      (byU.toLong, byD.toLong, either.toLong)
    }
    // z-clustered: tight file boxes in BOTH dims → the box prunes many files
    val zdir = Files.createTempDirectory("graft_z").toString
    graft.operators.ZOrder.writeZOrdered(ev, "zval", zdir, nFiles = 16)
    val (_, zByD, zEither) = prunable(zdir)
    assert(zEither >= 4, s"z layout should prune ≥ 4/16 files, got $zEither")
    assert(zByD > 0, "z layout must prune some files on the SECOND dim too")
    // u-sorted only: every file spans the full d range → d prunes nothing
    val ldir = Files.createTempDirectory("graft_lin").toString
    ev.repartitionByRange(16, col("u")).sortWithinPartitions("u")
      .write.mode("overwrite").parquet(ldir)
    val (lByU, lByD, _) = prunable(ldir)
    assert(lByD == 0, "1-D layout cannot prune on the unsorted dim")
    assert(lByU > 0, "1-D layout still prunes on its own sort dim")
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
