package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Query classes mirroring the reference's evaluation axes
    * (/root/reference/acorn.py:283 measures wall + RSS per query class):
    * vector/hybrid search, dedup family, text analysis, ingest/parse,
    * core analytics. */
  def classOf(name: String): String =
    if (name.startsWith("streaming_")) "streaming"
    else if (name.startsWith("dedup_")) "dedup"
    else if (name.startsWith("text_")) "text"
    else if (name.startsWith("multimodal_") || name.endsWith("_parse") ||
      name == "events_json") "ingest"
    else if (name.startsWith("meta_") || name.contains("knn") ||
      name.startsWith("recall_") || name.startsWith("hybrid_") ||
      name.startsWith("ann_") || name.startsWith("ivf_") ||
      name == "keyword_search" ||
      name == "clustered_probe" || name == "selectivity_classes") "search"
    else "core"

  /** Linux resident set size in MiB (the reference reports RSS per run). */
  private def rssMb: Long = {
    try {
      val src = scala.io.Source.fromFile("/proc/self/status")
      try src.getLines().find(_.startsWith("VmRSS:"))
        .map(_.replaceAll("[^0-9]", "").toLong / 1024).getOrElse(-1L)
      finally src.close()
    } catch { case _: Throwable => -1L }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.SessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Execute through the noop sink, NOT count(): count() lets the
    // optimizer prune everything that doesn't change cardinality (narrow
    // projections, windows), timing a parquet metadata row-count instead
    // of the query. The noop sink forces full materialization of every
    // output column — the honest throughput measurement.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            d: String): Unit =
      fn(spark, d).write.format("noop").mode("overwrite").save()
    // Warm-up pass at the smallest SF: JIT-compiles the codegen'd stages so
    // the timed pass measures steady-state throughput, not JVM warmup.
    // SPARK_GRAFT_ONLY=a,b,c → time only those entries (targeted re-bench)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      selected.foreach { case (_, fn) =>
        try run(fn, warmDir) catch { case _: Throwable => () }
      }
      spark.catalog.clearCache()
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try run(fn, sfDir) catch { case _: Throwable => () }
      val elapsed = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // per-query caches must not leak across timings
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val classes = results.groupBy { case (k, _) => classOf(k) }
      .toSeq.sortBy(_._1)
      .map { case (c, m) => s"\"$c\":{\"sec\":${m.values.sum},\"n\":${m.size}}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""classes":$classes,"rss_mb":$rssMb,"sf":"$sfDir"}""")
    spark.stop()
  }
}
