package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the harness testdata layout.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 only reads with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (as epoch-nanos LongType).
  * We convert to a micros timestamp with integer floor-division — the same
  * truncation DuckDB applies when it reads the file, so the oracle agrees.
  */
object Tables {
  val NanoTimestampCols = Set("ts")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    convertNanoCols(spark.read.parquet(s"$dir/$name.parquet"))

  /** Shared by the batch loader and the streaming file source (schemas must
    * stay in lock-step or batch/stream ts semantics silently diverge). An
    * explicit `schema` lets streaming callers pass the batch-read schema. */
  def convertNanoCols(df: DataFrame,
                      schema: org.apache.spark.sql.types.StructType = null): DataFrame = {
    val s = Option(schema).getOrElse(df.schema)
    s.fields.foldLeft(df) {
      case (d, f) if NanoTimestampCols(f.name) && f.dataType == LongType =>
        d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
      case (d, _) => d
    }
  }

  /** Session config every entry point needs (Verify/Bench/tests). */
  val SessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true"
  )
}
