package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §5).
  *
  * A 100 TB clickstream has power-law keys; a single `groupBy(key)` sends
  * every hot-key row to one reducer. The salted form aggregates in two
  * phases: (key, salt) partials spread a hot key over `salts` reducers,
  * then the tiny partial table aggregates to finals. AQE's skew-join
  * handling covers joins; this covers aggregations.
  */
object Salting {

  /** Two-phase salted count/sum. `aggs` maps output name -> (sumExpr on
    * phase-1 partials). Partition-local salt via a deterministic hash of
    * all columns keeps the transform reproducible. */
  def saltedCounts(df: DataFrame, key: Column, salts: Int,
                   valueCol: Option[Column] = None): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = valueCol match {
      case Some(v) => salted.groupBy(key.as("k"), col("_salt"))
        .agg(count(lit(1)).as("pc"), sum(v).as("ps"))
      case None => salted.groupBy(key.as("k"), col("_salt"))
        .agg(count(lit(1)).as("pc"), lit(0.0).as("ps"))
    }
    partial.groupBy("k")
      .agg(sum("pc").as("n"), sum("ps").as("total"))
  }
}
