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

  /** Skew-safe equi-join — the join sibling of `saltedCounts`. A sort-merge
    * join on a power-law key sends every hot-key row to one reducer; here
    * the big side salts each row into one of `salts` sub-keys and the small
    * side replicates across ALL salt values, so a hot key spreads over
    * `salts` reducers at the cost of a `salts`× blow-up of the small side
    * (fine: the small side is small by assumption — when it isn't, AQE skew
    * handling or a broadcast join is the right tool instead).
    *
    * `keepSalt = true` exposes the `_salt` column so a following aggregation
    * can reuse it for the two-phase salted pattern without re-salting. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
                 keepSalt: Boolean = false): DataFrame = {
    val saltedBig = big
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small
      .withColumn("_salt", explode(typedLit((0L until salts.toLong).toSeq)))
    val joined = saltedBig.join(replicated, Seq(key, "_salt"))
    if (keepSalt) joined else joined.drop("_salt")
  }

  /** Two-phase salted count/sum. The salt only needs to SPREAD hot keys,
    * not be reproducible — monotonically_increasing_id varies with input
    * partitioning, but count/sum are salt-invariant so the final aggregate
    * is stable regardless. (A content hash would be reproducible but sends
    * identical duplicate rows — the common hot case — to one reducer.) */
  def saltedCounts(df: DataFrame, key: Column, salts: Int,
                   valueCol: Option[Column] = None): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    valueCol match {
      case Some(v) =>
        salted.groupBy(key.as("k"), col("_salt"))
          .agg(count(lit(1)).as("pc"), sum(v).as("ps"))
          .groupBy("k")
          .agg(sum("pc").as("n"), sum("ps").as("total"))
      case None => // count-only: no meaningless zero `total` column
        salted.groupBy(key.as("k"), col("_salt"))
          .agg(count(lit(1)).as("pc"))
          .groupBy("k")
          .agg(sum("pc").as("n"))
    }
  }
}
