package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge
import graft.functions.{CosineSimilarity, DotProduct, L2Distance}

/** Registers the vector kernels as SQL functions.
  *
  * Two entry points:
  *  - config: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - runtime: `GraftExtensions.register(spark)` on a live session
  *
  * After either, plain SQL can use the codegen'd kernels:
  * `SELECT vec_id FROM emb ORDER BY vec_cosine(embedding, q) DESC LIMIT 10`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // opt-in ANN probe rewrite; post-hoc resolution (NOT optimizer) so the
    // cluster column is still visible — see graft.plans.AnnProbeRewrite
    ext.injectPostHocResolutionRule(session => graft.plans.AnnProbeRewrite(session))
  }
}

object GraftExtensions {
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_cosine" -> (args => CosineSimilarity(args(0), args(1))),
    "vec_l2"     -> (args => L2Distance(args(0), args(1))),
    "vec_dot"    -> (args => DotProduct(args(0), args(1)))
  )

  /** Runtime function registration on an already-built session. The ANN
    * rewrite needs an extensions-built session — use the
    * `spark.sql.extensions=graft.GraftExtensions` conf, or
    * `Bridge.newSessionWithExtensions(spark, new GraftExtensions)` to derive
    * one from a live session without restarting. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) => Bridge.registerFunction(spark, name, b) }
}
