package graft.plans

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{CosineSimilarity, L2Distance, VectorKernel}

/** Opt-in ANN rewrite: `ORDER BY vec_cosine(vec, <query>) DESC LIMIT k`
  * over a cluster-annotated corpus becomes a probed scan.
  *
  * This is the declarative-Spark expression of "use the vector index":
  * users keep writing the exact brute-force query; when
  *  (1) `spark.graft.ann.rewrite.enabled = true`,
  *  (2) an IVF index is registered for the corpus's cluster column, and
  *  (3) the plan is Sort-by-distance + Limit in the index's metric/direction,
  * the rule inserts `cluster IN (<nProbe nearest clusters>)` at the
  * cluster-bearing relation — on a `partitionBy(cluster)` layout that
  * filter prunes partitions at the source, so a 100 TB scan reads
  * nProbe/C of the data.
  *
  * Runs as a POST-HOC RESOLUTION rule (not an optimizer rule): after
  * column pruning the cluster column would already be gone from the scan,
  * so the rewrite must happen while the full relation output is visible.
  *
  * The rewrite is APPROXIMATE (that is the point of ANN) — hence strictly
  * opt-in by conf AND per-index registration, never a silent default.
  */
object AnnIndexRegistry {
  /** An index is SCOPED BY (session, cluster-column name): within its
    * scope, any relation exposing a column of this name is eligible for
    * the rewrite, so give each indexed corpus a distinct cluster column
    * name. `Ivf.buildAndRegisterIndex` registers under the building
    * session's UUID (indexes never leak into unrelated sessions); an
    * explicitly `register(index)`-ed index is global — a deliberate
    * opt-in for cross-session sharing. `dims` guards against applying
    * an index to a differently-embedded corpus (no silent truncation). */
  final case class IvfIndex(clusterCol: String, centroids: Seq[(Int, Array[Float])],
                            nProbe: Int = 2) {
    val dims: Int = centroids.headOption.map(_._2.length).getOrElse(0)
  }

  private val indexes = TrieMap.empty[(String, String), IvfIndex] // (scope, clusterCol)

  val EnabledConf = "spark.graft.ann.rewrite.enabled"
  private val GlobalScope = "*"

  /** Register for ALL sessions (explicit cross-session sharing). */
  def register(index: IvfIndex): Unit =
    indexes.put((GlobalScope, index.clusterCol), index)
  /** Register scoped to one session — other sessions never see it. */
  def register(index: IvfIndex, session: SparkSession): Unit =
    indexes.put((org.apache.spark.sql.graftbridge.Bridge.sessionUUID(session),
      index.clusterCol), index)
  /** Remove the column's registrations in every scope. */
  def unregister(clusterCol: String): Unit =
    indexes.keys.filter(_._2 == clusterCol).foreach(indexes.remove)
  def clear(): Unit = indexes.clear()
  /** Session-scoped registration first, then the global scope. */
  def lookup(clusterCol: String, session: SparkSession): Option[IvfIndex] =
    indexes.get((org.apache.spark.sql.graftbridge.Bridge.sessionUUID(session), clusterCol))
      .orElse(indexes.get((GlobalScope, clusterCol)))
  def all: Seq[IvfIndex] = indexes.values.toSeq

  /** driver-side scoring of the (tiny) centroid table; requires matching
    * dims — same fail-loud stance as the kernels' checkDims */
  def probedClusters(index: IvfIndex, q: Array[Float], byCosine: Boolean): Seq[Int] = {
    require(q.length == index.dims,
      s"query dims ${q.length} != index dims ${index.dims} for '${index.clusterCol}'")
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); acc += d * d; i += 1 }
      math.sqrt(acc)
    }
    val scored =
      if (byCosine) index.centroids.map { case (c, v) => (c, -cosine(v, q)) }
      else index.centroids.map { case (c, v) => (c, l2(v, q)) }
    scored.sortBy { case (c, s) => (s, c) }.take(index.nProbe).map(_._1)
  }
}

case class AnnProbeRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(AnnIndexRegistry.EnabledConf).contains("true") &&
      AnnIndexRegistry.all.nonEmpty

  /** Unwrap monotone non-decreasing wrappers our scaled() convention adds:
    * cast, floor/round, add-constant, multiply-by-positive-literal
    * (`floor(x·10⁴ + 0.5)` is the engine-wide integer-scaling form). */
  private def positiveConst(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case n: java.lang.Number => n.doubleValue() > 0
      case _ => false
    })

  private def unwrapMonotone(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => unwrapMonotone(c)
    case Round(c, s, _) if s.foldable => unwrapMonotone(c)
    case Floor(c) => unwrapMonotone(c)
    case Add(c, k, _) if k.foldable => unwrapMonotone(c)
    case Add(k, c, _) if k.foldable => unwrapMonotone(c)
    case Multiply(c, k, _) if positiveConst(k) => unwrapMonotone(c)
    case Multiply(k, c, _) if positiveConst(k) => unwrapMonotone(c)
    case other => other
  }

  /** (kernel, query vector) if the expression is a supported distance
    * between a column and a constant vector. */
  private def extractKernel(e: Expression): Option[(VectorKernel, Array[Float])] =
    unwrapMonotone(e) match {
      case k: VectorKernel =>
        val litOpt = (k.left, k.right) match {
          case (_: Attribute, q) if q.foldable => Some(q)
          case (q, _: Attribute) if q.foldable => Some(q)
          case _ => None
        }
        litOpt.flatMap { lit =>
          Option(lit.eval().asInstanceOf[ArrayData]).map(a => (k, a.toFloatArray()))
        }
      case _ => None
    }

  /** Cluster-id literal matching the column's integral type (an Int
    * literal against a bigint column would fail post-analysis checks). */
  private def clusterLit(c: Int, dt: org.apache.spark.sql.types.DataType): Expression = dt match {
    case org.apache.spark.sql.types.LongType => Literal(c.toLong)
    case org.apache.spark.sql.types.IntegerType => Literal(c)
    case other => Cast(Literal(c), other)
  }

  /** Walk through output-preserving nodes under the Sort to the first node
    * exposing a registered cluster column; wrap it with the probe filter. */
  private def injectProbe(plan: LogicalPlan, probedFor: Attribute => Option[Seq[Int]]): Option[LogicalPlan] =
    plan.output.collectFirst(Function.unlift(a => probedFor(a).map(p => (a, p)))) match {
      case Some((attr, probed)) =>
        if (alreadyProbed(plan, attr.name)) None
        else Some(Filter(In(attr, probed.map(c => clusterLit(c, attr.dataType))), plan))
      case None => plan match {
        case p: Project => injectProbe(p.child, probedFor).map(c => p.copy(child = c))
        case s: SubqueryAlias => injectProbe(s.child, probedFor).map(c => s.copy(child = c))
        case f: Filter => injectProbe(f.child, probedFor).map(c => f.copy(child = c))
        case _ => None
      }
    }

  private def alreadyProbed(plan: LogicalPlan, clusterCol: String): Boolean = plan match {
    case Filter(cond, _) => cond.exists {
      case In(a: Attribute, _) => a.name == clusterCol
      case _ => false
    }
    case _ => false
  }

  /** Descend through Projects between the Limit and the Sort. */
  private def rewriteBelowLimit(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case p: Project => rewriteBelowLimit(p.child).map(c => p.copy(child = c))
    case sort @ Sort(order +: _, true, child, _) =>
      for {
        (kernel, qVec) <- extractKernel(order.child)
        byCosine = kernel.isInstanceOf[CosineSimilarity]
        // only cosine-DESC and l2-ASC are probe-able; a DOT sort over
        // un-normalized vectors is magnitude-sensitive and a cosine probe
        // would silently pick the wrong clusters — never rewrite it
        goodDirection = kernel match {
          case _: CosineSimilarity => order.direction == Descending
          case _: L2Distance => order.direction == Ascending
          case _ => false
        }
        if goodDirection
        probed <- injectProbe(child, a =>
          AnnIndexRegistry.lookup(a.name, spark)
            .filter(_.dims == qVec.length) // stale/mismatched index: skip
            .map(ix => AnnIndexRegistry.probedClusters(ix, qVec, byCosine)))
      } yield sort.copy(child = probed)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case gl @ GlobalLimit(_, ll: LocalLimit) =>
        rewriteBelowLimit(ll.child)
          .map(c => gl.copy(child = ll.copy(child = c)))
          .getOrElse(gl)
    }
}
