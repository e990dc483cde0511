package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd nearest-centroid assignment kernel — the Lloyd's E-step and
  * the IVF append/assign path as ONE NARROW PROJECTION.
  *
  * Centroids are k·d MODEL STATE (exactly like the PQ codebook in
  * `PqNearestCode`), so they ride along as a `float[]` reference object and
  * the argmin is a loop inside whole-stage codegen. The alternative the r2
  * verdict flagged (KMeans.scala:50): broadcast-crossJoin to n·k rows, then
  * a `groupBy(vec_id)` argmin — a full n-row shuffle PER LLOYD'S ITERATION,
  * which at 100 TB is iters × corpus-shuffles spent on a row-local
  * computation. With this kernel, assignment shuffles NOTHING.
  *
  * Arithmetic is bit-compatible with the crossJoin form and the DuckDB
  * oracle (knn_ivf_append): per-dimension float→double squared diffs
  * accumulated in ascending-dimension order (identical to the `vec_l2`
  * kernel), distance quantized `floor(sqrt(acc)·10⁴ + 0.5)` (the repo's
  * scaled() convention), ties broken to the LOWEST label by iterating
  * labels in ascending order with a strict `<`.
  *
  * Returns `struct<label: bigint, d: bigint>` — the assigned cluster and
  * the quantized distance to it.
  */
case class NearestCentroid(child: Expression, labels: Array[Long],
                           cents: Array[Float], dims: Int)
    extends UnaryExpression {
  require(labels.nonEmpty, "nearest_centroid: empty centroid table")
  require(cents.length == labels.length * dims,
    s"nearest_centroid: ${labels.length} labels × $dims dims != ${cents.length} values")
  require(labels.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "nearest_centroid: labels must be strictly ascending (tie-break contract)")

  override def prettyName: String = "nearest_centroid"
  override def dataType: DataType = StructType(Seq(
    StructField("label", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims) throw new IllegalArgumentException(
      s"$prettyName: vector has ${v.numElements()} dims, centroids have $dims")
    var bestD = Long.MaxValue
    var bestLabel = 0L
    var c = 0
    while (c < labels.length) {
      var acc = 0.0
      var j = 0
      while (j < dims) {
        val d = v.getFloat(j).toDouble - cents(c * dims + j).toDouble
        acc += d * d
        j += 1
      }
      val dq = math.floor(math.sqrt(acc) * 10000.0 + 0.5).toLong
      if (dq < bestD) { bestD = dq; bestLabel = labels(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestLabel, bestD))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("centroids", cents, "float[]")
      val lb = ctx.addReferenceObj("centLabels", labels, "long[]")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val bestD = ctx.freshName("bestD"); val bestL = ctx.freshName("bestL")
      val c = ctx.freshName("c"); val acc = ctx.freshName("acc")
      val j = ctx.freshName("j"); val diff = ctx.freshName("diff")
      val dq = ctx.freshName("dq")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException($err + ": vector has " +
         |    $v.numElements() + " dims, centroids have $dims");
         |}
         |long $bestD = Long.MAX_VALUE;
         |long $bestL = 0L;
         |for (int $c = 0; $c < ${labels.length}; $c++) {
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dims; $j++) {
         |    double $diff = (double)$v.getFloat($j) - (double)$cb[$c * $dims + $j];
         |    $acc += $diff * $diff;
         |  }
         |  long $dq = (long) java.lang.Math.floor(java.lang.Math.sqrt($acc) * 10000.0 + 0.5);
         |  if ($dq < $bestD) { $bestD = $dq; $bestL = $lb[$c]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Long.valueOf($bestL), java.lang.Long.valueOf($bestD) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer twin of `NearestCentroid` for QUANTIZED vectors (`array<bigint>`
  * components, the repo's floor(x·10⁴ + 0.5) form): distance is the exact
  * integer squared L2 — no sqrt, no doubles, so assignment is bit-identical
  * in every engine and the iterative Lloyd's built on it is DuckDB-
  * replicable (what lets knn_ivf_trained / knn_pq_trained carry real
  * oracles instead of rows-only checks). Same narrow-projection shape and
  * lowest-label tie contract as the float kernel. */
case class NearestCentroidLong(child: Expression, labels: Array[Long],
                               cents: Array[Long], dims: Int)
    extends UnaryExpression {
  require(labels.nonEmpty, "nearest_centroid_long: empty centroid table")
  require(cents.length == labels.length * dims,
    s"nearest_centroid_long: ${labels.length} labels × $dims dims != ${cents.length} values")
  require(labels.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "nearest_centroid_long: labels must be strictly ascending (tie-break contract)")

  override def prettyName: String = "nearest_centroid_long"
  override def dataType: DataType = StructType(Seq(
    StructField("label", LongType, nullable = false),
    StructField("d", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims) throw new IllegalArgumentException(
      s"$prettyName: vector has ${v.numElements()} dims, centroids have $dims")
    var bestD = Long.MaxValue
    var bestLabel = 0L
    var c = 0
    while (c < labels.length) {
      var acc = 0L
      var j = 0
      while (j < dims) {
        val d = v.getLong(j) - cents(c * dims + j)
        acc += d * d
        j += 1
      }
      if (acc < bestD) { bestD = acc; bestLabel = labels(c) }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestLabel, bestD))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("centroidsL", cents, "long[]")
      val lb = ctx.addReferenceObj("centLabelsL", labels, "long[]")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val bestD = ctx.freshName("bestD"); val bestL = ctx.freshName("bestL")
      val c = ctx.freshName("c"); val acc = ctx.freshName("acc")
      val j = ctx.freshName("j"); val diff = ctx.freshName("diff")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException($err + ": vector has " +
         |    $v.numElements() + " dims, centroids have $dims");
         |}
         |long $bestD = Long.MAX_VALUE;
         |long $bestL = 0L;
         |for (int $c = 0; $c < ${labels.length}; $c++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < $dims; $j++) {
         |    long $diff = $v.getLong($j) - $cb[$c * $dims + $j];
         |    $acc += $diff * $diff;
         |  }
         |  if ($acc < $bestD) { $bestD = $acc; $bestL = $lb[$c]; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Long.valueOf($bestL), java.lang.Long.valueOf($bestD) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the assignment kernel. */
object centroids {
  /** `struct(label, d)` of the nearest centroid (quantized L2, lowest-label
    * ties). `table` rows are (label, vector); labels need not be contiguous. */
  def nearest(vec: Column, table: Seq[(Long, Array[Float])]): Column = {
    val sorted = table.sortBy(_._1)
    val dims = sorted.head._2.length
    require(sorted.forall(_._2.length == dims),
      s"nearest_centroid: ragged centroid table (expected $dims dims)")
    Bridge.column(NearestCentroid(Bridge.expression(vec),
      sorted.map(_._1).toArray, sorted.flatMap(_._2).toArray, dims))
  }

  /** Integer-exact variant over quantized `array<bigint>` vectors:
    * `struct(label, d)` with d = exact integer squared L2. */
  def nearestLong(vec: Column, table: Seq[(Long, Array[Long])]): Column = {
    val sorted = table.sortBy(_._1)
    val dims = sorted.head._2.length
    require(sorted.forall(_._2.length == dims),
      s"nearest_centroid_long: ragged centroid table (expected $dims dims)")
    Bridge.column(NearestCentroidLong(Bridge.expression(vec),
      sorted.map(_._1).toArray, sorted.flatMap(_._2).toArray, dims))
  }
}
