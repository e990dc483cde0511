package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Codegen'd membership-count kernel against a broadcast model-state set.
  *
  * The streaming decontamination path needs, per arriving document, the
  * count of its shingle hashes that appear in the (bounded, driver-held)
  * benchmark set — row-local work against model state, the same contract
  * as the KMeans/PQ literal kernels. The composable alternatives lose:
  * `array_intersect` against a big literal rebuilds a hash set per ROW,
  * an exploded join needs a per-doc re-aggregation (stateful in a stream),
  * and `filter(x, array_contains(...))` is an O(n·k) interpreted scan.
  * This kernel ships the SORTED set once as a reference object and binary-
  * searches each element — O(k log n) per row inside WholeStageCodegen,
  * stateless, so the streaming plan stays a narrow append-mode map.
  */
/** PRECONDITION: `sortedSet` must be strictly ascending (binary search is
  * meaningless otherwise). NOT validated here — Catalyst copies/transforms
  * this node on every plan rewrite (each streaming micro-batch re-plans),
  * and a constructor-time O(n) scan of a multi-million-entry set would run
  * per copy (r7 ADVICE). Construct via [[sets.countIn]], which sorts and
  * dedups once on the driver and so guarantees the invariant. */
case class CountInSortedSet(child: Expression, sortedSet: Array[Long])
    extends UnaryExpression {

  override def prettyName: String = "count_in_sorted_set"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    var n = 0L
    var i = 0
    while (i < xs.numElements()) {
      if (java.util.Arrays.binarySearch(sortedSet, xs.getLong(i)) >= 0) n += 1L
      i += 1
    }
    n
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val set = ctx.addReferenceObj("sortedSet", sortedSet, "long[]")
      val i = ctx.freshName("i")
      s"""
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if (java.util.Arrays.binarySearch($set, $v.getLong($i)) >= 0) {
         |    ${ev.value}++;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for model-state set kernels. */
object sets {
  /** Count of `xs` elements (array<bigint>) present in `set` — `set` is
    * sorted + deduped ONCE here on the driver (establishing the kernel's
    * strictly-ascending precondition) and rides as a codegen reference
    * object; plan copies share the validated array by reference. */
  def countIn(xs: Column, set: Array[Long]): Column =
    Bridge.column(CountInSortedSet(Bridge.expression(xs), set.sorted.distinct))
}
