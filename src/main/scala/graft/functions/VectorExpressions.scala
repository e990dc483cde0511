package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Whole-stage-codegen'd vector distance kernels over `ARRAY<FLOAT>`.
  *
  * The reference engine's distance kernel is hnswlib's SIMD L2/IP loop
  * (see /root/reference/acorn.py:29 `hnswlib.Index(space='l2', dim=2048)`).
  * Spark-first equivalent: a native Catalyst `BinaryExpression` whose
  * `doGenCode` emits a tight primitive `float` loop directly inside the
  * generated stage — no boxing, no UDF serialization, stays inside
  * WholeStageCodegen so the scan → score → TakeOrdered pipeline fuses.
  *
  * Accumulation is in `double` (matches DuckDB's list_distance /
  * list_cosine_similarity semantics used by the correctness oracle).
  */
abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  /** Emit the scalar loop: read arrays `a`,`b` of length `n`, assign `result`. */
  protected def loopBody(ctx: CodegenContext, a: String, b: String, n: String, result: String): String
  protected def evalArrays(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(l: Any, r: Any): Any =
    evalArrays(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  /** Dimension mismatch is a data bug — fail loudly (hnswlib enforces dim
    * at add_items; UnsafeArrayData would otherwise read out of bounds and
    * return garbage scores silently). */
  protected def checkDims(na: Int, nb: Int): Unit =
    if (na != nb) throw new IllegalArgumentException(
      s"$prettyName: vector dimensions differ ($na vs $nb)")

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException($err + ": vector dimensions differ (" +
         |    $n + " vs " + $b.numElements() + ")");
         |}
         |${loopBody(ctx, a, b, n, ev.value)}
       """.stripMargin
    })
}

/** dot(a, b) */
case class DotProduct(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "vec_dot"
  override protected def loopBody(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) { $acc += (double)$a.getFloat($i) * (double)$b.getFloat($i); }
       |$result = $acc;
     """.stripMargin
  }
  override protected def evalArrays(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Euclidean distance sqrt(sum((a-b)^2)) */
case class L2Distance(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "vec_l2"
  override protected def loopBody(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val acc = ctx.freshName("acc"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
    s"""
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
       |  $acc += $d * $d;
       |}
       |$result = java.lang.Math.sqrt($acc);
     """.stripMargin
  }
  override protected def evalArrays(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble; acc += d * d; i += 1 }
    math.sqrt(acc)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** cosine similarity dot/(|a||b|), one fused pass */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "vec_cosine"
  override protected def loopBody(ctx: CodegenContext, a: String, b: String, n: String, result: String): String = {
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
    s"""
       |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = (double)$a.getFloat($i); double $y = (double)$b.getFloat($i);
       |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
       |}
       |$result = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
     """.stripMargin
  }
  override protected def evalArrays(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Integer dot product over `ARRAY<BIGINT>` — exact (no accumulation-order
  * sensitivity), so both engines agree bit-for-bit. Replaces the
  * interpreted `aggregate(zip_with(a, b, ...))` higher-order-function form
  * in hot paths: HOFs evaluate their lambda per element outside
  * whole-stage codegen (one boxed function call per element), while this
  * kernel is a primitive `long` loop fused into the generated stage. */
case class DotProductLong(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_dot_long"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$prettyName: vector dimensions differ ($n vs ${b.numElements()})")
    var acc = 0L; var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException($err + ": vector dimensions differ (" +
         |    $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) { $acc += $a.getLong($i) * $b.getLong($i); }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** floor(x·10⁴ + 0.5) per component over ARRAY<FLOAT> → ARRAY<BIGINT> —
  * the shared ×10⁴ quantization ([[graft.functions.quantizeVecSql]]) as a
  * native kernel. The `transform()` HOF form evaluates a boxed lambda per
  * element outside whole-stage codegen (~2048 boxed Longs + one boxed
  * array per ROW at the reference width — the allocation surface the r11
  * kmeansdiag probe names as the E-step's GC trigger); this emits one
  * primitive loop into the generated stage and one compact
  * UnsafeArrayData per row. Arithmetic is token-identical to the SQL form
  * (float→double widen, ×10000.0, +0.5, Math.floor→long — Spark's
  * floor(double) is exactly (long) Math.floor), so every oracle-gated
  * caller is bit-unchanged (VectorKernelSpec pins kernel ≡ HOF). */
case class QuantizeVec(child: Expression) extends UnaryExpression {
  override def prettyName: String = "vec_quantize"

  // Parquet-read float arrays are containsNull=true by schema even when
  // the data never holds a null, so the output nullability mirrors the
  // input's. A null ELEMENT quantizes to a null element — exactly the
  // transform() HOF semantics (floor(null)=null) the kernel ≡ HOF spec
  // pins; the primitive no-boxing path still runs whenever the row's
  // array actually holds no nulls, i.e. always on real data (r11 ADVICE:
  // the previous kernel declared containsNull=false and read null slots
  // as garbage/0, silently diverging from the HOF on nullable input).
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = elemNullable)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var hasNull = false
    if (elemNullable) {
      var i = 0
      while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    }
    if (!hasNull) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble * 10000.0 + 0.5).toLong
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          out(i) = math.floor(a.getFloat(i).toDouble * 10000.0 + 0.5).toLong
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val primitive =
        s"""
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (long) java.lang.Math.floor((double) $v.getFloat($i) * 10000.0D + 0.5D);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      if (!elemNullable) {
        s"""
           |final int $n = $v.numElements();
           |$primitive
         """.stripMargin
      } else {
        val hn = ctx.freshName("hasNull"); val bo = ctx.freshName("boxed"); val j = ctx.freshName("j")
        s"""
           |final int $n = $v.numElements();
           |boolean $hn = false;
           |for (int $j = 0; $j < $n && !$hn; $j++) { $hn = $v.isNullAt($j); }
           |if (!$hn) {
           |  $primitive
           |} else {
           |  Object[] $bo = new Object[$n];
           |  for (int $j = 0; $j < $n; $j++) {
           |    if (!$v.isNullAt($j)) {
           |      $bo[$j] = (long) java.lang.Math.floor((double) $v.getFloat($j) * 10000.0D + 0.5D);
           |    }
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bo);
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the vector kernels. */
object vectors {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def dotLong(a: Column, b: Column): Column =
    Bridge.column(DotProductLong(Bridge.expression(a), Bridge.expression(b)))
  def l2(a: Column, b: Column): Column =
    Bridge.column(L2Distance(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def quantize(v: Column): Column =
    Bridge.column(QuantizeVec(Bridge.expression(v)))
}
