package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
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

/** floor(((x − mn)·255) / (mx − mn)) per component over ARRAY<DOUBLE> →
  * ARRAY<BIGINT> — the sq8 scalar quantization as a native kernel. The
  * `transform()` HOF form pays a boxed lambda call per element outside
  * whole-stage codegen (at d=2048 that is ~4096 boxed Longs per row
  * across the qa/qb pair — the r11 QuantizeVec pathology, resurfaced by
  * the wide sq8 gates at 18.8 s/entry); this emits one primitive loop.
  * Arithmetic is token-identical to the SQL form: (x − mn) · 255.0, then
  * the division, then floor — every oracle-gated caller is bit-unchanged
  * (kernel ≡ HOF spec-pinned). Null elements quantize to null (the
  * transform() semantics); output nullability mirrors the input's. */
case class Sq8QuantizeVec(vec: Expression, mnE: Expression, mxE: Expression)
    extends TernaryExpression {
  override def prettyName: String = "vec_sq8"
  override def first: Expression = vec
  override def second: Expression = mnE
  override def third: Expression = mxE

  private def elemNullable: Boolean = vec.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = elemNullable)
  override def nullable: Boolean = vec.nullable || mnE.nullable || mxE.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, mnE.dataType, mxE.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, double, double), got $other")
    }

  override def nullSafeEval(v0: Any, mn0: Any, mx0: Any): Any = {
    val a = v0.asInstanceOf[ArrayData]
    val mn = mn0.asInstanceOf[Double]; val mx = mx0.asInstanceOf[Double]
    // Degenerate bounds fail loudly (r12 ADVICE): mx == mn divides by
    // zero and floor(±Infinity) casts to Long.MIN/MAX silently. Every
    // in-repo caller passes calibrationStats-validated bounds, but the
    // kernel is public API via vectors.sq8 (the SqDistLong convention).
    if (mx - mn == 0.0) throw new IllegalArgumentException(
      s"$prettyName: degenerate bounds mn == mx == $mn — division by zero " +
        "would silently cast floor(±Infinity) to Long.MIN/MAX; pass " +
        "calibrationStats-validated bounds")
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
        out(i) = math.floor(((a.getDouble(i) - mn) * 255.0) / (mx - mn)).toLong
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          out(i) = math.floor(((a.getDouble(i) - mn) * 255.0) / (mx - mn)).toLong
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, mx) => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val primitive =
        s"""
           |long[] $out = new long[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = (long) java.lang.Math.floor((($v.getDouble($i) - $mn) * 255.0D) / ($mx - $mn));
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val boundsGuard =
        s"""
           |if ($mx - $mn == 0.0D) {
           |  throw new IllegalArgumentException($err + ": degenerate bounds mn == mx == " +
           |    $mn + " - division by zero would silently cast floor(+-Infinity)" +
           |    " to Long.MIN/MAX; pass calibrationStats-validated bounds");
           |}
         """.stripMargin
      if (!elemNullable) {
        s"""
           |$boundsGuard
           |final int $n = $v.numElements();
           |$primitive
         """.stripMargin
      } else {
        val hn = ctx.freshName("hasNull"); val bo = ctx.freshName("boxed"); val j = ctx.freshName("j")
        s"""
           |$boundsGuard
           |final int $n = $v.numElements();
           |boolean $hn = false;
           |for (int $j = 0; $j < $n && !$hn; $j++) { $hn = $v.isNullAt($j); }
           |if (!$hn) {
           |  $primitive
           |} else {
           |  Object[] $bo = new Object[$n];
           |  for (int $j = 0; $j < $n; $j++) {
           |    if (!$v.isNullAt($j)) {
           |      $bo[$j] = (long) java.lang.Math.floor((($v.getDouble($j) - $mn) * 255.0D) / ($mx - $mn));
           |    }
           |  }
           |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bo);
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(vec = f, mnE = s, mxE = t)
}

/** Σ (a_i − b_i)² over ARRAY<BIGINT> pairs — the integer squared-L2 as a
  * native kernel, replacing the interpreted `aggregate(zip_with(...))`
  * HOF ([[graft.functions.sqDistLongSql]]) in hot paths. Integer sums are
  * order-insensitive, so the kernel is trivially bit-identical to the
  * HOF on non-null input; a null ELEMENT nulls the whole sum (the HOF's
  * acc + null semantics), and a length mismatch fails loudly (the
  * DotProductLong convention — the HOF's silent null would hide the
  * data bug). */
case class SqDistLong(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_sqdist_long"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }

  private def anyElemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$prettyName: vector dimensions differ ($n vs ${b.numElements()})")
    if (anyElemNullable) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    var acc = 0L; var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val nullCheck = if (anyElemNullable) {
        val j = ctx.freshName("j")
        s"""
           |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; }
           |}
         """.stripMargin
      } else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException($err + ": vector dimensions differ (" +
         |    $n + " vs " + $b.numElements() + ")");
         |}
         |$nullCheck
         |if (!${ev.isNull}) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** Sign-bit packing at ANY width: group g of the output packs the signs
  * of elements g·32 … g·32+31 (bit j set iff v[g·32+j] > 0) into one
  * non-negative BIGINT — [[graft.operators.Cascade.bqHalf]]'s CASE-term
  * construction generalized past the 64-d lo/hi pair (2048-d needs 64
  * groups; 2048 explicit CASE terms would blow the Janino method-size
  * budget, this is one primitive loop). A null element packs as bit 0 —
  * exactly the SQL CASE's `NULL > 0.0 → ELSE 0` arm, so the oracle's
  * list_transform/CASE form is bit-identical. */
case class BqPackVec(child: Expression, groups: Int) extends UnaryExpression {
  override def prettyName: String = "vec_bqpack"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    // EXACT length, not >= (r12 ADVICE): a groups argument smaller than
    // the real width would silently pack only a prefix for the Hamming
    // stage while downstream stages use the full vector — an inconsistent
    // funnel with no error. A width mismatch must fail loudly here.
    require(a.numElements() == groups * 32,
      s"$prettyName: input has ${a.numElements()} elements, needs exactly " +
        s"${groups * 32} (groups=$groups × 32) — a prefix pack would feed " +
        "the Hamming stage a different vector than the later stages see")
    val out = new Array[Long](groups)
    var g = 0
    while (g < groups) {
      var acc = 0L; var j = 0
      while (j < 32) {
        val i = g * 32 + j
        if (!(elemNullable && a.isNullAt(i)) && a.getFloat(i) > 0.0f)
          acc |= (1L << j)
        j += 1
      }
      out(g) = acc
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val g = ctx.freshName("g")
      val j = ctx.freshName("j"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val nullGuard = if (elemNullable) s"!$v.isNullAt($i) && " else ""
      s"""
         |if ($v.numElements() != ${groups * 32}) {
         |  throw new IllegalArgumentException($err + ": input has " +
         |    $v.numElements() + " elements, needs exactly " + ${groups * 32} +
         |    " (a prefix pack would feed the Hamming stage a different" +
         |    " vector than the later stages see)");
         |}
         |long[] $out = new long[$groups];
         |for (int $g = 0; $g < $groups; $g++) {
         |  long $acc = 0L;
         |  for (int $j = 0; $j < 32; $j++) {
         |    final int $i = $g * 32 + $j;
         |    if ($nullGuard$v.getFloat($i) > 0.0f) { $acc |= (1L << $j); }
         |  }
         |  $out[$g] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ bit_count(a_i ⊕ b_i) over ARRAY<BIGINT> pairs — Hamming distance
  * over packed sign codes at any width (the 64-d entries' explicit
  * `bit_count(lo ^ q_lo) + bit_count(hi ^ q_hi)` generalized). Integer,
  * order-insensitive; null element nulls the sum (the HOF semantics);
  * length mismatch fails loudly (the DotProductLong convention). */
case class HammingDistLong(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "vec_hamming_long"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }

  private def anyElemNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"$prettyName: code lengths differ ($n vs ${b.numElements()})")
    if (anyElemNullable) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        i += 1
      }
    }
    var acc = 0L; var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val nullCheck = if (anyElemNullable) {
        val j = ctx.freshName("j")
        s"""
           |for (int $j = 0; $j < $n && !${ev.isNull}; $j++) {
           |  if ($a.isNullAt($j) || $b.isNullAt($j)) { ${ev.isNull} = true; }
           |}
         """.stripMargin
      } else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException($err + ": code lengths differ (" +
         |    $n + " vs " + $b.numElements() + ")");
         |}
         |$nullCheck
         |if (!${ev.isNull}) {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** The A45 derived-wide construction as a native kernel: wide[j] =
  * (float)((double)v[((j%dims)+(j/dims))%dims] · ((j/dims)%5+(j%dims)%3+1))
  * over ARRAY<FLOAT> — one float round per slot, bit-identical to the
  * `transform(sequence(0, w−1), ...)` HOF form it replaces (the HOF paid
  * ~2048 boxed lambda calls per row per DERIVATION, and every 2048-d
  * entry derives the wide frame in several plan branches). Null source
  * elements propagate to every slot that reads them (the element_at
  * semantics); output nullability mirrors the input's. */
case class WidenVec(child: Expression, dims: Int, wideDims: Int)
    extends UnaryExpression {
  override def prettyName: String = "vec_widen"

  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = elemNullable)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    require(a.numElements() >= dims,
      s"$prettyName: input has ${a.numElements()} elements, needs >= $dims")
    var hasNull = false
    if (elemNullable) {
      var i = 0
      while (i < dims && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    }
    if (!hasNull) {
      val out = new Array[Float](wideDims)
      var j = 0
      while (j < wideDims) {
        val src = ((j % dims) + (j / dims)) % dims
        val mult = (j / dims) % 5 + (j % dims) % 3 + 1
        out(j) = (a.getFloat(src).toDouble * mult).toFloat
        j += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](wideDims)
      var j = 0
      while (j < wideDims) {
        val src = ((j % dims) + (j / dims)) % dims
        val mult = (j / dims) % 5 + (j % dims) % 3 + 1
        if (!a.isNullAt(src)) out(j) = (a.getFloat(src).toDouble * mult).toFloat
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val src = ctx.freshName("src"); val mult = ctx.freshName("mult")
      val err = ctx.addReferenceObj("kernelName", prettyName, "java.lang.String")
      val guard =
        s"""
           |if ($v.numElements() < $dims) {
           |  throw new IllegalArgumentException($err + ": input has " +
           |    $v.numElements() + " elements, needs >= " + $dims);
           |}
         """.stripMargin
      val primitive =
        s"""
           |float[] $out = new float[$wideDims];
           |for (int $j = 0; $j < $wideDims; $j++) {
           |  final int $src = (($j % $dims) + ($j / $dims)) % $dims;
           |  final int $mult = ($j / $dims) % 5 + ($j % $dims) % 3 + 1;
           |  $out[$j] = (float) ((double) $v.getFloat($src) * $mult);
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      if (!elemNullable) {
        s"""
           |$guard
           |$primitive
         """.stripMargin
      } else {
        val hn = ctx.freshName("hasNull"); val bo = ctx.freshName("boxed")
        s"""
           |$guard
           |boolean $hn = false;
           |for (int $j = 0; $j < $dims && !$hn; $j++) { $hn = $v.isNullAt($j); }
           |if (!$hn) {
           |  $primitive
           |} else {
           |  Object[] $bo = new Object[$wideDims];
           |  for (int $j = 0; $j < $wideDims; $j++) {
           |    final int $src = (($j % $dims) + ($j / $dims)) % $dims;
           |    final int $mult = ($j / $dims) % 5 + ($j % $dims) % 3 + 1;
           |    if (!$v.isNullAt($src)) {
           |      $bo[$j] = (float) ((double) $v.getFloat($src) * $mult);
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
  def sq8(v: Column, mn: Column, mx: Column): Column =
    Bridge.column(Sq8QuantizeVec(Bridge.expression(v), Bridge.expression(mn),
      Bridge.expression(mx)))
  def sqDistLong(a: Column, b: Column): Column =
    Bridge.column(SqDistLong(Bridge.expression(a), Bridge.expression(b)))
  def widen(v: Column, dims: Int, wideDims: Int): Column =
    Bridge.column(WidenVec(Bridge.expression(v), dims, wideDims))
  def bqPack(v: Column, groups: Int): Column =
    Bridge.column(BqPackVec(Bridge.expression(v), groups))
  def hammingLong(a: Column, b: Column): Column =
    Bridge.column(HammingDistLong(Bridge.expression(a), Bridge.expression(b)))
}
