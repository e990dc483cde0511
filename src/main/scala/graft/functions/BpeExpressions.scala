package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd BPE merge-table application kernel.
  *
  * The tokenizer-apply path runs every trained merge rule over every
  * distinct word's symbol array. The composable form (operators.Bpe.
  * applyMergeExpr — one `aggregate(...)` fold per rule, chr(31)-joined
  * accumulator strings, re-`split` between rules) is the exact mirror of
  * the DuckDB oracle's `list_reduce`, but higher-order functions are
  * `CodegenFallback`: an 8-rule chain is 8 stacked interpreted folds, each
  * allocating separator-joined strings per symbol — measured as THE
  * hot spot of the whole bench pass (the fold sat on one core for minutes
  * at sf0.1). This kernel applies the ENTIRE rule list in one compiled
  * pass over the symbol array, in-place, no string joins.
  *
  * Semantics are bit-equal to the fold chain (differential-tested in
  * BpeSpec): for each rule (l, r) in order, scan left-to-right; when the
  * last emitted symbol equals `l` and the current symbol equals `r`,
  * replace the last emitted symbol with the concatenation l||r. The
  * merged symbol cannot immediately re-serve as the same rule's `l`
  * (l||r != l — the fold's greedy non-overlap), and later rules see
  * merged symbols as single units (the cascade contract).
  *
  * The bit-equal-to-the-oracle claim assumes no symbol contains the
  * 0x1D–0x1F control bytes the oracle's joined-string folds use as
  * separators — guaranteed upstream by `operators.Bpe.wordTable`'s
  * WordGuardExpr filter (mirrored in the oracle's w0 CTE), not here:
  * the kernel itself is separator-free and correct for any symbols.
  */
case class BpeApplyMerges(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression {

  override def prettyName: String = "bpe_apply_merges"

  /** output nullability mirrors the input's (r7 ADVICE): a null element
    * passes through untouched (it can never match a rule side), so the
    * result contains nulls exactly when the input may. */
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  // rule sides + pre-concatenated replacements, shipped once per task as
  // reference objects (never rebuilt per row)
  private val lArr: Array[UTF8String] = rules.map(r => UTF8String.fromString(r._1)).toArray
  private val rArr: Array[UTF8String] = rules.map(r => UTF8String.fromString(r._2)).toArray
  private val mArr: Array[UTF8String] =
    rules.map(r => UTF8String.fromString(r._1 + r._2)).toArray

  override def nullSafeEval(input: Any): Any = {
    val syms = input.asInstanceOf[ArrayData]
    val n = syms.numElements()
    val cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      cur(i) = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      i += 1
    }
    var len = n
    var k = 0
    while (k < lArr.length) {
      val l = lArr(k); val r = rArr(k); val m = mArr(k)
      var w = 0
      var j = 0
      while (j < len) {
        val s = cur(j)
        // null elements never match a rule side (r7 ADVICE NPE guard)
        if (w > 0 && s != null && cur(w - 1) != null &&
          cur(w - 1).equals(l) && s.equals(r)) cur(w - 1) = m
        else { cur(w) = s; w += 1 }
        j += 1
      }
      len = w
      k += 1
    }
    val out = new Array[Any](len)
    i = 0
    while (i < len) { out(i) = cur(i); i += 1 }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val u8 = "org.apache.spark.unsafe.types.UTF8String"
      val ls = ctx.addReferenceObj("bpeL", lArr, s"$u8[]")
      val rs = ctx.addReferenceObj("bpeR", rArr, s"$u8[]")
      val ms = ctx.addReferenceObj("bpeM", mArr, s"$u8[]")
      val n = ctx.freshName("n"); val cur = ctx.freshName("cur")
      val len = ctx.freshName("len"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val w = ctx.freshName("w")
      val s = ctx.freshName("s")
      s"""
         |int $n = $v.numElements();
         |$u8[] $cur = new $u8[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $cur[$i] = $v.isNullAt($i) ? null : $v.getUTF8String($i);
         |}
         |int $len = $n;
         |for (int $k = 0; $k < ${rules.length}; $k++) {
         |  int $w = 0;
         |  for (int $j = 0; $j < $len; $j++) {
         |    $u8 $s = $cur[$j];
         |    if ($w > 0 && $s != null && $cur[$w - 1] != null
         |        && $cur[$w - 1].equals($ls[$k]) && $s.equals($rs[$k])) {
         |      $cur[$w - 1] = $ms[$k];
         |    } else { $cur[$w] = $s; $w++; }
         |  }
         |  $len = $w;
         |}
         |Object[] $out = new Object[$len];
         |for (int $i = 0; $i < $len; $i++) { $out[$i] = $cur[$i]; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the BPE kernel. */
object bpe {
  /** Apply the ordered merge-rule list to a symbol array in one compiled
    * pass — semantics identical to chaining `Bpe.applyMergeExpr` per rule
    * (the DuckDB-oracle-mirror fold), differential-tested in BpeSpec. */
  def applyMerges(syms: Column, rules: Seq[(String, String)]): Column =
    Bridge.column(BpeApplyMerges(Bridge.expression(syms), rules))
}
