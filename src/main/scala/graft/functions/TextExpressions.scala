package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram shingling kernel.
  *
  * Shingling is the inner loop of every text-dedup operator (B2/B3/B15):
  * at corpus scale it runs once per token of every document. The
  * composable alternatives both lose:
  *
  *  - `posexplode` + two `lead` windows (the previous form) must first
  *    SHUFFLE the fully tokenized corpus (one row per token, partitioned
  *    by doc_id, sorted by position) just to see adjacent tokens — at
  *    100 TB that is a shuffle of everything, spent on an operation that
  *    is local to each row.
  *  - `transform(sequence(...), i -> concat_ws(...))` stays narrow but
  *    higher-order functions are `CodegenFallback`: per-element
  *    interpreted lambda dispatch inside the hottest loop.
  *
  * This expression is a narrow, whole-stage-codegen'd map: tokens in,
  * `len-n+1` space-joined n-grams out, no shuffle anywhere. Output
  * strings are byte-identical to `concat_ws(' ', t_i..t_{i+n-1})`, so
  * the md5-based shingle hashes shared with the DuckDB oracle
  * (`DuckDialect.Shingles`) are unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = math.max(0, toks.numElements() - n + 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sp = ctx.addReferenceObj("shingleSep", space,
        "org.apache.spark.unsafe.types.UTF8String")
      val m = ctx.freshName("m"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val parts = ctx.freshName("parts")
      s"""
         |int $m = $v.numElements() - ${n - 1};
         |if ($m < 0) $m = 0;
         |Object[] $out = new Object[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[$n];
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $v.getUTF8String($i + $j);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($sp, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level API for the text kernels. */
object text {
  /** All `size(tokens)-n+1` space-joined word n-grams of `tokens`
    * (duplicates kept — apply `array_distinct`/`distinct` downstream if
    * set semantics are needed). */
  def shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
}
