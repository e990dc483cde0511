package graft

import org.apache.spark.sql.functions._
import graft.functions.vectors

class VectorKernelSpec extends SparkSpec {
  import spark.implicits._

  private val a = Array(1.0f, 2.0f, 3.0f)
  private val b = Array(4.0f, -5.0f, 6.0f)

  private def one(colFn: => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(colFn.as("r")).as[Double].head()

  test("dot product matches scalar math") {
    assert(math.abs(one(vectors.dot(col("a"), col("b"))) - (4.0 - 10.0 + 18.0)) < 1e-12)
  }

  test("l2 distance matches scalar math") {
    val expected = math.sqrt(9.0 + 49.0 + 9.0)
    assert(math.abs(one(vectors.l2(col("a"), col("b"))) - expected) < 1e-12)
  }

  test("cosine similarity matches scalar math") {
    val dot = 12.0
    val na = math.sqrt(1 + 4 + 9); val nb = math.sqrt(16 + 25 + 36)
    assert(math.abs(one(vectors.cosine(col("a"), col("b"))) - dot / (na * nb)) < 1e-12)
  }

  test("cosine of identical vectors is 1") {
    assert(math.abs(one(vectors.cosine(col("a"), col("a"))) - 1.0) < 1e-12)
  }

  test("QuantizeVec kernel equals the transform-HOF form bit-for-bit") {
    // the kernel replaced graft.functions.quantizeVecSql in every hot
    // caller (r11 kmeansdiag root-cause fix) — every oracle-gated entry
    // that quantizes depends on this identity holding on real data,
    // including the sliced matryoshka prefix
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
      vectors.quantize(col("embedding")).as("k"),
      expr(graft.functions.quantizeVecSql("embedding")).as("h"),
      vectors.quantize(expr("slice(embedding, 1, 16)")).as("k16"),
      expr(graft.functions.quantizeVecSql("slice(embedding, 1, 16)")).as("h16"))
      .as[(Array[Long], Array[Long], Array[Long], Array[Long])].collect()
    both.foreach { case (k, h, k16, h16) =>
      assert(k.sameElements(h)); assert(k16.sameElements(h16))
      assert(k16.length == 16 && k.length == 64)
    }
    // negative / boundary values round identically too
    val edge = Seq(Array(-1.25f, 0.0f, 0.00005f, -0.00005f, 3.4e4f))
      .toDF("v")
      .select(vectors.quantize(col("v")).as("k"),
        expr(graft.functions.quantizeVecSql("v")).as("h"))
      .as[(Array[Long], Array[Long])].head()
    assert(edge._1.sameElements(edge._2))
  }

  test("QuantizeVec matches the HOF on null ELEMENTS too (null in, null out)") {
    // r11 ADVICE: the kernel accepted containsNull=true input (every
    // parquet-read array is) but read null slots as garbage under an
    // output type that forbade nulls. The fix mirrors transform()
    // exactly — a null element quantizes to a null element — while the
    // primitive no-boxing path still runs on rows without nulls.
    val df = Seq(
      (0L, Seq[Option[Float]](Some(1.5f), None, Some(-0.25f))),
      (1L, Seq[Option[Float]](Some(2.0f), Some(0.0f), Some(7.125f))))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    val rows = df.select(col("id"),
        vectors.quantize(col("v")).as("k"),
        expr(graft.functions.quantizeVecSql("v")).as("h"))
      .orderBy("id")
      .collect()
    rows.foreach { r =>
      val k = r.getSeq[Any](1); val h = r.getSeq[Any](2)
      assert(k == h, s"kernel $k != HOF $h for id ${r.getLong(0)}")
    }
    assert(rows(0).getSeq[Any](1)(1) == null, "null element must stay null")
    assert(rows(1).getSeq[Any](1) == Seq(20000L, 0L, 71250L))
    // output nullability mirrors the input's (parquet arrays: true)
    val dt = df.select(vectors.quantize(col("v")).as("k")).schema("k").dataType
    assert(dt.asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
  }

  test("Sq8QuantizeVec kernel equals the transform-HOF form bit-for-bit") {
    // r12: the sq8 stage's transform() form paid boxed lambdas per
    // element (4096 boxed Longs/row at d=2048) — every funnel/sq8 entry
    // now runs this kernel, so the identity must hold on real data
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
    val stats = graft.operators.Cascade.calibrationStats(e)
    val both = e.crossJoin(broadcast(stats)).select(
      vectors.sq8(col("v"), col("mn"), col("mx")).as("k"),
      expr("transform(v, x -> CAST(floor(((x - mn) * 255.0D) / (mx - mn)) AS BIGINT))").as("h"))
      .as[(Array[Long], Array[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (k, h) => assert(k.sameElements(h)) }
  }

  test("Sq8QuantizeVec refuses degenerate mn == mx bounds loudly") {
    // r12 ADVICE: division by zero would cast floor(±Infinity) to
    // Long.MIN/MAX silently; the kernel is public API via vectors.sq8,
    // so the guard lives at the expression level, not only at
    // calibrationStats call sites
    val ex = intercept[Exception] {
      Seq(Tuple1(Array(0.1, 0.2))).toDF("v")
        .select(vectors.sq8(col("v"), lit(0.25), lit(0.25))).collect()
    }
    def hasMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("degenerate bounds")) || hasMsg(t.getCause))
    assert(hasMsg(ex))
  }

  test("BqPackVec refuses a non-exact width loudly (no silent prefix pack)") {
    // r12 ADVICE: a groups argument smaller than the real width would
    // pack only a prefix for the Hamming stage while later funnel stages
    // use the full vector — an inconsistent funnel with no error. The
    // kernel demands numElements == groups*32 exactly.
    val v64 = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val ex = intercept[Exception] {
      Seq(Tuple1(v64)).toDF("v")
        .select(vectors.bqPack(col("v"), 1)).collect()
    }
    def hasMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("needs exactly")) || hasMsg(t.getCause))
    assert(hasMsg(ex))
    // and the exact width still packs
    val ok = Seq(Tuple1(v64)).toDF("v")
      .select(vectors.bqPack(col("v"), 2)).as[Array[Long]].head()
    assert(ok.length == 2)
  }

  test("SqDistLong kernel equals the aggregate/zip_with HOF; nulls and mismatches handled") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val both = e.select(
        vectors.quantize(col("embedding")).as("q"),
        vectors.quantize(expr("reverse(embedding)")).as("r"))
      .select(vectors.sqDistLong(col("q"), col("r")).as("k"),
        expr(graft.functions.sqDistLongSql("q", "r")).as("h"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (k, h) => assert(k == h) }
    // null element nulls the whole sum — the HOF's acc + null semantics
    val withNull = Seq((Seq[Option[Long]](Some(1L), None), Seq[Option[Long]](Some(2L), Some(3L))))
      .toDF("a", "b")
      .select(vectors.sqDistLong(col("a"), col("b")).as("k"),
        expr(graft.functions.sqDistLongSql("a", "b")).as("h"))
      .collect().head
    assert(withNull.isNullAt(0) && withNull.isNullAt(1))
    // dimension mismatch fails loudly (the DotProductLong convention)
    val bad = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(vectors.sqDistLong(col("a"), col("b"))).collect()
    }
    def hasDim(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("dimensions differ")) || hasDim(t.getCause))
    assert(hasDim(ex))
  }

  test("WidenVec kernel equals the transform-HOF wide derivation bit-for-bit") {
    val dims = 64; val wide = 2048
    val hof = s"CAST(transform(sequence(0, ${wide - 1}), j -> " +
      s"CAST(element_at(CAST(embedding AS ARRAY<DOUBLE>), CAST(((j % $dims) + (j div $dims)) % $dims + 1 AS INT))" +
      s" * CAST((j div $dims) % 5 + (j % $dims) % 3 + 1 AS DOUBLE) AS FLOAT)) AS ARRAY<FLOAT>)"
    val both = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(vectors.widen(col("embedding"), dims, wide).as("k"), expr(hof).as("h"))
      .as[(Array[Float], Array[Float])].collect()
    assert(both.nonEmpty)
    both.foreach { case (k, h) =>
      assert(k.length == wide && k.sameElements(h))
    }
    // too-short input fails loudly instead of reading out of bounds
    val ex = intercept[Exception] {
      Seq(Tuple1(Array(1.0f, 2.0f))).toDF("embedding")
        .select(vectors.widen(col("embedding"), dims, wide)).collect()
    }
    def hasMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("needs >=")) || hasMsg(t.getCause))
    assert(hasMsg(ex))
  }

  test("dimension mismatch fails loudly (no silent out-of-bounds reads)") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(vectors.cosine(col("a"), col("b"))).collect()
    }
    def hasDimMessage(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("dimensions differ")) || hasDimMessage(t.getCause))
    assert(hasDimMessage(e))
  }

  test("null input yields null") {
    val df = Seq((Some(a), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(vectors.cosine(col("a"), col("b")).as("r")).collect().head
    assert(r.isNullAt(0))
  }

  test("kernel agrees between codegen and interpreted paths") {
    val df = Seq((a, b)).toDF("a", "b")
    val gen = df.select(vectors.cosine(col("a"), col("b"))).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(vectors.cosine(col("a"), col("b"))).head().getDouble(0)
      assert(gen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  // ----- integer dot kernel (the HOF replacement in multivector_maxsim) -----

  private val la = Array(3L, -2L, 7L)
  private val lb = Array(5L, 4L, -1L)

  test("long dot matches scalar math and the HOF form it replaced") {
    val df = Seq((la, lb)).toDF("a", "b")
    val kernel = df.select(vectors.dotLong(col("a"), col("b")).as("r")).as[Long].head()
    assert(kernel == 15L - 8L - 7L)
    val hof = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS r")
      .as[Long].head()
    assert(kernel == hof)
  }

  test("long dot: codegen and interpreted paths agree; mismatched dims fail") {
    val df = Seq((la, lb)).toDF("a", "b")
    val gen = df.select(vectors.dotLong(col("a"), col("b"))).head().getLong(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(vectors.dotLong(col("a"), col("b"))).head().getLong(0)
      assert(gen == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val bad = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(vectors.dotLong(col("a"), col("b"))).collect()
    }
    def hasDimMessage(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("dimensions differ")) || hasDimMessage(t.getCause))
    assert(hasDimMessage(e))
  }
}
