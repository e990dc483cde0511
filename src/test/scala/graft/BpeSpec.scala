package graft

import graft.operators.Bpe

/** B34b/B34c — BPE training loop + apply (operators.Bpe): the greedy
  * left-to-right fold semantics the oracle's list_reduce replays, the
  * driver-loop argmax order, and the dictionary-encode apply path. */
class BpeSpec extends SparkSpec {

  private def applyOne(word: String, l: String, r: String): Seq[String] = {
    import spark.implicits._
    val df = spark.createDataFrame(Seq(Tuple1(word))).toDF("w")
      .selectExpr("transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms")
      .selectExpr(Bpe.applyMergeExpr(Bpe.Merge(l, r, 0L)) + " AS syms")
    df.as[Seq[String]].head()
  }

  test("merge fold is greedy left-to-right, non-overlapping") {
    // the canonical tie chain: "aaa" merges the FIRST pair only (the
    // merged symbol cannot immediately re-serve as l)
    assert(applyOne("aaa", "a", "a") === Seq("aa", "a"))
    assert(applyOne("aaaa", "a", "a") === Seq("aa", "aa"))
    assert(applyOne("aaaaa", "a", "a") === Seq("aa", "aa", "a"))
    // back-to-back disjoint pairs all merge
    assert(applyOne("ababab", "a", "b") === Seq("ab", "ab", "ab"))
    // no match leaves the word untouched; single symbol passes through
    assert(applyOne("xyz", "a", "b") === Seq("x", "y", "z"))
    assert(applyOne("a", "a", "a") === Seq("a"))
  }

  test("merged symbols cascade in later iterations") {
    // after (a,b)->ab, a second rule (ab,c) must see "ab" as ONE symbol
    import spark.implicits._
    val df = spark.createDataFrame(Seq(Tuple1("abcabc"))).toDF("w")
      .selectExpr("transform(sequence(1, length(w)), i -> substring(w, i, 1)) AS syms")
      .selectExpr(Bpe.applyMergeExpr(Bpe.Merge("a", "b", 0L)) + " AS syms")
      .selectExpr(Bpe.applyMergeExpr(Bpe.Merge("ab", "c", 0L)) + " AS syms")
    assert(df.as[Seq[String]].head() === Seq("abc", "abc"))
  }

  test("train picks the frequency-weighted argmax with (n desc, l asc, r asc) ties") {
    // corpus: "ab" ×3, "cd" ×3 → pair counts tie at 3; (a,b) < (c,d)
    val docs = spark.createDataFrame(Seq(
      (1L, "ab ab cd"), (2L, "ab cd cd"))).toDF("doc_id", "text")
    val (merges, words) = Bpe.train(docs, iters = 2)
    assert(merges.map(m => (m.l, m.r, m.n)) === Seq(("a", "b", 3L), ("c", "d", 3L)))
    // after both merges every word is a single symbol
    import spark.implicits._
    val syms = words.selectExpr("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(syms("ab") === Seq("ab") && syms("cd") === Seq("cd"))
  }

  test("merge-only training paths yield the identical merge tables (r9 ADVICE)") {
    // trainMerges/trainBatchedMerges skip the final word-table materialize
    // for callers that discard it; the merge SEQUENCE must be untouched
    val docs = spark.createDataFrame(Seq(
      (1L, "ab ab cd aab"), (2L, "ab cd cd bba"))).toDF("doc_id", "text")
    assert(Bpe.trainMerges(docs, iters = 3) === Bpe.train(docs, iters = 3)._1)
    assert(Bpe.trainBatchedMerges(docs, scans = 2, batchM = 4, poolC = 8) ===
      Bpe.trainBatched(docs, scans = 2, batchM = 4, poolC = 8)._1)
  }

  test("wordSymLens dictionary-encode matches a direct per-word application") {
    val docs = spark.createDataFrame(Seq(
      (1L, "aab aab bba"), (2L, "aab bba bba ab"))).toDF("doc_id", "text")
    val merges = Bpe.trainedMerges(docs, "memo-test-" + System.nanoTime(), 2)
    assert(merges.size === 2)
    import spark.implicits._
    val lens = Bpe.applyMerges(docs, merges)
      .selectExpr("word", "CAST(size(syms) AS BIGINT) AS n_sym")
      .as[(String, Long)].collect().toMap
    // every distinct word present, every length within [1, len(word)]
    assert(lens.keySet === Set("aab", "bba", "ab"))
    lens.foreach { case (w, n) => assert(n >= 1L && n <= w.length.toLong) }
  }

  test("compiled kernel == per-rule SQL fold chain (differential, codegen on AND off)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // adversarial rules: overlapping self-merges, cascades, a rule whose l
    // is a previously-merged symbol, a never-matching rule
    val rules = Seq(("a", "a"), ("aa", "b"), ("b", "c"), ("x", "y"), ("aab", "bc"),
      // multi-byte symbols: UTF8String equality/concat must agree with the
      // SQL fold's string ops on non-ASCII characters
      ("é", "中"), ("é中", "a"))
    val words = Seq("aaaaa", "aaab", "aabbc", "aabc", "abcabc", "xyxy", "q", "",
      "aaaabbcc", "bcbc", "ax", "ya", "aabbcaabbc", "é中a", "éé中中", "aé中")
    val base = words.toDF("word")
      .select(col("word"),
        org.apache.spark.sql.functions.expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))").as("syms"))
    def viaFold() = rules.foldLeft(base) { (df, r) =>
      df.selectExpr("word", Bpe.applyMergeExpr(Bpe.Merge(r._1, r._2, 0L)) + " AS syms")
    }.as[(String, Seq[String])].collect().toMap
    def viaKernel() = base
      .select(col("word"), graft.functions.bpe.applyMerges(col("syms"), rules).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    val fold = viaFold()
    assert(viaKernel() === fold)
    // the interpreted eval path must agree with the generated code path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(viaKernel() === fold)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // and the sf0.001 corpus end-to-end: trained merges applied both ways
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val merges = Bpe.trainedMerges(docs, dir)
    val viaF = merges.foldLeft(Bpe.wordTable(docs)) { (df, m) =>
      df.selectExpr("word", "freq", Bpe.applyMergeExpr(m) + " AS syms")
    }.selectExpr("word", "syms").as[(String, Seq[String])].collect().toMap
    val viaK = Bpe.applyMerges(docs, merges)
      .selectExpr("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(viaK === viaF)
  }

  test("kernel passes null elements through untouched — no NPE (r7 ADVICE)") {
    import spark.implicits._
    val df = spark.createDataFrame(Seq(Tuple1(Seq("a", null, "a", "b"))))
      .toDF("syms")
    // null can never match a rule side; a merge across it must not happen
    val out = df.select(
        graft.functions.bpe.applyMerges(
          org.apache.spark.sql.functions.col("syms"), Seq(("a", "b"))).as("s"))
      .as[Seq[String]].head()
    assert(out === Seq("a", null, "ab"))
    // output type mirrors the input's element nullability
    val dt = df.select(graft.functions.bpe.applyMerges(
      org.apache.spark.sql.functions.col("syms"), Seq(("a", "b")))).schema.head.dataType
    assert(dt === org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = true))
  }

  test("control-separator words are excluded from the word table (oracle lock-step guard)") {
    val docs = spark.createDataFrame(Seq(
      (1L, s"ok ok bad${31.toChar}x also${30.toChar}bad and${29.toChar}this"),
      (2L, "ok fine"))).toDF("doc_id", "text")
    import spark.implicits._
    val words = Bpe.wordTable(docs).select("word").as[String].collect().toSet
    assert(words === Set("ok", "fine"))
  }
}
