package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and APPLY — the published Sennrich
  * et al. 2016 algorithm in its distributed form. Training never touches the
  * token stream after the first scan: the corpus compresses into the
  * DISTINCT-WORD frequency table (word, freq, syms) — the classic BPE
  * word-frequency compression — and every iteration is
  *   (1) one map-side-combined shuffle keyed by adjacent symbol pair
  *       (weighted by word freq) feeding a TakeOrdered(1) argmax, then
  *   (2) a NARROW fold-left merge application over each word's symbols.
  * The driver holds only the N-entry merge table (the KMeans.fitInt
  * driver-loop precedent: bounded model state, never corpus rows). At
  * 100 TB the distinct-word table is itself large but many orders smaller
  * than the corpus; it is cached once and each iteration reshuffles only
  * (pair, partial-count) rows.
  *
  * Merge application is GREEDY LEFT-TO-RIGHT within a word, the reference
  * semantics: symbols fold into a chr(31)-joined string, and a pair merges
  * exactly when the accumulated last symbol equals `l` (checked as an
  * ends-with on the separator-anchored suffix — symbols never contain the
  * separator) and the next symbol equals `r`. A merged symbol cannot
  * immediately re-merge as the `l` of the same rule ("aaa" + (a,a) →
  * [aa, a], not [aa, aa] — the fold's acc then ends with "aa", not "a"),
  * which is precisely the non-overlapping greedy scan. The identical fold
  * runs in the DuckDB oracle via list_reduce, so training is replayable
  * end-to-end in SQL (DuckDialect.bpeChain).
  */
object Bpe {

  final case class Merge(l: String, r: String, n: Long)

  /** Default training iterations — small enough that the oracle's unrolled
    * CTE chain stays readable, large enough that merges cascade (merged
    * symbols re-merge in later iterations). */
  val DefaultIters = 8

  private def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")

  /** Words containing the BPE control separators are EXCLUDED from the
    * word table (r7 ADVICE): the DuckDB oracle replays merges through
    * chr(31)-joined accumulator strings (and the batched-selection fold
    * adds chr(29)/chr(30) framing), so a corpus token containing one of
    * those bytes would silently diverge engine from oracle. The identical
    * filter sits in the oracle's w0 CTE (DuckDialect.bpeChain), keeping
    * both dialects in lock-step; real text never carries 0x1D–0x1F. */
  val WordGuardExpr: String =
    "NOT (contains(word, chr(29)) OR contains(word, chr(30)) OR contains(word, chr(31)))"

  /** The END-OF-WORD marker (Sennrich et al. 2016 §3.2): appended as a
    * final symbol so merges distinguish word-internal from word-final
    * contexts ("er" inside a word vs "er" ending one get separate
    * statistics — real tokenizers need the distinction to re-segment
    * text reversibly). Plain ASCII, so both dialects handle it verbatim. */
  val EowMarker = "</w>"

  /** Initial symbol table: one row per distinct word, syms = its characters
    * (+ the `</w>` end-of-word marker when `eow` — the Sennrich form).
    * `docs` needs a `text` column; tokenization is the corpus-wide
    * whitespace tokenizer (Dedup.TokExpr) shared with every text entry. */
  def wordTable(docs: DataFrame, eow: Boolean = false): DataFrame = {
    val marker = if (eow) s" || array('$EowMarker')" else ""
    docs.selectExpr(s"explode(${Dedup.TokExpr}) AS word")
      .where(WordGuardExpr)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // explicit word-keyed spread: the distinct-word table is BYTES-tiny
      // but CPU-heavy downstream (per-word merge passes), so AQE's
      // size-based coalescing would funnel the whole merge workload onto
      // one core; a user-specified partition count is exempt from
      // coalescing and keeps the fold parallel at any corpus size
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("word"))
      .selectExpr("word", "freq",
        s"transform(sequence(1, length(word)), i -> substring(word, i, 1))$marker AS syms")
  }

  /** One merge rule applied to `syms` — the greedy fold (see scaladoc).
    * slice(…, 2, …) + element_at(…, 1) seeds the fold with the first
    * symbol, matching DuckDB list_reduce's first-element seeding, so a
    * single-symbol word passes through unchanged. */
  def applyMergeExpr(m: Merge): String = {
    val l = s"'${esc(m.l)}'"
    val r = s"'${esc(m.r)}'"
    s"split(aggregate(slice(syms, 2, size(syms) - 1), element_at(syms, 1), " +
      s"(acc, x) -> CASE WHEN (acc = $l OR endswith(acc, concat(chr(31), $l))) " +
      s"AND x = $r THEN concat(acc, x) ELSE concat(acc, chr(31), x) END), chr(31))"
  }

  /** Train `iters` merges. Returns the ordered merge table and the final
    * (word, freq, syms) DataFrame. The base word table is cached (it is
    * the compressed corpus every iteration re-reads); each iteration's
    * symbol state is a chain of narrow fold expressions over that cache —
    * re-derived per action (CPU over a small cached table) rather than
    * materialized per iteration (N shuffling checkpoints). */
  def train(docs: DataFrame, iters: Int = DefaultIters): (Seq[Merge], DataFrame) = {
    val base = wordTable(docs)
    base.persist()
    var words = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var i = 0
    while (i < iters) {
      val top = words.where("size(syms) > 1")
        .selectExpr("freq",
          "explode(transform(sequence(0, size(syms) - 2), " +
            "i -> struct(element_at(syms, i + 1) AS l, element_at(syms, i + 2) AS r))) AS p")
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      // fail loudly rather than silently diverge from the oracle's
      // fixed-length CTE chain (an exhausted corpus means the caller
      // asked for more merges than the corpus supports)
      require(top.nonEmpty,
        s"bpe: corpus exhausted after $i merges (asked for $iters)")
      val m = Merge(top.head.getString(0), top.head.getString(1), top.head.getLong(2))
      merges += m
      // iteration state = the FULL rule list applied to the cached base in
      // one compiled pass (graft.functions.bpe kernel) — not an i-deep
      // chain of interpreted folds over the previous state
      words = base.select(col("word"), col("freq"),
        graft.functions.bpe.applyMerges(col("syms"),
          merges.toSeq.map(mm => (mm.l, mm.r))).as("syms"))
      i += 1
    }
    (merges.toSeq, words)
  }

  /** Per-(JVM, dir) training memo — the hnswIndexFor contract: training is
    * the one-time "index build" the encode/pack entries amortize. Keyed on
    * the FULL dir (no path derivation, so no sanitization collisions), and
    * holding ONLY the driver-side merge table — session-free, so a later
    * SparkSession can rebuild the symbol state from it with pure narrow
    * expressions (no training jobs). */
  private val trainedFor =
    scala.collection.mutable.Map.empty[String, Seq[Merge]]
  def trainedMerges(docs: => DataFrame, dir: String,
                    iters: Int = DefaultIters): Seq[Merge] =
    synchronized { trainedFor.getOrElseUpdate(dir, train(docs, iters)._1) }

  /** Final (word, freq, syms) state under a merge table: the base word
    * table with the full rule list applied in ONE compiled pass
    * (graft.functions.bpe kernel; lazy — no jobs until an action).
    * Semantics equal the per-rule `applyMergeExpr` fold chain the DuckDB
    * oracle replays — differential-tested in BpeSpec. */
  def applyMerges(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    wordTable(docs).select(col("word"), col("freq"),
      graft.functions.bpe.applyMerges(col("syms"),
        merges.map(m => (m.l, m.r))).as("syms"))

  /** The tokenizer-APPLY side at its scalable shape: encode the DISTINCT
    * words once (the dictionary-encode trick — the merge chain never runs
    * over the token stream), exposing (word, n_sym) for a join against
    * exploded corpus tokens. */
  def wordSymLens(docs: DataFrame, dir: String,
                  iters: Int = DefaultIters): DataFrame =
    applyMerges(docs, trainedMerges(docs, dir, iters))
      .selectExpr("word", "CAST(size(syms) AS BIGINT) AS n_sym")
}
