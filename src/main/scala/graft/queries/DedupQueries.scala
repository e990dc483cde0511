package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** §2.B1–B5 — deduplication for LLM-training-data pipelines.
  *
  * Shared deterministic hash (both engines): 60-bit positive int from the
  * first 15 hex chars of md5 — Spark `conv(substr(md5(s),1,15),16,10)`,
  * DuckDB `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`.
  *
  * Scale notes: every variant shuffles on a *key* (content hash, LSH band
  * bucket, shared shingle) — never a full O(n²) cross join. The only
  * all-pairs query (`dedup_embedding`) is the small-corpus exact baseline;
  * its scale path is `ann_lsh` bucketing (B6).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  // ---- DuckDB dialect fragments (Spark dialect lives in operators.Dedup)
  private val dTok = DuckDialect.Tok
  private def dH(v: String) = DuckDialect.hash(v)
  private val dShingles = DuckDialect.Shingles

  // minhash constants — single source of truth in operators.Dedup, embedded
  // identically into both dialects
  private val P = Dedup.P
  private val NumHashes = 12
  private val Bands = 3 // 4 rows per band
  private def aj(j: Int): Long = Dedup.minhashA(j)
  private def bj(j: Int): Long = Dedup.minhashB(j)

  private val JaccardTauScaled = 800000L // 0.8 at scale 6
  private val CosineTauScaled = 4500L    // 0.45 at scale 4
  private val SimhashMaxHamming = 1

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1: exact dedup — one shuffle on the content hash
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),

    // B2: n-gram Jaccard near-dup — candidates via shingle equi-join
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(docs(s, dir), JaccardTauScaled)),

    // B3: MinHash + banded LSH — shuffle keyed by (band, bucket) only
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(docs(s, dir), NumHashes, Bands)),

    // B4: SimHash near-dup, hamming ≤ 1 — cost-based: all-pairs on small
    // corpora, byte-banded LSH (pigeonhole-EXACT, same oracle) at scale
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairsAuto(docs(s, dir), SimhashMaxHamming)),

    // B5: embedding-cosine near-dup pairs (exact all-pairs baseline;
    // the 100 TB path replaces the cross join with ann_lsh buckets)
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingPairs(
        Tables(s, dir, "embeddings").select("vec_id", "embedding"), CosineTauScaled))
  )

  val oracle: Map[String, String] = {
    val sigCols = (0 until NumHashes).map { j =>
      s"list_min(list_transform(s, g -> (${aj(j)} * (${dH("g")} % $P) + ${bj(j)}) % $P)) AS m$j"
    }.mkString(",\n  ")
    val bandSelects = (0 until Bands).map { b =>
      val cols = (0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws('_', $cols) AS bkey FROM sig"
    }.mkString("\n UNION ALL ")

    Map(
      "dedup_exact" ->
        "SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies FROM documents GROUP BY 1",

      "dedup_ngram_jaccard" ->
        s"""WITH t AS (SELECT doc_id, $dTok AS tk FROM documents),
           |sh AS (SELECT doc_id, $dShingles AS s FROM t WHERE len(tk) >= 3),
           |pairs AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    len(list_intersect(a.s, b.s)) AS inter, len(a.s) AS na, len(b.s) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |SELECT a_id, b_id,
           |  CAST(round((inter / (na + nb - inter)) * 1000000.0, 0) AS BIGINT) AS jac
           |FROM pairs
           |WHERE inter > 0
           |  AND CAST(round((inter / (na + nb - inter)) * 1000000.0, 0) AS BIGINT) >= $JaccardTauScaled""".stripMargin,

      "dedup_minhash_lsh" ->
        s"""WITH t AS (SELECT doc_id, $dTok AS tk FROM documents),
           |shj AS (SELECT doc_id, $dShingles AS s FROM t WHERE len(tk) >= 3),
           |sig AS (SELECT doc_id,
           |  $sigCols
           |  FROM shj),
           |bands AS ($bandSelects)
           |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           |FROM bands a JOIN bands b
           |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id""".stripMargin,

      "dedup_simhash" ->
        s"""WITH t AS (SELECT doc_id, $dTok AS tk FROM documents),
           |sig AS (SELECT doc_id,
           |  CAST(list_sum(list_transform(range(32), b ->
           |    CASE WHEN list_sum(list_transform(tk, tok ->
           |           CASE WHEN (${dH("tok")} >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
           |         THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS sg
           |  FROM t)
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  CAST(bit_count(xor(a.sg, b.sg)) AS BIGINT) AS ham
           |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.sg, b.sg)) <= $SimhashMaxHamming""".stripMargin,

      "dedup_embedding" ->
        s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |  CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000, 0) AS BIGINT) AS cs
           |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
           |WHERE CAST(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 10000, 0) AS BIGINT) >= $CosineTauScaled""".stripMargin
    )
  }
}
