package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Multimodal

/** §2.B11 + C6 — multimodal ingest plumbing and gap-based sessionization. */
object PipelineQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B11: binary media column → sha256 identity + stub decode via typed
    // mapPartitions (schema/partitioning/batching real; decode stubbed)
    "multimodal_ingest" -> ((s, dir) => {
      val media = Multimodal.asMedia(s, Tables(s, dir, "documents").filter(col("text").isNotNull))
      Multimodal.decode(s, media).toDF()
        .select("media_id", "content_sha", "n_bytes", "width", "height", "mime")
    }),

    // B11b: stub feature extraction — content-deterministic pseudo-vectors
    // through the real mapPartitions/Encoder path; output as integer
    // weights per (media, dim) so the oracle compare is exact
    "multimodal_embed" -> ((s, dir) => {
      val media = Multimodal.asMedia(s, Tables(s, dir, "documents"))
      val emb = Multimodal.embedStub(s, Multimodal.decode(s, media))
      emb.toDF()
        .select(col("media_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("media_id"), col("dim").cast("long").as("dim"),
          floor(col("v") * 1000 + lit(0.5)).cast("long").as("w"))
    }),

    // C6: sessionize events per user on 30-minute inactivity gaps —
    // lag + cumulative sum over a (user_id, ts) window; one shuffle keyed
    // by user_id (the natural partitioning for clickstream state)
    "events_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      Tables(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        // gap computed at microsecond precision (unix_timestamp would floor
        // to seconds and merge gaps up to 1s past the boundary)
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L).otherwise(0L))
        .withColumn("sess_idx", sum("new_sess").over(
          Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sess_idx")
        // session bounds as integer epoch seconds, not formatted strings —
        // date formatting is engine/version sensitive (SURVEY §6)
        .agg(count(lit(1)).as("n_events"),
          expr("unix_micros(min(ts)) div 1000000").as("sess_start"),
          expr("unix_micros(max(ts)) div 1000000").as("sess_end"))
    })
  )

  val oracle: Map[String, String] = Map(
    // width/height mirror Multimodal.stubDecode; sha over the utf8 bytes
    "multimodal_ingest" ->
      """SELECT doc_id AS media_id, sha256(text) AS content_sha,
        | CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(CAST(text AS BLOB)) % 1024 AS BIGINT) AS width,
        | CAST((octet_length(CAST(text AS BLOB)) * 7) % 768 AS BIGINT) AS height,
        | 'application/x-' || lang AS mime
        |FROM documents WHERE text IS NOT NULL""".stripMargin,

    "multimodal_embed" ->
      """SELECT doc_id AS media_id, d.dim AS dim,
        | (CAST('0x'||substr(md5(sha256(text) || '_' || d.dim), 1, 15) AS BIGINT) % 2001) - 1000 AS w
        |FROM documents CROSS JOIN range(8) d(dim)""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL
        |           OR epoch_us(ts)
        |              - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
        |  FROM g)
        |SELECT user_id, sess_idx, count(*) AS n_events,
        |  epoch_us(min(ts)) // 1000000 AS sess_start,
        |  epoch_us(max(ts)) // 1000000 AS sess_end
        |FROM sess GROUP BY user_id, sess_idx""".stripMargin
  )
}
