package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ABO listings ingestion — the Spark-native /root/reference/parse-json.py.
  *
  * The reference loads `listings_*.json` JSONL, matches each image id to a
  * listing via `main_image_id` / `other_image_id` (parse-json.py:41, an
  * O(images × listings) Python loop), and projects the five metadata attrs
  * with their nested access paths (metadata-small.py consumers:
  * pre-filter.py:102):
  *
  *   brand/color/model_year → attr[0].value
  *   item_weight            → attr[0].normalized_value.value
  *   country                → plain string
  *
  * Here: `from_json` with an explicit schema (no sampling-based inference
  * at 100 TB), `explode` of the image-id arrays, and an equi-join — the
  * quadratic reference loop becomes one shuffle keyed by image_id.
  */
object Listings {

  private val valueStruct = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("language_tag", StringType))))

  /** The subset of the ABO listing schema the engine consumes. */
  val listingSchema: StructType = StructType(Seq(
    StructField("item_id", StringType),
    StructField("main_image_id", StringType),
    StructField("other_image_id", ArrayType(StringType)),
    StructField("brand", valueStruct),
    StructField("color", valueStruct),
    StructField("model_year", ArrayType(StructType(Seq(StructField("value", LongType))))),
    StructField("item_weight", ArrayType(StructType(Seq(
      StructField("normalized_value", StructType(Seq(
        StructField("unit", StringType), StructField("value", DoubleType)))),
      StructField("unit", StringType), StructField("value", DoubleType))))),
    StructField("country", StringType)))

  /** Parse raw JSONL (one listing per `json` string in column `value`) into
    * typed rows with the reference's flattened attrs. */
  def parseListings(jsonl: DataFrame, jsonCol: String = "value"): DataFrame =
    jsonl
      .select(from_json(col(jsonCol), listingSchema).as("l"))
      .filter(col("l").isNotNull)
      .select(
        col("l.item_id").as("item_id"),
        col("l.main_image_id").as("main_image_id"),
        col("l.other_image_id").as("other_image_id"),
        col("l.brand")(0)("value").as("brand"),
        col("l.color")(0)("value").as("color"),
        col("l.model_year")(0)("value").as("model_year"),
        col("l.item_weight")(0)("normalized_value")("value").as("item_weight"),
        col("l.country").as("country"))

  /** image_id → metadata, via main + other image ids (the map*.csv join).
    * One row per (image, listing) association; missing attrs stay NULL —
    * MetaPredicate then rejects them, matching the reference. */
  def imageMetadata(parsed: DataFrame): DataFrame = {
    val withIds = parsed.select(
      explode(array_union(
        array(col("main_image_id")),
        coalesce(col("other_image_id"), array()))).as("image_id"),
      col("brand"), col("color"), col("model_year"), col("item_weight"), col("country"))
    withIds.filter(col("image_id").isNotNull)
  }

  /** Convenience: read a JSONL directory the way the reference reads
    * listings_*.json, at scale (explicit schema, no inference pass). */
  def readListings(spark: SparkSession, path: String): DataFrame =
    parseListings(spark.read.text(path))
}
