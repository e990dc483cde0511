package graft

import org.apache.spark.sql.functions.col
import graft.operators.MetaPredicate
import graft.sources.Listings

class ListingsSpec extends SparkSpec {
  import spark.implicits._

  private val abojson = Seq(
    // full listing, ABO nesting: brand/color as [{value}], weight normalized
    """{"item_id":"B01","main_image_id":"img1","other_image_id":["img2","img3"],
      |"brand":[{"value":"AmazonBasics","language_tag":"en_US"}],
      |"color":[{"value":"Multicolor"}],"model_year":[{"value":2018}],
      |"item_weight":[{"normalized_value":{"unit":"pounds","value":1.95},"unit":"pounds","value":1.95}],
      |"country":"IN"}""".stripMargin.replace("\n", ""),
    // sparse listing: no weight/year/other images
    """{"item_id":"B02","main_image_id":"img9","brand":[{"value":"Rivet"}],"country":"US"}""",
    "not json at all"
  ).toDF("value")

  test("parseListings flattens the reference's nested access paths") {
    val rows = Listings.parseListings(abojson).orderBy("item_id").collect()
    // PERMISSIVE from_json turns the malformed line into an all-null row
    // (kept here; imageMetadata drops it via the null image_id filter)
    assert(rows.length == 3)
    val full = rows.find(r => r.getAs[String]("item_id") == "B01").get
    assert(full.getAs[String]("brand") == "AmazonBasics")
    assert(full.getAs[String]("color") == "Multicolor")
    assert(full.getAs[Long]("model_year") == 2018L)
    assert(math.abs(full.getAs[Double]("item_weight") - 1.95) < 1e-9)
    assert(full.getAs[String]("country") == "IN")
    val sparse = rows.find(r => r.getAs[String]("item_id") == "B02").get
    assert(sparse.isNullAt(sparse.fieldIndex("item_weight")))
    assert(sparse.isNullAt(sparse.fieldIndex("model_year")))
  }

  test("imageMetadata explodes main+other ids and MetaPredicate rejects missing attrs") {
    val meta = Listings.imageMetadata(Listings.parseListings(abojson))
    val byImage = meta.select("image_id", "brand").as[(String, String)].collect().toMap
    assert(byImage.keySet == Set("img1", "img2", "img3", "img9"))
    assert(byImage("img2") == "AmazonBasics")

    // the reference's query_metadata_class_2_2: weight < 2 AND brand ~ Amazon
    val q = meta.filter(MetaPredicate(
      "item_weight" -> ("<", 2.0), "brand" -> ("substring", "Amazon")))
    assert(q.select("image_id").as[String].collect().toSet == Set("img1", "img2", "img3"))
    // img9's listing has no weight -> rejected, exactly like metadata_matches
  }
}
