package graft.geocode

import graft.SparkSpec
import graft.fixtures.CityDirFixture
import org.apache.spark.sql.functions._

class GeocoderSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeAddress: Column and String implementations agree") {
    val samples = Seq(
      "123 Broadway", "45 W 23d st", "h 19 Pearl st.", "r 7 Bowery",
      "88 Canal St", "3 Maiden lane", "  201  Water st  ", "5 E 14th av",
      "Smith's alley", "10 N Moore st")
    val viaCol = samples.toDF("a")
      .select(Geocoder.normalizeAddress(col("a"))).as[String].collect().toSeq
    assert(viaCol == samples.map(Geocoder.normalizeAddress))
  }

  test("normalizeAddress property: agreement on random address-ish strings") {
    val words = Vector("st", "av", "W", "Pearl", "h", "123", "broadway.",
      "E", "14th", "lane", "", "  ", "r", "St.", "AV")
    val rnd = new scala.util.Random(42) // deterministic
    val addrs = Seq.fill(60)(
      Seq.fill(4)(words(rnd.nextInt(words.size))).mkString(" "))
    val viaCol = addrs.toDF("a")
      .select(Geocoder.normalizeAddress(col("a"))).as[String].collect().toSeq
    assert(viaCol == addrs.map(Geocoder.normalizeAddress))
  }

  test("geocodeViaJoin agrees with broadcast-lookup geocode") {
    val dim = spark.createDataset(CityDirFixture.dimension)
    val lines = Seq(
      (1L, Seq("123 Broadway", "nowhere special")),
      (2L, Seq("h 19 Pearl st")),
      (3L, Seq.empty[String])
    ).toDF("id", "vals")
      .withColumn("parsed", struct(expr(
        "transform(vals, v -> struct(v as value))").as("locations")))
      .drop("vals")
    val viaUdf = Geocoder.geocode(lines, Geocoder.buildIndex(spark, dim))
      .select(col("id"),
        expr("transform(geocoded, g -> struct(g.found, g.result.properties.address.id, g.error))").as("g"))
      .orderBy("id").collect().toSeq
    val viaJoin = Geocoder.geocodeViaJoin(lines, dim.toDF(), "id")
      .select(col("id"),
        expr("transform(geocoded, g -> struct(g.found, g.result.properties.address.id, g.error))").as("g"))
      .orderBy("id").collect().toSeq
    assert(viaUdf.map(_.toString) == viaJoin.map(_.toString))
  }
}
