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

  test("editDistance: exact, bounded, early-exit") {
    assert(Geocoder.editDistance("broadway", "broadway", 2) == 0)
    assert(Geocoder.editDistance("brodway", "broadway", 2) == 1)
    assert(Geocoder.editDistance("brdwy", "broadway", 2) == 3) // > max → max+1
    assert(Geocoder.editDistance("abc", "xyz", 1) == 2)        // capped
  }

  test("geocodeFuzzy: exact hit, typo within edit bound, wrong number stays missed") {
    val dim = spark.createDataset(CityDirFixture.dimension)
    val idx = Geocoder.buildFuzzyIndex(spark, dim)
    val lines = Seq(
      (1L, Seq("123 Broadway")),   // exact
      (2L, Seq("123 Brodway")),    // 1 edit after normalization
      (3L, Seq("999 Broadway")),   // unknown house number → miss
      (4L, Seq("19 Paerl st"))     // transposition: 2 edits
    ).toDF("id", "vals")
      .withColumn("parsed", struct(expr(
        "transform(vals, v -> struct(v as value))").as("locations")))
      .drop("vals")
    val out = Geocoder.geocodeFuzzy(lines, idx)
      .select(col("id"), expr("geocoded[0].found").as("found"),
        expr("geocoded[0].result.properties.address.name").as("name"))
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 && out(2L)._1 && out(4L)._1)
    assert(out(2L)._2 == out(1L)._2) // typo resolved to the same address
    assert(!out(3L)._1)
  }

  test("buildFuzzyIndex: oversized dimension fails loudly, not OOM") {
    // no join-based fuzzy fallback exists, so the driver-broadcast
    // bound is enforced (limit-probe collect, one job, no count)
    val dim = spark.createDataset(CityDirFixture.dimension)
    val e = intercept[IllegalArgumentException] {
      Geocoder.buildFuzzyIndex(spark, dim, maxIndexRows = 1)
    }
    assert(e.getMessage.contains("maxIndexRows=1"))
    // at the default bound the same dimension builds fine
    assert(Geocoder.buildFuzzyIndex(spark, dim).value._1.nonEmpty)
    // Long.MaxValue as "unbounded" must clamp, not overflow into a
    // negative limit()
    assert(Geocoder.buildFuzzyIndex(spark, dim,
      maxIndexRows = Long.MaxValue).value._1.nonEmpty)
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

  test("geocodeAuto: dimension size picks the path; results agree across it") {
    val dim = spark.createDataset(CityDirFixture.dimension)
    val lines = Seq(
      (1L, Seq("123 Broadway", "nowhere special")),
      (2L, Seq("h 19 Pearl st")))
      .toDF("id", "vals")
      .withColumn("parsed", struct(expr(
        "transform(vals, v -> struct(v as value))").as("locations")))
      .drop("vals")
    // count shuffles through AQE wrappers AND materialized query stages
    // (QueryStageExec is a leaf — plain collect() can't see inside it)
    def countShuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      val self = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case _ => 0
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(countShuffles).sum
    }
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect() // materialize so AQE's final plan exists
      countShuffles(df.queryExecution.executedPlan)
    }
    // under the threshold: broadcast-map path — the fact side NEVER
    // shuffles (the guardrail's fast path is also the zero-exchange one)
    val small = Geocoder.geocodeAuto(spark, lines, dim, "id",
      maxIndexRows = 1000000L)
    assert(exchanges(small) == 0, small.queryExecution.executedPlan.toString)
    // over the threshold: join fallback — shuffles appear (the
    // re-collect), but the driver never collects the dimension
    val big = Geocoder.geocodeAuto(spark, lines, dim, "id",
      maxIndexRows = 1L)
    assert(exchanges(big) > 0)
    val shape = "transform(geocoded, g -> struct(g.found, " +
      "g.result.properties.address.id, g.error))"
    assert(small.select(col("id"), expr(shape).as("g")).orderBy("id")
        .collect().toSeq.map(_.toString) ==
      big.select(col("id"), expr(shape).as("g")).orderBy("id")
        .collect().toSeq.map(_.toString))
  }

  test("geocodeFuzzyAuto: paths agree across the threshold; join side never collects the dim") {
    val dim = spark.createDataset(CityDirFixture.dimension)
    val lines = Seq(
      (1L, Seq("123 Broadway")),   // exact
      (2L, Seq("123 Brodway")),    // 1 edit → fuzzy rescue
      (3L, Seq("999 Broadway")),   // unknown house number → miss
      (4L, Seq("19 Paerl st", "123 Broadway")), // mixed positions
      (5L, Seq.empty[String])      // empty → empty array
    ).toDF("id", "vals")
      .withColumn("parsed", struct(expr(
        "transform(vals, v -> struct(v as value))").as("locations")))
      .drop("vals")
    val shape = "transform(geocoded, g -> struct(g.found, " +
      "g.result.properties.address.id, g.error))"
    def render(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("id"), expr(shape).as("g")).orderBy("id")
        .collect().toSeq.map(_.toString)
    // under the threshold: the broadcast-index path (zero fact-side
    // exchanges beyond the udf lookup — same frame as geocodeFuzzy)
    val small = Geocoder.geocodeFuzzyAuto(spark, lines, dim, "id",
      maxIndexRows = 1000000L)
    // over the threshold: the join lowering — the dimension is NEVER
    // collected (buildFuzzyIndex's clamp would throw at 1 row)
    val big = Geocoder.geocodeFuzzyAuto(spark, lines, dim, "id",
      maxIndexRows = 1L)
    assert(render(small) == render(big))
    // semantics spot-checks on the join side alone
    val vj = Geocoder.geocodeFuzzyViaJoin(lines, dim.toDF(), "id")
      .select(col("id"), expr("get(geocoded, 0).found").as("f0"),
        expr("get(geocoded, 0).result.properties.address.name").as("n0"),
        size(col("geocoded")).as("n"))
      .as[(Long, Option[Boolean], Option[String], Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(vj(1L)._1.contains(true) && vj(2L)._1.contains(true))
    assert(vj(2L)._2 == vj(1L)._2) // typo resolved to the same address
    assert(vj(3L)._1.contains(false))
    assert(vj(4L)._1.contains(true) && vj(4L)._3 == 2)
    assert(vj(5L)._3 == 0)
  }
}
