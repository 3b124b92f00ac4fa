package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The flattenPaths output contract (city-directories.dataset.json:31-46):
  * JSONPath hints → tabular projection. */
class FlattenPathsSpec extends SparkSpec {
  import spark.implicits._

  private def nested = Seq(
    (1L, "a b c", Seq(10, 20)),
    (2L, "x", Seq(30, 40))
  ).toDF("id", "text", "nums")
    .select(col("id"), struct(
      col("text").as("title"),
      col("nums").as("bbox"),
      transform(split(col("text"), " "),
        w => struct(w.as("value"))).as("locations")).as("data"))

  test("name segments, [i] segments, column naming") {
    val out = FlattenPaths.flatten(nested, Seq(
      "$.data.title", "$.data.locations[0].value",
      "$.data.locations[2].value"), keep = Seq("id"))
    assert(out.columns.toSeq == Seq("id", "data_title",
      "data_locations_0_value", "data_locations_2_value"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == "a b c")
    assert(rows(0).getString(2) == "a")
    assert(rows(0).getString(3) == "c")
    // absent index → null (JSONPath semantics), not an ANSI error
    assert(rows(1).getString(2) == "x")
    assert(rows(1).isNullAt(3))
  }

  test("nested terminal is JSON-encoded; scan prunes to referenced leaves") {
    val out = FlattenPaths.flatten(nested, Seq("$.data.bbox"))
    assert(out.schema("data_bbox").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(out.orderBy("data_bbox").collect().map(_.getString(0)).toSeq ==
      Seq("[10,20]", "[30,40]"))
    // column pruning survives the flatten: only `data` feeds the project
    val dir = java.nio.file.Files.createTempDirectory("flatten").toString
    nested.write.mode("overwrite").parquet(dir)
    val fromDisk = FlattenPaths.flatten(
      spark.read.parquet(dir), Seq("$.data.title"))
    val scan = fromDisk.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(scan.contains("ReadSchema") && !scan.contains("bbox"),
      s"bbox should be pruned from the scan:\n$scan")
  }

  test("the reference's full hint list compiles against the transform shape") {
    // every hint from city-directories.dataset.json:31-46 parses and
    // resolves on a dataset-contract-shaped frame
    val hints = Seq(
      "$.data.volumeUuid", "$.data.pageUuid", "$.data.pageNum",
      "$.data.bbox", "$.data.text", "$.data.occupation",
      "$.data.locations", "$.data.locations[0].value",
      "$.data.locations[1].value", "$.data.geocoded",
      "$.data.geocoded[0].id", "$.data.geocoded[0].streetId",
      "$.data.geocoded[1].id", "$.data.geocoded[1].streetId")
    val shaped = Seq((
      ("v", "p", 1, Seq(1, 2, 3, 4), "t", "occ"),
      Seq(("loc", "addr")),
      Seq(("a1", "n", "s", "s1"))
    )).toDF("base", "locs", "geos")
      .select(struct(
        col("base._1").as("volumeUuid"), col("base._2").as("pageUuid"),
        col("base._3").as("pageNum"), col("base._4").as("bbox"),
        col("base._5").as("text"), col("base._6").as("occupation"),
        transform(col("locs"), l => struct(l.getField("_1").as("value"),
          l.getField("_2").as("address"))).as("locations"),
        transform(col("geos"), g => struct(g.getField("_1").as("id"),
          g.getField("_2").as("name"), g.getField("_3").as("street"),
          g.getField("_4").as("streetId"))).as("geocoded")).as("data"))
    val out = FlattenPaths.flatten(shaped, hints)
    assert(out.columns.length == hints.length)
    assert(out.count() == 1)
  }

  test("malformed paths are rejected loudly") {
    intercept[IllegalArgumentException] {
      FlattenPaths.flatten(nested, Seq("data.title"))
    }
    intercept[IllegalArgumentException] {
      FlattenPaths.flatten(nested, Seq("$.data..title"))
    }
    intercept[IllegalArgumentException] {
      FlattenPaths.flatten(nested, Seq("$.data.locations[*]"))
    }
  }
}
