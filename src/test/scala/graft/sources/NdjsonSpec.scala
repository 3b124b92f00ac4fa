package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

class NdjsonSpec extends SparkSpec {
  import spark.implicits._

  test("readWithQuarantine: good rows parse, corrupt lines stay in-band") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ndjson")
    val lines = Seq(
      """{"id": 1, "name": "ok-one"}""",
      """{"id": 2, "name": "ok-two"}""",
      """{"id": 3, "name": "truncated""", // malformed JSON
      """not json at all""")
    java.nio.file.Files.write(dir.resolve("part-0.ndjson"),
      lines.mkString("\n").getBytes)

    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val scan = Ndjson.readWithQuarantine(spark, dir.toString, schema)

    assert(scan.good.as[(Long, String)].collect().toSet ==
      Set((1L, "ok-one"), (2L, "ok-two")))
    val bad = scan.quarantine.as[String].collect().toSet
    assert(bad == Set("""{"id": 3, "name": "truncated""",
      "not json at all"))
    // neither FAILFAST (job survives) nor DROPMALFORMED (nothing lost):
    assert(scan.good.count() + scan.quarantine.count() == lines.size)
    scan.release() // drop the shared cached scan
  }

  test("schema evolution: mergeSchema unifies appended columns, old rows null") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve")
    // v1 drop: (id, name); later drop adds a lang column
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir.toString)
    Seq((3L, "c", "en")).toDF("id", "name", "lang")
      .write.mode("append").parquet(dir.toString)

    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir.toString)
    assert(merged.columns.toSet == Set("id", "name", "lang"))
    val rows = merged.select("id", "name", "lang")
      .as[(Long, String, Option[String])].collect().toSet
    assert(rows == Set((1L, "a", None), (2L, "b", None),
      (3L, "c", Some("en"))))
    // the non-merged read keeps ONE footer's schema — evolution must be
    // an explicit opt-in, not silent column appearance/disappearance
    val plain = spark.read.parquet(dir.toString)
    assert(plain.columns.toSet.subsetOf(Set("id", "name", "lang")))
  }
}
