package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSv2 hOCR archive source: correctness vs the binaryFile+flatMap
  * reader, filter pushdown into the tar loop, archive-level uuid
  * pruning, and hocr-payload column pruning.
  */
class HocrSourceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/tmp/graft-hocr-dsv2-fixture"
  graft.fixtures.CityDirFixture.ensure(dir)

  private def scan = spark.read
    .format("graft.sources.HocrDataSource").load(dir)

  test("reads every hOCR entry with parsed keys") {
    val rows = scan.select("uuid", "pageNum", "imageId", "pageUuid")
      .as[(String, Int, String, String)].collect()
    assert(rows.nonEmpty)
    // two fixture volumes; non-.hocr entries skipped
    assert(rows.map(_._1).toSet.size == 2)
    val viaFlatMap = scan.select("uuid").count()
    assert(rows.length == viaFlatMap)
  }

  test("pageNum pushdown reaches the scan and bounds results") {
    val df = scan.filter(col("pageNum").between(2, 3))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HocrScan"), plan)
    val pages = df.select("pageNum").as[Int].collect()
    assert(pages.nonEmpty && pages.forall(p => p >= 2 && p <= 3))
    // pushed bounds appear in the scan description
    val scanDesc = df.queryExecution.sparkPlan.collectLeaves().map(_.toString)
    assert(scanDesc.exists(_.contains("pageNum")), scanDesc.mkString("\n"))
  }

  test("uuid equality prunes to a single archive partition") {
    val uuids = scan.select("uuid").distinct().as[String].collect().sorted
    val one = scan.filter(col("uuid") === uuids.head)
    assert(one.rdd.getNumPartitions == 1) // one InputPartition per archive
    assert(one.select("uuid").distinct().as[String].collect().toSeq ==
      Seq(uuids.head))
    assert(scan.rdd.getNumPartitions == 2)
  }

  test("column pruning drops the hocr payload; full schema still reads it") {
    val pruned = scan.select("uuid", "pageNum")
    val schema = pruned.queryExecution.executedPlan.collectLeaves()
      .head.schema.fieldNames.toSet
    assert(!schema.contains("hocr"), schema)
    val withPayload = scan.select("uuid", "hocr").as[(String, String)].collect()
    assert(withPayload.forall(_._2.contains("ocr_line")))
  }

  test("agrees with the binaryFile reader inside the body-page range") {
    import org.apache.spark.sql.{functions => F}
    val manifest = sources_manifest()
    val viaBinary = HocrArchive.readPages(spark, dir, manifest)
      .select("uuid", "pageNum", "imageId", "pageUuid")
      .as[(String, Int, String, String)].collect().toSet
    val metas = manifest.collect()
    val viaDsv2 = scan
      .join(F.broadcast(manifest.toDF()), Seq("uuid"))
      .filter(col("pageNum") >= col("startPage") &&
        col("pageNum") <= col("endPage"))
      .select("uuid", "pageNum", "imageId", "pageUuid")
      .as[(String, Int, String, String)].collect().toSet
    assert(metas.nonEmpty && viaDsv2 == viaBinary)
  }

  private def sources_manifest() = {
    import java.nio.file.{Files, Paths}
    Manifest.load(spark,
      Files.readString(Paths.get(dir, "manifest.html")))
  }
}
