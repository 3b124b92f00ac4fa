package graft.operators

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Torn-build guard on the persisted-index fixtures: a build that died
  * between table writes (or a concurrent rebuild in another process)
  * must fail loudly at access time, never answer from partial data.
  */
class IndexMarkerSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("fixture writes a completion marker and checks it on access") {
    val dir = IvfFixture.ivfDir(spark, sfDir)
    val marker = Paths.get(dir, IvfFixture.MarkerName)
    assert(Files.exists(marker), s"build must leave $marker")

    // simulate a torn dir: marker gone, data files still present
    Files.delete(marker)
    val e = intercept[IllegalArgumentException] {
      IvfFixture.ivfDir(spark, sfDir)
    }
    assert(e.getMessage.contains("torn build"))

    // restore for other suites sharing this JVM's memoized fixture
    Files.write(marker, Array.emptyByteArray)
    assert(IvfFixture.ivfDir(spark, sfDir) == dir)
  }

  test("band index fixture carries the same guard") {
    val dir = BandIndexFixture.dir(spark, sfDir)
    assert(Files.exists(Paths.get(dir, IvfFixture.MarkerName)))
  }

  test("posting index: append slivers compact away with results unchanged") {
    import org.apache.spark.sql.functions._
    // build from one half, append the other in FOUR sliver batches so
    // the directory accumulates small files, then compact and require
    // (a) the incremental containment result is byte-identical and
    // (b) the parquet file count strictly dropped — the maintenance
    // path a steady-state ingest loop relies on
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val assets = MultimodalOps.synthY4mTrimAssets(docs, "doc_id")
    val dir = Files.createTempDirectory("graft-compact-spec").toString
    MultimodalOps.frameHashIndexBuild(
      assets.filter(col("asset_id") % 5 === 1), dir)
    for (m <- Seq(2L, 3L, 4L)) // sliver appends
      MultimodalOps.frameHashIndexAppend(
        assets.filter(col("asset_id") % 5 === m), dir,
        maxRecordsPerFile = 50L)
    val batch = assets.filter(col("asset_id") % 5 === 0)
    def result() = MultimodalOps.frameContainmentIncremental(batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def parquetFiles() = {
      val it = Files.walk(Paths.get(dir))
      try it.filter(p => p.toString.endsWith(".parquet")).count()
      finally it.close()
    }
    val before = result()
    assert(before.nonEmpty, "pre-compaction pair universe empty")
    val filesBefore = parquetFiles()
    graft.sources.Compaction.compactInPlace(spark, dir,
      Seq("_bkt"), clusterBy = Seq("fhash"))
    val filesAfter = parquetFiles()
    assert(filesAfter < filesBefore,
      s"compaction did not reduce files: $filesBefore -> $filesAfter")
    assert(result() == before, "compaction changed incremental results")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
