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

  test("posting index delete: tombstone mask ≡ vacuum; vacuum rewrites only affected buckets") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val assets = MultimodalOps.synthY4mTrimAssets(docs, "doc_id")
    val dir = Files.createTempDirectory("graft-vacuum-spec").toString
    MultimodalOps.frameHashIndexBuild(
      assets.filter(col("asset_id") % 5 >= 1), dir)
    val batch = assets.filter(col("asset_id") % 5 === 0)
    def result() = MultimodalOps.frameContainmentIncremental(batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val undeleted = result()
    assert(undeleted.nonEmpty, "pair universe empty")
    // tombstone ONE banked asset (id 4: banked %5 = 4, in a NON-flat
    // triplet — triplet 0's flat hashes are cap-excised, so asset 1
    // would mask nothing — and its sibling 5 is in the batch, so the
    // (4, 5) pair exists and the mask is observable); a single asset
    // touches at most its-distinct-hash-count buckets, which keeps the
    // only-affected-rewrite claim testable at this scale (the mm28
    // LANE gates the mass-delete semantics)
    assert(undeleted.exists { case (a, b, _) => a == 4 || b == 4 },
      "fixture drifted: asset 4 pairless, pick another deletion target")
    MultimodalOps.postingIndexDelete(
      docs.select(col("doc_id").as("asset_id"))
        .filter(col("asset_id") === 4), dir, "asset_id")
    val masked = result()
    assert(masked != undeleted, "tombstones did not mask anything")
    assert(!masked.exists { case (a, b, _) => a == 4 || b == 4 },
      "the deleted asset survived the mask")
    // file listing per bucket dir before vacuum
    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("_bkt="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    val filesBefore = bucketFiles()
    // buckets that hold the tombstoned asset's postings
    val affected = spark.read.parquet(dir)
      .filter(col("asset_id") === 4)
      .select(col("_bkt")).distinct().collect().map(_.getInt(0))
      .map(b => s"_bkt=$b").toSet
    assert(affected.nonEmpty && affected.size < filesBefore.size,
      s"fixture degenerate: ${affected.size} of ${filesBefore.size} " +
        "buckets affected — the only-affected-rewrite claim is untestable")
    MultimodalOps.postingIndexVacuum(spark, dir, "asset_id", "fhash")
    assert(!Files.exists(Paths.get(dir, "_tombstones")),
      "vacuum left the tombstone table")
    val filesAfter = bucketFiles()
    for ((bkt, fs) <- filesBefore if !affected(bkt))
      assert(filesAfter.get(bkt).contains(fs),
        s"vacuum touched unaffected $bkt")
    // physical state now equals the mask: same probe result, and no
    // deleted id remains on disk
    assert(result() == masked, "vacuum changed probe results")
    assert(spark.read.parquet(dir).filter(col("asset_id") === 4)
      .count() == 0, "vacuum left deleted rows on disk")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("vacuum swap is staged and self-heals from both interruption classes") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val assets = MultimodalOps.synthY4mTrimAssets(docs, "doc_id")
    val dir = Files.createTempDirectory("graft-vacuum-crash-spec").toString
    MultimodalOps.frameHashIndexBuild(
      assets.filter(col("asset_id") % 5 >= 1), dir)
    val batch = assets.filter(col("asset_id") % 5 === 0)
    def result() = MultimodalOps.frameContainmentIncremental(batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def tombstoneAndStage(id: Long): Unit = {
      MultimodalOps.postingIndexDelete(
        docs.select(col("doc_id").as("asset_id"))
          .filter(col("asset_id") === id), dir, "asset_id")
      val ts = spark.read.parquet(s"$dir/_tombstones")
      val affected = spark.read.parquet(dir)
        .join(broadcast(ts), Seq("asset_id"), "left_semi")
        .select(col("_bkt")).distinct().collect().map(_.getInt(0)).toSeq
      assert(affected.nonEmpty,
        s"fixture drifted: asset $id has no postings to vacuum")
      MultimodalOps.stageVacuumSwap(spark, dir, "asset_id", "fhash",
        ts, affected)
    }
    def assertConverged(deleted: Long, want: Set[(Long, Long, Long)])
        : Unit = {
      assert(!Files.exists(Paths.get(dir, "_vacuum_tmp")),
        "vacuum left the stage dir")
      assert(!Files.exists(Paths.get(dir, "_tombstones")),
        "vacuum left the tombstone table")
      assert(result() == want, "recovery changed probe results")
      assert(spark.read.parquet(dir)
        .filter(col("asset_id") === deleted).count() == 0,
        "recovery left deleted rows on disk")
    }

    // class 1 — crash BEFORE the commit marker: the stage is fully
    // written but never committed; the next vacuum must discard it
    // (old buckets + tombstones are intact) and converge by re-running
    MultimodalOps.postingIndexDelete(
      docs.select(col("doc_id").as("asset_id"))
        .filter(col("asset_id") === 4), dir, "asset_id")
    val masked4 = result()
    tombstoneAndStage(4) // re-staging the same tombstones is harmless
    Files.delete(Paths.get(dir, "_vacuum_tmp", "_GRAFT_SWAP_READY"))
    MultimodalOps.postingIndexVacuum(spark, dir, "asset_id", "fhash")
    assertConverged(4L, masked4)

    // class 2 — crash AFTER the marker, mid-swap: one staged bucket
    // already renamed in (its old dir deleted first, exactly the swap
    // loop's order), the rest still staged; the entry heal must finish
    // the remaining renames without re-deleting the moved bucket
    tombstoneAndStage(9)
    val masked9 = result()
    val tmpDir = new java.io.File(dir, "_vacuum_tmp")
    val staged = tmpDir.listFiles().filter(_.getName.startsWith("_bkt="))
    if (staged.nonEmpty) { // partial progress only exists with survivors
      val one = staged.head
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir, one.getName))
      Files.move(one.toPath, Paths.get(dir, one.getName))
    }
    MultimodalOps.postingIndexVacuum(spark, dir, "asset_id", "fhash")
    assertConverged(9L, masked9)

    // class 3 — crash at the very END of the swap: every staged bucket
    // renamed out AND _empty_buckets deleted, only the marker left in
    // the tmp dir (the final recursive delete was interrupted mid-way).
    // The heal must treat the missing _empty_buckets as an empty list
    // and clear the stage instead of wedging on FileNotFound
    // (advisor r16)
    tombstoneAndStage(14)
    val masked14Stage = new java.io.File(dir, "_vacuum_tmp")
    masked14Stage.listFiles().filter(_.getName.startsWith("_bkt="))
      .foreach { one =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(dir, one.getName))
        Files.move(one.toPath, Paths.get(dir, one.getName))
      }
    Files.deleteIfExists(Paths.get(dir, "_vacuum_tmp", "_empty_buckets"))
    val masked14 = result()
    MultimodalOps.postingIndexVacuum(spark, dir, "asset_id", "fhash")
    assertConverged(14L, masked14)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
