package graft

import java.nio.file.{Files, Paths}

/** Prelude discipline (r18 verdict item 7): the untimed bench prelude
  * is where timed work would quietly migrate if discipline slipped.
  * This spec pins the two invariants that keep it honest:
  *
  *  1. every fixture entry that WRITES a standing artifact dir a timed
  *     lane then merely re-reads is marker-gated (`_GRAFT_INDEX_OK` —
  *     torn builds fail loudly, and each new process rebuilds from
  *     current table state before first read);
  *  2. the prelude is memoized per process: a second `buildAll` forces
  *     nothing (so pass-1 lanes are never charged a build, and the
  *     prelude cannot hide per-pass work — it runs once).
  *
  * The per-fixture `prelude_detail` breakdown Bench emits makes growth
  * diffable round over round; this spec makes the gating mechanical.
  */
class SessionFixturesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every artifact-dir fixture is marker-gated and memoized") {
    val detail = SessionFixtures.buildAllDetail(spark, sfDir)
    assert(detail.size >= 19, s"fixture inventory shrank: ${detail.size}")

    // the standing artifact dirs the timed lanes re-read
    import graft.operators._
    val artifactDirs = Seq(
      IvfFixture.ivfDir(spark, sfDir),
      IvfFixture.ivfPqDir(spark, sfDir),
      IvfFixture.ivfAppendDir(spark, sfDir),
      IvfFixture.ivfPqAppendDir(spark, sfDir),
      IvfFixture.ivfDeleteDir(spark, sfDir),
      BandIndexFixture.dir(spark, sfDir),
      SubstrBankFixture.dir(spark, sfDir),
      FrameIndexFixture.dir(spark, sfDir),
      FrameDeleteIndexFixture.dir(spark, sfDir),
      SegmentIndexFixture.dir(spark, sfDir),
      ChunkIndexFixture.dir(spark, sfDir),
      PointIndexFixture.dir(spark, sfDir),
      graft.queries.SccAssignmentFixture.dir(spark, sfDir),
      graft.queries.ZonemapFixture.dir(spark, sfDir),
      graft.queries.KnnEdgesFixture.dir(spark, sfDir, 5),
      graft.queries.KnnEdgesFixture.dir(spark, sfDir, 8))
    artifactDirs.foreach { d =>
      assert(Files.exists(Paths.get(d, IvfFixture.MarkerName)),
        s"fixture dir $d lacks the ${IvfFixture.MarkerName} marker — " +
          "an unmarked standing artifact can serve torn/stale data " +
          "and is not a legitimate prelude entry")
    }

    // memoized: a second full build forces nothing (sub-second, vs
    // multi-second first build at any sf)
    val t0 = System.nanoTime()
    val again = SessionFixtures.buildAllDetail(spark, sfDir)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(again.size == detail.size)
    assert(sec < 5.0,
      f"second buildAll took $sec%.1f s — a fixture is rebuilding " +
        "per call instead of memoizing per process")
  }
}
