package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** One place that forces every build-once-per-session artifact the
  * catalog's lanes consume — persisted indexes, banked assignments,
  * staged stream drop dirs — plus a minimal streaming drain to warm
  * the micro-batch machinery's classloading/JIT.
  *
  * WHY (r17 verdict wrong #1): the fixtures memoize per JVM, so
  * whichever lane FIRST touches one gets charged its full build inside
  * a timed bench pass — the driver's BENCH_r17 recorded ss7 at 49.5 s
  * (the IVF k-means build) against a 0.75 s steady state, and on a box
  * where only one pass fit the budget that warm pass WAS the artifact.
  * [[Bench]] calls [[buildAll]] in an explicit UNTIMED prelude before
  * pass 1 and reports its wall time as its own metric field
  * (`prelude_sec`), so even a single-pass run times lanes at their
  * steady-state cost. Verify is unaffected (its single pass was always
  * "first touch pays the build" by design, and correctness doesn't
  * time anything).
  *
  * The builds here are exactly the artifact-vs-query splits already
  * documented on each fixture: build cost stays measured in its own
  * lane (ss16 for the kNN bank) or in PerfCompare probes (ivf_build),
  * never silently dropped.
  */
object SessionFixtures {

  /** Force every session fixture for `sfDir`; returns the number of
    * fixture builds forced (all of them — memoized builds return
    * instantly, so calling this twice is free).
    */
  def buildAll(spark: SparkSession, sfDir: String): Int =
    buildAllDetail(spark, sfDir).size

  /** [[buildAll]] with a per-fixture wall-time breakdown, in build
    * order — the r18 verdict's prelude watch item: the untimed prelude
    * is where timed work would quietly migrate if discipline slipped,
    * so [[Bench]] reports `prelude_detail` (name → seconds) and a
    * future round can diff it fixture by fixture instead of watching
    * one opaque total grow.
    */
  def buildAllDetail(spark: SparkSession,
                     sfDir: String): Seq[(String, Double)] = {
    import graft.operators._
    val builds: Seq[(String, () => Any)] = Seq(
      "ivf" -> (() => IvfFixture.ivfDir(spark, sfDir)),
      "ivfpq" -> (() => IvfFixture.ivfPqDir(spark, sfDir)),
      "ivf_append" -> (() => IvfFixture.ivfAppendDir(spark, sfDir)),
      "ivfpq_append" -> (() => IvfFixture.ivfPqAppendDir(spark, sfDir)),
      "ivf_delete" -> (() => IvfFixture.ivfDeleteDir(spark, sfDir)),
      "band_index" -> (() => BandIndexFixture.dir(spark, sfDir)),
      "substr_bank" -> (() => SubstrBankFixture.dir(spark, sfDir)),
      "frame_index" -> (() => FrameIndexFixture.dir(spark, sfDir)),
      "frame_delete" -> (() => FrameDeleteIndexFixture.dir(spark, sfDir)),
      "segment_index" -> (() => SegmentIndexFixture.dir(spark, sfDir)),
      "chunk_index" -> (() => ChunkIndexFixture.dir(spark, sfDir)),
      "point_index" -> (() => PointIndexFixture.dir(spark, sfDir)),
      "scc_assignment" ->
        (() => graft.queries.SccAssignmentFixture.dir(spark, sfDir)),
      "zonemap" -> (() => graft.queries.ZonemapFixture.dir(spark, sfDir)),
      "knn5_edges" ->
        (() => graft.queries.KnnEdgesFixture.dir(spark, sfDir, 5)),
      "knn8_edges" ->
        (() => graft.queries.KnnEdgesFixture.dir(spark, sfDir, 8)),
      "stream_stage_events" ->
        (() => graft.streaming.StreamParity.stageDropDir(sfDir, "events")),
      "stream_stage_documents" ->
        (() => graft.streaming.StreamParity.stageDropDir(sfDir, "documents")),
      // empty drains: load/JIT StreamExecution, the file-source
      // listing, the memory sink and checkpoint-log classes — PLUS the
      // state-store save path (windowed agg) and the symmetric-hash
      // join path, which the stateless warm never touches (DrainProbe:
      // first agg drain pays ~1.8 s and first join drain ~1 s of
      // classload/JIT over steady state; on a warm_only driver box
      // that lands in the first timed st lane)
      "stream_warm" -> (() => graft.streaming.StreamParity.drainAppend(
        graft.streaming.StreamParity.eventsStream(spark, sfDir)
          .filter(lit(false)).select(col("event_id")))),
      "stream_warm_agg" -> (() => graft.streaming.StreamParity.drainAppend(
        graft.streaming.StreamingOps.tumblingStream(
          graft.streaming.StreamParity.eventsStream(spark, sfDir)
            .filter(lit(false)), "1 hour"))),
      "stream_warm_join" -> (() => {
        val ev = graft.streaming.StreamParity.eventsStream(spark, sfDir)
          .filter(lit(false))
        graft.streaming.StreamParity.drainAppend(
          graft.streaming.StreamingOps.clickAttributionStream(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            "30 minutes", "2 hours"))
      })
    )
    builds.map { case (name, b) =>
      val t0 = System.nanoTime()
      b()
      name -> (System.nanoTime() - t0) / 1e9
    }
  }
}
