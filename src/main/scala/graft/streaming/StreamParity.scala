package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Batch-replayable drains of the Structured Streaming surface.
  *
  * Every streaming operator in [[StreamingOps]] was golden-gated until
  * round 9 — "no DuckDB oracle (inherent)". This module removes the
  * "inherent": a stream drained with `Trigger.AvailableNow` over a
  * FIXED input set has a deterministic final output, and that output is
  * plain batch SQL once the watermark's emission rule is spelled out.
  * The st* lanes run the REAL streaming operators (same code path a
  * live deployment runs: file source → watermarked stateful ops →
  * sink), drain them to completion, and hand the result to the same
  * rows/schema/hash oracle gate as every batch lane.
  *
  * Empirical semantics this encoding relies on (pinned by spike +
  * StreamParitySpec, Spark 4.1):
  *
  *  - A single-file drop directory yields ONE data micro-batch plus a
  *    finalize batch: `AvailableNow` with no `maxFilesPerTrigger` takes
  *    every available file in the first batch, then runs a no-data
  *    batch that advances the watermark to `max(ts) - delay` and
  *    flushes finalized state.
  *  - The final watermark is the max observed event time FLOOR-ed to
  *    milliseconds minus the delay (Spark tracks event-time stats in
  *    ms). Append-mode aggregation emits exactly the windows/sessions
  *    whose END is at or below that watermark. Oracles encode the
  *    ms-floor explicitly: `(epoch_us(max(ts))//1000)*1000 - delay_us`.
  *  - Because all rows co-arrive in batch 0, stream-stream joins see
  *    every pair (state eviction happens between batches, and there is
  *    no second data batch to miss) and within-watermark dedup
  *    degenerates to global distinct — both equal their batch twins.
  *
  * Scale note: the parity harness itself is test-scale by design (a
  * drained memory sink collects to the driver), but the PLANS under it
  * are the production streaming plans — per-key state, watermark
  * eviction, RocksDB-capable — and at 100 TB the same operators run
  * against a real source with the memory sink swapped for a table
  * sink. Parity holds per micro-batch prefix, not just at drain: the
  * emission rule depends only on the watermark, never on batch count.
  */
object StreamParity {

  private val drainCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** State-store parallelism for parity drains. The drain harness is
    * test-scale BY DESIGN (memory sink, collected to the driver), but
    * the number of state-store instances a drained query spins up is
    * `spark.sql.shuffle.partitions` PER stateful operator — at the
    * bench session's 32 that is 128 store load/commit cycles per batch
    * for a stream-stream join, all fixed machinery, no data. The
    * PerfCompare stdrain breakdown measured the state machinery at
    * ~70 % of an empty drain; pinning the DRAIN's state partitioning
    * removes the partitions×stores blowup without touching the plan
    * (values are partitioning-independent; the oracle hash gate
    * sorts). The default was 2 through r18, tuned when every state
    * commit paid a ChecksumFileSystem `.crc` twin; with the r18
    * `rawckpt://` drain fs that per-store cost dropped ~10×, and the
    * r19 re-A/B (20-lane family, sf0.1, min-of-4, fresh JVM per
    * setting) now favors more data parallelism at BOTH driver core
    * counts: c32 — 2 parts 24.3 s, 4 → 23.2, 8 → 22.2, 16 → 21.6;
    * c8 — 2 parts 25.5 s, 8 → 23.1. Default is 8: past it the curve
    * is flat at c32 and untested at c8, and the heavier lanes (st3
    * 2.23→1.62, st8 2.18→1.85) carry the win; the one counter-move
    * (st11 +0.10 s) is inside run noise. Production deployments keep
    * their real partitioning — the pin rides the drain harness, not
    * the operators.
    */
  val DrainStatePartitions: Int =
    sys.env.get("SPARK_GRAFT_DRAIN_PARTS") match {
      case None => 8
      case Some(v) => scala.util.Try(v.trim.toInt).filter(_ >= 1)
        .getOrElse {
          // a malformed value at object init would otherwise surface as
          // an ExceptionInInitializerError on every StreamParity use
          // (advisor r18) — fall back loudly instead
          System.err.println(
            s"[graft] SPARK_GRAFT_DRAIN_PARTS='$v' is not a positive " +
              "int — using the default 8")
          8
        }
    }

  /** Scratch root for drain checkpoints: tmpfs when available. These
    * checkpoints are DELIBERATELY ephemeral — created per drain and
    * deleted in the same call — so RAM-backing them is semantically
    * free and skips ext4 journal commits on every offset/commit/state
    * file (measured ~0.2 s per drain). A real deployment points its
    * checkpoint at durable storage; this root is harness-only.
    */
  private[streaming] def scratchRoot: java.nio.file.Path = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) shm
    else Paths.get(System.getProperty("java.io.tmpdir"))
  }

  /** Whether drain checkpoints ride the CRC-free [[RawCkptFileSystem]]
    * (default on; `SPARK_GRAFT_DRAIN_RAWFS=0` restores `file://` for
    * A/B). See the scheme's scaladoc for why this is semantically free
    * for ephemeral drain checkpoints.
    */
  private val rawFsEnabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_DRAIN_RAWFS", "1") != "0"

  /** Checkpoint-location string for a scratch dir: `rawckpt://` when
    * enabled (registering the scheme on the session first), else the
    * plain local path.
    */
  private def ckptLocation(spark: SparkSession,
      p: java.nio.file.Path): String =
    if (rawFsEnabled) {
      RawCkptFileSystem.register(spark)
      RawCkptFileSystem.wrap(p)
    } else p.toString

  /** Run `body` with the session's shuffle partitions pinned to
    * [[DrainStatePartitions]], restoring after. Safe for streaming
    * starts: StreamExecution CLONES the session (and its conf) in its
    * constructor, so the override is captured at `start()` and the
    * restore cannot race the micro-batches.
    */
  private def withDrainParallelism[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, DrainStatePartitions.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** Stage a single-file batch table into a file-source drop directory
    * (file-stream sources read directories — a real deployment's ingest
    * dir). Idempotent per (sfDir, table): the copy is skipped only when
    * the staged file matches the source by SIZE AND LAST-MODIFIED TIME
    * (the copy preserves the source mtime), so a regenerated fixture of
    * identical byte size is re-staged rather than silently reused
    * (advisor r9). The stage directory is keyed by the full sanitized
    * sfDir path — not a 32-bit hash of it — so two sf dirs can never
    * collide onto one staged copy. Writes go via temp-file + atomic
    * rename so a concurrent reader never sees a torn file.
    */
  def stageDropDir(sfDir: String, table: String): String = {
    val src = Paths.get(s"$sfDir/$table.parquet")
    val key = Paths.get(sfDir).toAbsolutePath.normalize.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val dir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-stream-stage", key, table)
    Files.createDirectories(dir)
    val dst = dir.resolve("part-0.parquet")
    val fresh = Files.exists(dst) &&
      Files.size(dst) == Files.size(src) &&
      Files.getLastModifiedTime(dst) == Files.getLastModifiedTime(src)
    if (!fresh) {
      val tmp = dir.resolve("part-0.parquet.tmp")
      Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.COPY_ATTRIBUTES)
      Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
    dir.toString
  }

  /** Source schemas, cached per (sfDir, table): the drop-dir file is a
    * byte-identical staged copy of the batch parquet, so its schema is
    * immutable for the life of the stage (stageDropDir re-stages only
    * when size+mtime change — and the testdata fixtures never change
    * schema without changing bytes). Reading the footer per drain cost
    * ~0.15 s × 20 st lanes × every bench pass, all for the same answer.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String), org.apache.spark.sql.types.StructType]()

  private def sourceSchema(spark: SparkSession, sfDir: String,
      table: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent((sfDir, table),
      _ => spark.read.parquet(s"$sfDir/$table.parquet").schema)

  /** The events table as a file-source STREAM with the same `ts`
    * normalization as the batch loader (`Tables.events` runs first so
    * the legacy-nanos conf and UTC-zone enforcement apply identically;
    * cached after the first call per sf dir, like the schema).
    */
  // keyed by (session, sfDir), not sfDir alone: SQLConf is
  // per-SparkSession, so a second session in the same JVM must replay
  // the conf side effects or lose the nanos/UTC pinning (review r17).
  // A WeakHashMap on the session OBJECT (SparkSession doesn't override
  // equals, so keying is by identity), not identityHashCode: identity
  // hashes are reused after GC, so a new session could collide with a
  // stopped one's entry and silently skip the conf side effects
  // (advisor r17). Weak keys keep stopped sessions collectable.
  private val eventsConfDone = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.Set[String]]())
  private def eventsConfFirst(spark: SparkSession, sfDir: String): Boolean =
    eventsConfDone
      .computeIfAbsent(spark,
        _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
      .add(sfDir)
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    if (eventsConfFirst(spark, sfDir)) {
      graft.Tables.events(spark, sfDir) // conf side effects + schema parity
    }
    val drop = stageDropDir(sfDir, "events")
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(sourceSchema(spark, sfDir, "events"))
        .parquet(drop))
  }

  /** The documents table as a file-source STREAM — the ingest shape of
    * a crawled-media drop directory (st14 builds binary assets on top
    * of it with the same stateless synth/decode operators batch uses).
    */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val drop = stageDropDir(sfDir, "documents")
    spark.readStream.schema(sourceSchema(spark, sfDir, "documents"))
      .parquet(drop)
  }

  /** Run a streaming frame to completion (`AvailableNow`) through a
    * memory sink and return the final result as a LOCAL batch frame.
    * The sink rows are copied out and the backing temp view dropped so
    * repeated drains (bench warm-up + min-of-N passes) never accumulate
    * sink state across runs. Query names are uniquified for the same
    * reason.
    *
    * Session hygiene (round-9 verdict #2): the checkpoint dir is
    * EXPLICIT and deleted here after the drain — the implicit
    * `/tmp/temporary-*` dirs Spark creates are only best-effort-deleted
    * at JVM exit, which compounds over a long session (7 st* lanes × 4
    * bench passes per run) — and the state-store providers the drained
    * query loaded are unloaded from the executor map (local mode: this
    * JVM) instead of lingering until the next maintenance sweep.
    */
  def drain(df: DataFrame, mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    val name = "st_drain_" + drainCounter.incrementAndGet()
    val ckpt = Files.createTempDirectory(scratchRoot, "graft-st-ckpt-")
    try {
      val q = withDrainParallelism(spark) {
        df.writeStream
          .format("memory").queryName(name)
          .outputMode(mode)
          .option("checkpointLocation", ckptLocation(spark, ckpt))
          .trigger(Trigger.AvailableNow())
          .start()
      }
      q.awaitTermination()
      val sunk = spark.table(name)
      val schema = sunk.schema
      val rows: java.util.List[Row] = java.util.Arrays.asList(
        sunk.collect(): _*)
      spark.catalog.dropTempView(name)
      spark.createDataFrame(rows, schema)
    } finally {
      org.apache.spark.sql.graftshim.StateStoreHygiene.unloadAllProviders()
      deleteRecursively(ckpt)
    }
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    if (Files.exists(root)) {
      val it = Files.walk(root)
      try it.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally it.close()
    }
  }

  def drainAppend(df: DataFrame): DataFrame = drain(df, OutputMode.Append())
  def drainUpdate(df: DataFrame): DataFrame = drain(df, OutputMode.Update())

  /** Drain [[StreamingOps.upsertSink]] TWICE over the events stream and
    * return the final snapshot as a local batch frame — the CDC-apply
    * parity harness. Drain 1 exercises the initial-snapshot branch
    * (v=0); drain 2 (fresh checkpoint, same state dir) re-applies the
    * same batch through the ANTI-JOIN MERGE branch and must publish a
    * v=1 snapshot with identical logical content — idempotent re-apply,
    * the property that makes the sink safe under replay. The snapshot
    * content is deterministic SQL: last row per key by the `orderCol`
    * total order (the row-fingerprint tiebreak exists for producer
    * retries; on the gated corpus (user_id, ts) is unique, verified, so
    * it never decides). All state/checkpoint dirs are deleted before
    * returning.
    */
  def upsertParity(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val root = Files.createTempDirectory(scratchRoot, "graft-st-upsert-")
    val stateDir = root.resolve("state").toString
    try {
      for (i <- 1 to 2) {
        val ev = eventsStream(spark, sfDir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        withDrainParallelism(spark) {
          StreamingOps.upsertSink(ev, stateDir,
            ckptLocation(spark, root.resolve(s"ck$i")), Seq("user_id"), "ts")
        }.awaitTermination()
      }
      val v = StreamingOps.latestVersion(stateDir)
      require(v.contains(1L), s"expected snapshot v=1 after two drains: $v")
      val snap = StreamingOps.currentSnapshot(spark, stateDir).get
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
      val rows: java.util.List[Row] = java.util.Arrays.asList(
        snap.collect(): _*)
      spark.createDataFrame(rows, snap.schema)
    } finally deleteRecursively(root)
  }
}
