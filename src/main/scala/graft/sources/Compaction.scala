package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Managed parquet sink for curated corpora: partition layout + bounded
  * file sizes + within-file clustering — the output-management half of a
  * training-data pipeline (the reference's only sinks are a sequential
  * NDJSON stream and a JSON manifest, `city-directories.js:341-450`;
  * this is the engine-native, cluster-scale replacement).
  *
  * Scale design:
  *  - `repartition(partCols)` puts each output partition's rows on one
  *    task set, so a directory is written by few tasks instead of every
  *    task emitting a sliver file into every directory (the classic
  *    small-files explosion: tasks × partitions files).
  *  - `maxRecordsPerFile` caps file size from above; the repartition
  *    caps file COUNT from below — together they bound files into the
  *    [target, 2×target] band a downstream trainer wants.
  *  - `sortWithinPartitions(clusterBy)` clusters rows inside each file
  *    so parquet min/max stats make downstream range predicates prune
  *    row groups (poor man's Z-order for one key).
  */
object Compaction {

  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String],
                       clusterBy: Seq[String] = Nil,
                       maxRecordsPerFile: Long = 1000000L,
                       format: String = "parquet"): Unit = {
    val parted = df.repartition(partCols.map(col): _*)
    val clustered =
      if (clusterBy.isEmpty) parted
      else parted.sortWithinPartitions((partCols ++ clusterBy).map(col): _*)
    clustered.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      // parquet and orc both ride Spark's columnar file source, so
      // partition pruning / predicate pushdown / column pruning carry
      // across formats unchanged (q35 pins this for orc)
      .format(format)
      .save(path)
  }

  /** Hash-sharded training-data export: the deterministic global
    * shuffle. Every row lands in `shard = md5(id) % nShards`
    * ([[graft.operators.TextAnalysisOps.shardAssign]]) and shards are
    * written hive-partitioned, each internally ordered by the id's md5 —
    * so the byte layout is a pure function of the row set: any engine,
    * any retry, any cluster size reproduces it, and
    * `TextAnalysisOps.shardManifest` over the same frame predicts
    * exactly what lands on disk (count / weight / order fingerprint
    * per shard). One shuffle + per-task sort; `maxRecordsPerFile`
    * bounds file sizes inside each shard directory.
    */
  def writeHashSharded(df: DataFrame, path: String, idCol: String,
                       nShards: Int,
                       maxRecordsPerFile: Long = 1000000L): Unit = {
    val sharded = df.withColumn("shard",
      graft.operators.TextAnalysisOps.shardAssign(col(idCol), nShards))
    sharded
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"),
        md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .parquet(path)
  }

  /** Rewrite an existing (possibly fragmented) parquet directory into the
    * managed layout — the standalone compaction job a pipeline schedules
    * after many incremental appends.
    */
  def compact(df: DataFrame, path: String, partCols: Seq[String],
              clusterBy: Seq[String] = Nil,
              maxRecordsPerFile: Long = 1000000L): Unit =
    writePartitioned(df, path, partCols, clusterBy, maxRecordsPerFile)

  /** In-place compaction of a fragmented directory — the maintenance
    * job an append-heavy posting index schedules. Spark refuses (or
    * corrupts, depending on committer) an overwrite of a path that is
    * also being read, so the frame is SNAPSHOTTED first
    * (`localCheckpoint(eager)` — executor-storage materialization)
    * and released after the rewrite. This is the bounded-size/local
    * variant; a production pipeline over object storage writes to a
    * temp prefix and swaps atomically instead of holding the snapshot
    * in cluster storage.
    */
  def compactInPlace(spark: org.apache.spark.sql.SparkSession,
                     path: String, partCols: Seq[String],
                     clusterBy: Seq[String] = Nil,
                     maxRecordsPerFile: Long = 1000000L): Unit = {
    val snap = spark.read.parquet(path).localCheckpoint(true)
    try writePartitioned(snap, path, partCols, clusterBy,
      maxRecordsPerFile)
    finally graft.Release(snap, blocking = true)
  }

  /** Z-order-clustered write: range-partition and sort by the Morton
    * interleave of two int key columns, so rows close in EITHER
    * dimension land in the same files and parquet row-group min/max
    * stats prune range predicates on both — multi-dimensional data
    * skipping for the two-filter-column case `writePartitioned`'s
    * single-column `clusterBy` cannot serve. The z column is dropped
    * before writing; the layout IS the index.
    */
  /** File listing of a partitioned parquet directory as a
    * (part, file, bytes) manifest frame — the input [[compactionPlan]]
    * consumes. `part` is the relative directory ("" at the root),
    * `file` the filename, `bytes` the on-disk size. Listing runs on
    * the driver (manifest-scale, like every table format's metadata
    * layer); a production pipeline persists this next to the data and
    * maintains it incrementally (the zonemapBuild discipline) instead
    * of re-listing object storage per plan.
    */
  def fileManifest(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify so relativize sees the same scheme the listing returns
    val root = fs.makeQualified(new Path(path))
    val it = fs.listFiles(root, true)
    val rows = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter { f => val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".") }
      .map { f =>
        val rel = root.toUri.relativize(f.getPath.toUri).getPath
        val cut = rel.lastIndexOf('/')
        (if (cut < 0) "" else rel.substring(0, cut),
          f.getPath.getName, f.getLen)
      }.toSeq
    import spark.implicits._
    rows.toDF("part", "file", "bytes")
  }

  /** Small-file compaction PLAN over a (part, file, bytes) manifest:
    * which files to rewrite together, which to leave — the
    * metadata-only half of OPTIMIZE that decides before any data
    * moves. Files at or over `targetBytes` are already compact and
    * `keep` (bin −1). The rest bin-pack per partition by prefix-sum
    * binning in file-name order: bin = (running total BEFORE the
    * file) div target — each rewrite group lands in
    * [target, target + largest member), name order keeps neighboring
    * (usually time-adjacent) files merging together, and the
    * assignment is a pure function of the manifest, so the plan
    * replays exactly (rerunning a half-applied compaction computes
    * identical groups). A group of ONE file is a pointless rewrite and
    * degrades to `keep`.
    *
    * Scale shape: one window shuffle over the MANIFEST (rows = files,
    * not data — millions of rows for a 100-TB table, trivially
    * partition-parallel on `part`), plus a group-size agg of the same
    * size. The plan then drives [[compact]] per bin; the data itself
    * is touched only by the rewrites the plan names.
    */
  def compactionPlan(manifest: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("part")).orderBy(col("file").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = manifest.filter(col("bytes") < targetBytes)
      .withColumn("_cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(_cum - bytes) div $targetBytes"))
      .drop("_cum")
    val sizes = binned.groupBy(col("part"), col("bin"))
      .agg(count(lit(1)).as("_nf"))
    val small = binned.join(sizes, Seq("part", "bin"))
      .select(col("part"), col("file"), col("bytes"),
        when(col("_nf") === 1, lit(-1L)).otherwise(col("bin")).as("bin"),
        when(col("_nf") === 1, lit("keep")).otherwise(lit("rewrite"))
          .as("action"))
    val big = manifest.filter(col("bytes") >= targetBytes)
      .select(col("part"), col("file"), col("bytes"),
        lit(-1L).as("bin"), lit("keep").as("action"))
    small.unionByName(big)
  }

  /** Build a file-level zonemap manifest for an existing parquet
    * directory: one row per data file with min/max per tracked column.
    * This is the data-skipping index table-format metadata layers keep
    * (Delta/Iceberg file stats) expressed as a plain DataFrame a
    * pipeline can persist next to the data.
    *
    * Scale shape: one scan grouped by `input_file_name()` — partial
    * min/max aggs combine map-side, and the exchange carries one row
    * per (file × column), i.e. manifest-sized, not data-sized. Rebuild
    * is embarrassingly parallel and incremental (group only new files).
    */
  def zonemapBuild(spark: org.apache.spark.sql.SparkSession, path: String,
                   cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read only the files whose zonemap interval overlaps `[lo, hi]` on
    * `zCol` — file-level data skipping driven by the manifest instead
    * of footer reads. The file list is manifest-sized planning state
    * (the same thing a table format's scan planner materializes), NOT
    * a data collect. Callers re-apply the exact predicate after the
    * read: skipping prunes whole files; surviving files still hold
    * out-of-range rows.
    */
  def zonemapPrunedRead(spark: org.apache.spark.sql.SparkSession,
                        manifest: DataFrame, zCol: String,
                        lo: org.apache.spark.sql.Column,
                        hi: org.apache.spark.sql.Column): DataFrame = {
    val files = manifest
      .filter(col(s"${zCol}_max") >= lo && col(s"${zCol}_min") <= hi)
      .select("file").collect().map(_.getString(0))
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else {
      // every file pruned: an empty result must still carry the data
      // schema (spark.read.parquet() with zero paths throws) — read
      // any manifest file footer-only under an always-false predicate
      val any = manifest.select("file").limit(1).collect()
      if (any.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(any(0).getString(0)).filter(lit(false))
    }
  }

  def writeZOrdered(df: DataFrame, path: String,
                    zCols: (String, String),
                    maxRecordsPerFile: Long = 1000000L): Unit =
    df.withColumn("_z", graft.functions.Morton.morton(
        col(zCols._1), col(zCols._2)))
      .repartitionByRange(col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
