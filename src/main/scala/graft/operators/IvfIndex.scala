package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build ONCE, search many — the index-artifact
  * counterpart of the transient [[SimilarityOps.ivfTopK]] (which
  * re-derives centroids and assignments on every call). Both run the
  * same shared steps (`SimilarityOps.ivfCentroids/ivfAssign/ivfProbe/
  * ivfScore`), so a fix or kernel change lands in one place and the
  * persisted==transient equality holds by construction.
  *
  * Layout under `dir`:
  *   `centroids/`  — nList rows `(_cell, _cvec)`;
  *   `cells/`      — the corpus `(id, vector)` hive-partitioned by
  *                   `_cell`, each cell clustered by id;
  *   `tombstones/` — optional append-only deleted-id list ([[delete]];
  *                   masked at read, reclaimed by [[vacuum]]).
  *
  * The scale property lives in `search`: probed cell ids are collected
  * (≤ queries × nProbe ints — never vectors) and pushed as a static
  * `IN` partition filter, so the cells scan lists and reads ONLY the
  * probed directories. At 1000 executors over a 100 TB corpus that is
  * nProbe/nList of the data touched per query batch; the rest never
  * leaves storage.
  */
object IvfIndex {

  /** Read a table of the index layout. `immutable = true` routes
    * through the per-session resolved-relation memo
    * ([[graft.Tables.immutablePath]]) — for callers whose dir is a
    * marker-gated fixture built once per process and never rewritten
    * afterwards (the ss search lanes; r18 verdict item 5). The relation
    * keeps its partition-aware file index, so `_cell` partition
    * pruning is unchanged (PartitionFilters asserted in PlanShapeSpec).
    * Callers that append/delete/vacuum between reads must keep the
    * default direct read.
    */
  private def readTable(spark: SparkSession, path: String,
                        immutable: Boolean): DataFrame =
    if (immutable) graft.Tables.immutablePath(spark, path)
    else spark.read.parquet(path)

  /** Derive centroids + nearest-cell assignments and persist both. */
  def build(corpus: DataFrame, dir: String, nList: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : Unit = {
    val spark = corpus.sparkSession
    SimilarityOps.ivfCentroids(corpus, nList, idCol, vecCol)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    // read the persisted centroids back for the assignment pass, so the
    // (cheap but not free) centroid derivation runs exactly once
    val persisted = spark.read.parquet(s"$dir/centroids")
    val cells = SimilarityOps.ivfAssign(corpus, persisted, idCol, vecCol,
      kernel)
    graft.sources.Compaction.writePartitioned(
      cells, s"$dir/cells", Seq("_cell"), clusterBy = Seq(idCol))
  }

  /** Incremental maintenance: assign a NEW batch against the PERSISTED
    * centroids and append its rows into the existing cell layout — the
    * dd10 band-index discipline applied to the vector index
    * (production ANN banks the index once and ingests batches; a
    * rebuild per batch re-scans the corpus). Centroids are FROZEN:
    * re-training the coarse quantizer is by definition a rebuild, and
    * freezing it is what makes the append pure — the standing rows'
    * assignments stay valid, the appended rows land in the same hive
    * `_cell` layout, and the probed-cell partition pruning keeps
    * working unchanged. Only the batch is scanned; the standing corpus
    * is never touched.
    */
  def append(batch: DataFrame, dir: String,
             idCol: String = "vec_id", vecCol: String = "embedding",
             kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : Unit = {
    val spark = batch.sparkSession
    val persisted = spark.read.parquet(s"$dir/centroids")
    val cells = SimilarityOps.ivfAssign(batch, persisted, idCol, vecCol,
      kernel)
    cells.repartition(col("_cell"))
      .sortWithinPartitions(col("_cell"), col(idCol))
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", 1000000L)
      .partitionBy("_cell")
      .parquet(s"$dir/cells")
  }

  /** [[append]] for the two-level IVF-PQ artifact: the batch joins the
    * cell layout under the frozen IVF centroids AND gets PQ-encoded
    * against the FROZEN per-subspace codebooks (re-training either
    * quantizer is a rebuild). The encode is the same
    * assign-to-centroid rule `pqTrain` used (kernel desc, cluster-asc
    * tie-break), so an appended vector's code is exactly what a
    * from-scratch encode against the persisted codebooks gives; codes
    * append into the same `_cell`-partitioned layout, so
    * [[searchPq]]'s partition pruning is unchanged. Only the batch is
    * scanned.
    *
    * Atomicity: cells and codes are two writes — a failure between
    * them leaves an index whose cell rows lack codes. Run appends
    * under a validity-marker protocol (delete marker → append →
    * re-create marker; `IvfFixture.buildWithMarker` is the reference
    * implementation) so a torn append fails loudly at read time
    * instead of silently under-scoring the batch.
    */
  def appendPq(batch: DataFrame, dir: String, m: Int, subDim: Int,
               idCol: String = "vec_id", vecCol: String = "embedding",
               kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : Unit = {
    val spark = batch.sparkSession
    append(batch, dir, idCol, vecCol, kernel)
    val codebooks = spark.read.parquet(s"$dir/codebooks")
    val perSub = (0 until m).map { j =>
      val sub = batch.select(col(idCol),
        slice(col(vecCol), j * subDim + 1, subDim).as(vecCol))
      val cb = codebooks.filter(col("subspace") === j)
        .select(col("cluster").as("_cell"), col("_cv").as("_cvec"))
      SimilarityOps.ivfAssign(sub, cb, idCol, vecCol, kernel)
        .select(col(idCol), col("_cell").as(s"_c$j"))
    }
    val codes = perSub.reduce((a, b) => a.join(b, Seq(idCol)))
      .select(col(idCol),
        array((0 until m).map(j => col(s"_c$j")): _*).as("pq_code"))
    val assign = spark.read.parquet(s"$dir/cells")
      .join(batch.select(col(idCol)), Seq(idCol), "left_semi")
      .select(col(idCol), col("_cell"))
    codes.join(assign, Seq(idCol))
      .repartition(col("_cell"))
      .sortWithinPartitions(col("_cell"), col(idCol))
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", 1000000L)
      .partitionBy("_cell")
      .parquet(s"$dir/codes")
  }

  /** The probed-cells scan, isolated so its plan shape is assertable:
    * a parquet scan whose PartitionFilters contain the `IN` over the
    * probed cell ids — pruning happens at file listing, before IO.
    */
  def probedCellScan(spark: SparkSession, dir: String,
                     cells: Seq[Int],
                     immutable: Boolean = false): DataFrame =
    readTable(spark, s"$dir/cells", immutable)
      .filter(col("_cell").isin(cells.map(c => c: Any): _*))

  /** IVF-PQ index: [[build]] plus per-subspace PQ codebooks and the
    * corpus' codes, the codes hive-partitioned by IVF cell — the
    * standard two-level ANN artifact (coarse cell quantizer × fine
    * product quantizer). [[searchPq]] then touches nProbe/nList of the
    * CODES (a few bytes per vector), and the full-precision corpus is
    * never read at search time at all.
    *
    * Codes quantize the raw vectors, not the cell residuals (classic
    * IVF-PQ quantizes `x − centroid(cell)`): cosine selection over
    * md5-seeded deterministic codebooks replays exactly cross-engine,
    * residuals would not.
    *
    * Layout adds to [[build]]'s:
    *   `codebooks/` — m × kPq rows `(subspace, cluster, _cv)`;
    *   `codes/`     — `(id, pq_code)` hive-partitioned by `_cell`.
    */
  def buildPq(corpus: DataFrame, dir: String, nList: Int, m: Int,
              subDim: Int, kPq: Int, iters: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : Unit = {
    build(corpus, dir, nList, idCol, vecCol, kernel)
    val spark = corpus.sparkSession
    val (codes, codebooks) = SimilarityOps.pqTrain(corpus, m, subDim,
      kPq, iters, idCol, vecCol)
    codebooks.write.mode(SaveMode.Overwrite).parquet(s"$dir/codebooks")
    // persist codes under the IVF cell layout, so a probed search
    // partition-prunes the code scan exactly like the cell scan
    val assign = spark.read.parquet(s"$dir/cells")
      .select(col(idCol), col("_cell"))
    graft.sources.Compaction.writePartitioned(
      codes.join(assign, Seq(idCol)), s"$dir/codes", Seq("_cell"),
      clusterBy = Seq(idCol))
  }

  /** The probed-codes scan — [[probedCellScan]]'s twin over `codes/`,
    * isolated so the partition-level pruning is assertable.
    */
  def probedCodeScan(spark: SparkSession, dir: String,
                     cells: Seq[Int],
                     immutable: Boolean = false): DataFrame =
    readTable(spark, s"$dir/codes", immutable)
      .filter(col("_cell").isin(cells.map(c => c: Any): _*))

  /** Top-k ADC search against a persisted IVF-PQ index: probe the
    * centroid table for each query's nProbe cells, partition-prune the
    * CODE scan to the probed cells, and rank candidates by the summed
    * per-subspace lookup-table score
    * ([[SimilarityOps.adcScoreCells]]). IO per query batch is
    * nProbe/nList of the code table — m small ints per corpus vector —
    * plus the centroid and codebook tables; the raw vectors stay on
    * disk, unread.
    */
  def searchPq(spark: SparkSession, dir: String, queries: DataFrame,
               k: Int, nProbe: Int, m: Int, subDim: Int,
               idCol: String = "vec_id", vecCol: String = "embedding",
               kernel: (Column, Column) => Column = SimilarityOps.cosine,
               immutable: Boolean = false)
      : DataFrame = {
    val centroids = readTable(spark, s"$dir/centroids", immutable)
    val codebooks = readTable(spark, s"$dir/codebooks", immutable)
    val probes = SimilarityOps.ivfProbe(queries, centroids, nProbe,
      idCol, vecCol, kernel).persist()
    val probedCells = probes.select("_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val codes = probedCodeScan(spark, dir, probedCells, immutable)
    SimilarityOps.adcScoreCells(queries, probes, codes, codebooks,
      k, m, subDim, idCol, vecCol)
  }

  /** Top-k ANN against a persisted index. The probe result is cached:
    * it is both collected (for the partition filter) and joined (for
    * scoring); the collect fills the cache, so the join reads the SAME
    * probe set without a second queries × centroids pass. (Probe
    * ordering also carries a deterministic `_cell` tiebreak, so even a
    * cache-evicted recompute cannot diverge.)
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int, nProbe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             kernel: (Column, Column) => Column = SimilarityOps.cosine,
             immutable: Boolean = false)
      : DataFrame = {
    val centroids = readTable(spark, s"$dir/centroids", immutable)
    val probes = SimilarityOps.ivfProbe(queries, centroids, nProbe,
      idCol, vecCol, kernel).persist()
    val probedCells = probes.select("_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val scanned = probedCellScan(spark, dir, probedCells, immutable)
    val live = tombstoneScan(spark, dir, idCol, immutable) match {
      case Some(ts) =>
        // deletes are logical: the cell layout is immutable between
        // vacuums, so deleted rows are masked by a broadcast anti-join
        // against the (small-by-premise) tombstone set — the standard
        // tombstone read path; [[vacuum]] physically reclaims
        scanned.join(broadcast(ts), Seq(idCol), "left_anti")
      case None => scanned
    }
    val cells = live
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"), col("_cell"))
    SimilarityOps.ivfScore(probes, cells, k, kernel)
  }

  private def tombstoneScan(spark: SparkSession, dir: String,
                            idCol: String,
                            immutable: Boolean = false)
      : Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      Some(readTable(spark, path.toString, immutable)
        .select(col(idCol)).distinct())
    else None
  }

  /** Logical DELETE from the persisted index: the ids land in an
    * append-only tombstone table and [[search]] masks them with a
    * broadcast anti-join — the cell layout itself is immutable between
    * [[vacuum]]s, so deletes never rewrite data files (the standard
    * merge-on-read discipline every table format uses for deletes).
    * A deleted id can still appear as a QUERY — deletion removes a
    * vector from the searchable corpus, not from the world.
    */
  def delete(ids: DataFrame, dir: String,
             idCol: String = "vec_id"): Unit =
    ids.select(col(idCol)).distinct()
      .coalesce(1) // tombstone batches are id-lists, not data
      .write.mode(SaveMode.Append).parquet(s"$dir/tombstones")

  /** Physical reclamation: rewrite the cell layout minus the
    * tombstoned rows and drop the tombstone table — the maintenance
    * job scheduled when the tombstone set grows past what a broadcast
    * should carry. Search results are identical before and after by
    * construction (the anti-join was already masking these rows); the
    * snapshot-then-overwrite is the [[graft.sources.Compaction
    * .compactInPlace]] discipline.
    */
  def vacuum(spark: SparkSession, dir: String,
             idCol: String = "vec_id"): Unit =
    tombstoneScan(spark, dir, idCol).foreach { ts =>
      val snap = spark.read.parquet(s"$dir/cells")
        .join(broadcast(ts), Seq(idCol), "left_anti")
        .localCheckpoint(true)
      try graft.sources.Compaction.writePartitioned(
        snap, s"$dir/cells", Seq("_cell"), clusterBy = Seq(idCol))
      finally graft.Release(snap, blocking = true)
      val path = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(path, true)
    }
}
