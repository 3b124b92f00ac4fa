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
  *   `centroids/` — nList rows `(_cell, _cvec)`;
  *   `cells/`     — the corpus `(id, vector)` hive-partitioned by
  *                  `_cell`, each cell clustered by id.
  *
  * The scale property lives in `search`: probed cell ids are collected
  * (≤ queries × nProbe ints — never vectors) and pushed as a static
  * `IN` partition filter, so the cells scan lists and reads ONLY the
  * probed directories. At 1000 executors over a 100 TB corpus that is
  * nProbe/nList of the data touched per query batch; the rest never
  * leaves storage.
  */
object IvfIndex {

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

  /** The probed-cells scan, isolated so its plan shape is assertable:
    * a parquet scan whose PartitionFilters contain the `IN` over the
    * probed cell ids — pruning happens at file listing, before IO.
    */
  def probedCellScan(spark: SparkSession, dir: String,
                     cells: Seq[Int]): DataFrame =
    spark.read.parquet(s"$dir/cells")
      .filter(col("_cell").isin(cells.map(c => c: Any): _*))

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
             kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val probes = SimilarityOps.ivfProbe(queries, centroids, nProbe,
      idCol, vecCol, kernel).persist()
    val probedCells = probes.select("_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = probedCellScan(spark, dir, probedCells)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"), col("_cell"))
    SimilarityOps.ivfScore(probes, cells, k, kernel)
  }
}
