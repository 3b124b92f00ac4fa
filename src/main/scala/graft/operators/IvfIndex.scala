package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build ONCE, search many — the index-artifact
  * counterpart of the transient [[SimilarityOps.ivfTopK]] (which
  * re-derives centroids and assignments on every call).
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

  /** Derive centroids + nearest-cell assignments (identical derivation
    * to [[SimilarityOps.ivfTopK]] steps 1-2) and persist both.
    */
  def build(corpus: DataFrame, dir: String, nList: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : Unit = {
    val spark = corpus.sparkSession
    val centroids = corpus
      .select((abs(hash(col(idCol))) % nList).as("_cell"), col(vecCol))
      .groupBy("_cell")
      .agg(VectorMeanAgg.vecMean(col(vecCol)).as("_cmean"))
      .filter(col("_cmean").isNotNull)
      .select(col("_cell"),
        transform(col("_cmean"), x => x.cast("float")).as("_cvec"))
    centroids.write.mode(SaveMode.Overwrite).parquet(s"$dir/centroids")
    // read the persisted centroids back for the assignment pass, so the
    // (cheap but not free) centroid derivation runs exactly once
    val persisted = spark.read.parquet(s"$dir/centroids")
    val cells = graft.plans.TopK.perKey(
      corpus.crossJoin(broadcast(persisted))
        .withColumn("_d", kernel(col(vecCol), col("_cvec"))),
      Seq(idCol), Seq(col("_d").desc), 1)
      .select(col(idCol), col(vecCol), col("_cell"))
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

  /** Top-k ANN against a persisted index. Same probe/score/rank shape
    * as [[SimilarityOps.ivfTopK]] steps 3-4, but the corpus side comes
    * from the partition-pruned cells scan.
    */
  def search(spark: SparkSession, dir: String, queries: DataFrame,
             k: Int, nProbe: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             kernel: (Column, Column) => Column = SimilarityOps.cosine)
      : DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val probes = graft.plans.TopK.perKey(
      queries
        .select(col(idCol).as("query_id"), col(vecCol).as("_qv"))
        .crossJoin(broadcast(centroids))
        .withColumn("_d", kernel(col("_qv"), col("_cvec"))),
      Seq("query_id"), Seq(col("_d").desc), nProbe)
      .select(col("query_id"), col("_qv"), col("_cell"))
    val probedCells = probes.select("_cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val cells = probedCellScan(spark, dir, probedCells)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"), col("_cell"))
    graft.plans.TopK.perKey(
      probes.join(cells, Seq("_cell"))
        .filter(col("query_id") =!= col("_cid"))
        .withColumn("sim", round(kernel(col("_qv"), col("_cv")), 4))
        .select(col("query_id"), col("_cid").as("neighbor_id"), col("sim")),
      Seq("query_id"), Seq(col("sim").desc, col("neighbor_id").asc), k,
      rankCol = "rk")
  }
}
