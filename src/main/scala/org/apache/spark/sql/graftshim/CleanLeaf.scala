package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Strips the ORIGIN CONSTRAINTS a checkpoint-backed frame lazily
  * propagates from its pre-checkpoint plan.
  *
  * `Dataset.localCheckpoint`/`checkpoint` wrap the materialized RDD in
  * a `LogicalRDD` that re-derives statistics AND constraints from the
  * origin dataset's OPTIMIZED plan — lazily, at first `.stats` /
  * `.constraints` access. For the iterative-operator shape (unions of
  * many checkpointed generations, re-consumed under joins that
  * duplicate attribute ids), that deferred derivation walks a plan the
  * optimizer has since rewritten and crashes in
  * `UnionBase.rewriteConstraints` with `key not found: <attr>`
  * (reproduced on Spark 4.1 by the multi-pivot SCC parts union;
  * SccScratch in r17). Constraints on a checkpoint leaf buy only
  * re-inferred IsNotNull filters downstream — nothing semantic — so
  * the iterative checkpoint primitive ([[graft.Ckpt]]) rebuilds the
  * leaf without them. STATS ARE KEPT (forced eagerly here, while the
  * origin mapping is still coherent): they carry sizeInBytes, which
  * drives broadcast planning for joins against checkpointed frames.
  *
  * Mirrors the ColumnBridge/StateStoreHygiene pattern: a minimal
  * `org.apache.spark.sql` shim re-exporting exactly one private
  * surface, nothing copied.
  */
object CleanLeaf {
  def stripConstraints(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr @ LogicalRDD(output, rdd, part, ord, streaming, stream) =>
        val sp = df.sparkSession.asInstanceOf[SparkSession]
        val stats = lr.stats // force origin stats while still coherent
        Dataset.ofRows(sp,
          new LogicalRDD(output, rdd, part, ord, streaming, stream)(
            sp, Some(stats), None))
      case _ => df
    }
}
