package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Actually releases a `localCheckpoint`-backed Dataset's storage.
  *
  * `Dataset.unpersist` consults only the CacheManager, which tracks
  * plan-fingerprint caches created by `persist()`; a localCheckpoint
  * persists at the RDD layer, which the CacheManager never sees — so
  * the natural `df.unpersist()` release idiom SILENTLY NO-OPS on a
  * checkpointed frame and the blocks survive until the ContextCleaner
  * happens to GC the RDD reference (measured: the eagerly-checkpointed
  * BPE vocab stayed in `getPersistentRDDs` through `unpersist` and was
  * only reclaimed after an unrelated job triggered cleanup). Under a
  * tight heap that lag is the difference between a lane-to-lane reset
  * and a slow accumulation of dead blocks.
  *
  * This helper reaches through the `LogicalRDD` leaf to the persisted
  * RDD and unpersists it directly; for any other plan shape it falls
  * back to `Dataset.unpersist`, so it is safe as the universal release
  * call for both `persist()`ed and checkpointed frames.
  */
object Release {
  def apply(df: Dataset[_], blocking: Boolean = false): Unit = {
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking)
        // RELIABLE checkpoints ([[Ckpt]] with spark.graft.checkpoint.dir
        // set) hold files, not blocks — delete them, symmetrically with
        // the block unpersist, but ONLY when graft owns them: under the
        // configured dir (path-boundary compare) or under a context
        // checkpoint dir Ckpt itself set (so the reap still works after
        // the conf is unset — review r17). A checkpoint file someone
        // else owns (sc.setCheckpointDir set by the application for its
        // own frames) is not ours to reap. Call discipline is the
        // caller's, same as for blocks: release a generation only after
        // its successor is materialized.
        lr.rdd.getCheckpointFile.foreach { f =>
          if (Ckpt.owns(df, f)) {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(p, true)
          }
        }
      case _ => df.unpersist(blocking); ()
    }
  }
}
