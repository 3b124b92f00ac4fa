package graft.streaming

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A `rawckpt://` scheme for the parity harness's EPHEMERAL drain
  * checkpoints: Hadoop's default local filesystem (`file://` →
  * `LocalFileSystem`) is a `ChecksumFileSystem` — every tiny metadata
  * write (offset log, commit log, per-store delta file) also creates,
  * writes and renames a `.crc` twin, and every read re-verifies it.
  * Drain checkpoints are created and deleted WITHIN one call on tmpfs
  * (`StreamParity.scratchRoot`), so checksum durability buys nothing:
  * a torn drain fails its lane loudly either way. Registering this
  * scheme (FileSystem-only, no AbstractFileSystem entry) also makes
  * `CheckpointFileManager` fall back from the FileContext manager to
  * the plain FileSystem manager — same rename-based atomicity on a
  * local fs, fewer resolver layers.
  *
  * Harness-only by construction: the ONLY producer of `rawckpt://`
  * paths is [[StreamParity]]'s drain/upsert checkpoint plumbing.
  * Production deployments point their checkpoints at durable storage
  * (HDFS/S3) where the scheme never appears; reliable-mode library
  * checkpoints ([[graft.Ckpt]]) are untouched.
  */
class RawCkptFileSystem extends RawLocalFileSystem {
  override def getUri: URI = RawCkptFileSystem.NAME
}

object RawCkptFileSystem {
  val Scheme = "rawckpt"
  private val NAME = URI.create(s"$Scheme:///")

  /** Register the scheme on the context's Hadoop conf (idempotent —
    * plain conf set). Must run before a query `start()` so the cloned
    * session/hadoop confs that StreamExecution captures carry it.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.$Scheme.impl", classOf[RawCkptFileSystem].getName)

  /** `rawckpt://`-schemed form of a local path. */
  def wrap(p: java.nio.file.Path): String = s"$Scheme://$p"
}
