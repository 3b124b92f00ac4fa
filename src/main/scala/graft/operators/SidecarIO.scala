package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path

/** Tiny-metadata sidecar IO for persisted index directories, routed
  * through the Hadoop `FileSystem` RESOLVED FROM THE PATH ITSELF — the
  * index data is written by the Spark/Hadoop writer, so a sidecar
  * written with `java.nio.file` would land on the driver's LOCAL disk
  * (or throw) whenever the index dir is an `hdfs://` / `s3a://` URI,
  * leaving a torn index whose readers fail the metadata `require`.
  * Same-scheme IO keeps build and probe coherent on any filesystem.
  */
private[graft] object SidecarIO {
  private def conf() =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  def write(dir: String, name: String, content: String): Unit = {
    val p = new Path(dir, name)
    val out = p.getFileSystem(conf()).create(p, true)
    try out.write(content.getBytes(UTF_8)) finally out.close()
  }

  def exists(dir: String, name: String): Boolean = {
    val p = new Path(dir, name)
    p.getFileSystem(conf()).exists(p)
  }

  def read(dir: String, name: String): String = {
    val p = new Path(dir, name)
    val in = p.getFileSystem(conf()).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, UTF_8)
    } finally in.close()
  }
}
