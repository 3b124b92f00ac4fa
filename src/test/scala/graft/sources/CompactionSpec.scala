package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("writePartitioned: hive layout, bounded files, clustered, lossless") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory("graft-compact").toString
    Compaction.writePartitioned(docs, out, Seq("lang"),
      clusterBy = Seq("doc_id"), maxRecordsPerFile = 20L)

    // hive-style partition directories, one per language
    val langDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("lang=")).toSeq
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(langDirs.map(_.getFileName.toString.stripPrefix("lang=")).toSet
      == langs)

    // every data file respects maxRecordsPerFile
    val files = langDirs.flatMap(d => Files.list(d).iterator().asScala)
      .filter(_.toString.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 20L, s"$f has $n rows")
      // clustering: rows inside each file are sorted by doc_id, so
      // parquet row-group min/max stats prune doc_id range predicates
      val ids = spark.read.parquet(f.toString)
        .select("doc_id").as[Long].collect().toSeq
      assert(ids == ids.sorted, s"$f not clustered by doc_id")
    }

    // read-back is lossless (partition column restored from the path)
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    val a = docs.select("doc_id", "lang").as[(Long, String)].collect().toSet
    val b = back.select("doc_id", "lang").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("compactionPlan over a real directory: total cover, bounded bins, sane keeps") {
    // fragment on purpose: tiny maxRecordsPerFile ⇒ many small files
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Files.createTempDirectory("graft-plan").toString
    Compaction.writePartitioned(docs, out, Seq("lang"),
      maxRecordsPerFile = 7L)
    val manifest = Compaction.fileManifest(spark, out)
    val mRows = manifest.as[(String, String, Long)].collect()
    assert(mRows.nonEmpty && mRows.forall(_._3 > 0) &&
      mRows.forall(_._1.startsWith("lang=")))
    val target = mRows.map(_._3).max + 1 // every file "small" ⇒ all pack
    val plan = Compaction.compactionPlan(manifest, target)
      .as[(String, String, Long, Long, String)].collect()
    // the plan covers every file exactly once, sizes carried through
    assert(plan.map(r => (r._1, r._2)).sorted.toSeq ==
      mRows.map(r => (r._1, r._2)).sorted.toSeq)
    assert(plan.map(_._3).sum == mRows.map(_._3).sum)
    // every rewrite bin stays under target + its largest member, and
    // has >= 2 files (singletons must degrade to keep)
    val rew = plan.filter(_._5 == "rewrite")
    rew.groupBy(r => (r._1, r._4)).foreach { case (_, fs) =>
      assert(fs.length >= 2)
      assert(fs.map(_._3).sum < target + fs.map(_._3).max)
    }
    // keeps are exactly: oversized files or singleton bins — with this
    // target, only possible singletons
    plan.filter(_._5 == "keep").foreach { r =>
      assert(r._4 == -1L && r._3 < target)
    }
    // oversized files keep: replan with a sub-minimum target
    val tiny = Compaction.compactionPlan(manifest,
        mRows.map(_._3).min).as[(String, String, Long, Long, String)]
      .collect()
    assert(tiny.forall(r => r._5 == "keep" && r._4 == -1L))
    // determinism: the plan is a pure function of the manifest
    val again = Compaction.compactionPlan(manifest, target)
      .as[(String, String, Long, Long, String)].collect()
    assert(plan.sorted.toSeq == again.sorted.toSeq)
  }

  test("zonemap: manifest covers every file; pruned read skips files, same rows") {
    val rows = (0 until 1000).map(i => (i.toLong, i / 10)) // key 0..99
    val df = rows.toDF("id", "key")
    val out = Files.createTempDirectory("graft-zonemap").toString
    df.repartitionByRange(8, col("key")).sortWithinPartitions("key")
      .write.mode("overwrite").option("maxRecordsPerFile", 100L).parquet(out)

    val nFiles = Files.list(Paths.get(out)).iterator().asScala
      .count(_.toString.endsWith(".parquet"))
    val manifest = Compaction.zonemapBuild(spark, out, Seq("key"))
    assert(manifest.count() == nFiles) // one stats row per data file

    val pruned = Compaction.zonemapPrunedRead(spark, manifest, "key",
      lit(10), lit(19))
    // skipping is real: the pruned scan touches strictly fewer files
    assert(pruned.inputFiles.length < nFiles)
    // and invisible in results: re-filtered rows equal the full scan's
    val got = pruned.filter(col("key").between(10, 19))
      .as[(Long, Int)].collect().toSet
    val want = rows.filter(r => r._2 >= 10 && r._2 <= 19).toSet
    assert(got == want)

    // a range outside the data prunes EVERY file: still an empty
    // frame with the data schema, not a zero-path read crash
    val none = Compaction.zonemapPrunedRead(spark, manifest, "key",
      lit(1000), lit(2000))
    assert(none.columns.toSet == Set("id", "key"))
    assert(none.count() == 0)
  }

  test("writeZOrdered: lossless, files internally z-sorted, z column dropped") {
    import graft.functions.Morton
    val rows = (0 until 400).map { i =>
      (i.toLong, i % 20, (i * 7) % 20) // a 20x20 grid
    }
    val df = rows.toDF("id", "x", "y")
    val out = Files.createTempDirectory("graft-zorder").toString
    Compaction.writeZOrdered(df, out, ("x", "y"), maxRecordsPerFile = 64L)

    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("id", "x", "y")) // no _z leaked
    assert(back.as[(Long, Int, Int)].collect().toSet == rows.toSet)

    val files = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
    assert(files.nonEmpty)
    files.foreach { f =>
      val zs = spark.read.parquet(f.toString)
        .select("x", "y").as[(Int, Int)].collect()
        .map { case (x, y) => Morton.interleave(x, y) }.toSeq
      assert(zs == zs.sorted, s"$f not z-sorted")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("writeHashSharded: on-disk layout matches the shardManifest exactly") {
    import graft.operators.TextAnalysisOps
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("n_tokens", size(split(col("text"), " ")))
    val out = Files.createTempDirectory("graft-shards").toString
    Compaction.writeHashSharded(docs, out, "doc_id", 8)

    val manifest = TextAnalysisOps
      .shardManifest(docs, "doc_id", "n_tokens", 8)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (s, n, w, fp) => s -> ((n, fp)) }.toMap

    val shardDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard=")).toSeq
    assert(shardDirs.map(_.getFileName.toString.stripPrefix("shard=").toLong)
      .toSet == manifest.keySet)

    shardDirs.foreach { dir =>
      val shard = dir.getFileName.toString.stripPrefix("shard=").toLong
      val fs = Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(fs.size == 1, s"$dir: expected one file per shard")
      // the file's physical row order IS the manifest's md5 order
      val ids = spark.read.parquet(fs.head.toString)
        .select("doc_id").as[Long].collect().toSeq
      assert(ids == ids.sortBy(id => (md5hex(id.toString), id)),
        s"shard $shard not md5-ordered")
      // count and order-sensitive fingerprint both replay from disk
      val (nDocs, fp) = manifest(shard)
      assert(ids.size.toLong == nDocs)
      val fileFp = ids.zipWithIndex.map { case (id, i) =>
        java.lang.Long.parseLong(md5hex(s"$id:${i + 1}").take(8), 16)
      }.reduce(_ ^ _)
      assert(fileFp == fp, s"shard $shard fingerprint mismatch")
    }
  }
}
