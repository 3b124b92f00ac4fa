package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfIvfSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: latest right row at or before each left row, per key") {
    val trades = Seq(
      (1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
      .toDF("trade_id", "acct", "t")
    val quotes = Seq(
      (101L, 10L, 90L), (102L, 10L, 100L), (103L, 10L, 200L),
      (104L, 30L, 10L))
      .toDF("quote_id", "acct", "t")
    val out = EventOps.asOfJoin(trades, quotes, "acct", "t",
        Seq("quote_id"))
      .select(col("trade_id"), col("_match.quote_id").as("qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(102L)) // inclusive: quote at t=100 matches
    assert(out(2L).contains(103L))
    assert(out(3L).isEmpty)        // no quotes for acct 20
  }

  test("ivfTopK: sane shape and recall vs brute force") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = SimilarityOps.ivfTopK(emb, queries, 5, nList = 8, nProbe = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(approx.size == 50) // 10 queries x top-5
    val recall = (exact intersect approx).size.toDouble / exact.size
    // random vectors cluster weakly; 3/8 probes must still recover a
    // meaningful share, and perfect recall would mean we searched it all
    assert(recall >= 0.2, s"recall $recall")
    // every approx neighbor must score correctly (spot-check determinism)
    val again = SimilarityOps.ivfTopK(emb, queries, 5, nList = 8, nProbe = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(again == approx)
  }

  test("ivfTopK: a zero-norm corpus vector never outranks real neighbors (NaN guard)") {
    val rows = (1L to 40L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 6f))
    } :+ (99L, Array.fill(8)(0f)) // zero vector → cosine NaN
    val emb = rows.toDF("vec_id", "embedding")
    val out = SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") <= 3),
      3, nList = 4, nProbe = 4)
    val neighbors = out.select("neighbor_id").as[Long].collect()
    assert(!neighbors.contains(99L),
      "zero vector ranked as a neighbor via NaN ordering")
    assert(out.count() == 9) // 3 queries x top-3, all real
  }

  test("IvfIndex: persisted build+search equals transient ivfTopK; scan prunes to probed cells") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(emb, dir, nList = 8)
    val indexed = IvfIndex.search(spark, dir, queries, 5, nProbe = 3)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    val transient_ = SimilarityOps.ivfTopK(emb, queries, 5,
      nList = 8, nProbe = 3)
      .select("query_id", "neighbor_id", "sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(indexed == transient_ && indexed.nonEmpty)
    // the probed-cells scan prunes at the partition level: its scan
    // carries PartitionFilters (file listing skips unprobed cells)
    val scan = IvfIndex.probedCellScan(spark, dir, Seq(1, 3))
    val leaves = scan.queryExecution.executedPlan.collectLeaves()
    val fs = leaves.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fs.isDefined, "expected a FileSourceScanExec leaf")
    assert(fs.get.partitionFilters.exists(_.references.exists(
      _.name == "_cell")), "expected a _cell partition filter")
    assert(scan.select("_cell").distinct().as[Int].collect().toSet
      .subsetOf(Set(1, 3)))
  }

  test("IvfIndex.append: batch joins the cell layout under frozen centroids; equals build-with-frozen-centroids") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val standing = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    IvfIndex.build(standing, dir, nList = 8)
    IvfIndex.append(batch, dir)
    // every row landed in the cell layout exactly once
    val cells = spark.read.parquet(s"$dir/cells")
    assert(cells.count() == emb.count())
    assert(cells.select("vec_id").distinct().count() == emb.count())
    // appended rows are assigned to the SAME cells a from-scratch
    // assignment against the persisted (standing-derived) centroids
    // gives — the frozen-centroid contract
    val cen = spark.read.parquet(s"$dir/centroids")
    val expected = SimilarityOps.ivfAssign(batch, cen, "vec_id",
        "embedding", SimilarityOps.cosine)
      .select(col("vec_id"), col("_cell"))
      .as[(Long, Int)].collect().toMap
    val appended = cells.join(batch.select("vec_id"), Seq("vec_id"),
        "left_semi")
      .select(col("vec_id"), col("_cell"))
      .as[(Long, Int)].collect().toMap
    assert(appended == expected)
    // search over the maintained index can return appended neighbors
    val out = IvfIndex.search(spark, dir, emb.filter(col("vec_id") < 10),
      5, nProbe = 3)
      .select("neighbor_id").as[Long].collect()
    assert(out.exists(_ % 10 == 0), "no appended row ever surfaced")
  }

  test("IvfIndex.appendPq: codes layout total; batch encoded by the frozen codebooks") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val standing = emb.filter(col("vec_id") % 10 =!= 0)
    val batch = emb.filter(col("vec_id") % 10 === 0)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-app").toString
    IvfIndex.buildPq(standing, dir, nList = 8, m = 2, subDim = 32,
      kPq = 4, iters = 1)
    IvfIndex.appendPq(batch, dir, m = 2, subDim = 32)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == emb.count())
    assert(codes.select("vec_id").distinct().count() == emb.count())
    // the appended codes equal a fresh encode of the batch against the
    // persisted (standing-trained) codebooks — the frozen-quantizer
    // contract
    val cb = spark.read.parquet(s"$dir/codebooks")
    val expected = (0 until 2).map { j =>
      val sub = batch.select(col("vec_id"),
        slice(col("embedding"), j * 32 + 1, 32).as("embedding"))
      val cbj = cb.filter(col("subspace") === j)
        .select(col("cluster").as("_cell"), col("_cv").as("_cvec"))
      SimilarityOps.ivfAssign(sub, cbj, "vec_id", "embedding",
          SimilarityOps.cosine)
        .select(col("vec_id"), col("_cell").as(s"c$j"))
    }.reduce((a, b) => a.join(b, Seq("vec_id")))
      .as[(Long, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3)).toMap
    val got = codes.join(batch.select("vec_id"), Seq("vec_id"),
        "left_semi")
      .select(col("vec_id"), col("pq_code"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(got == expected)
  }

  test("IvfIndex.buildPq/searchPq: candidates stay in probed cells, code scan prunes, replay exact") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    IvfIndex.buildPq(emb, dir, nList = 8, m = 2, subDim = 32, kPq = 4,
      iters = 1)
    val out = IvfIndex.searchPq(spark, dir, queries, k = 5, nProbe = 3,
      m = 2, subDim = 32)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(out.nonEmpty && out.groupBy(_._1).forall(_._2.length <= 5))
    // deterministic replay — byte-identical second run
    val again = IvfIndex.searchPq(spark, dir, queries, k = 5, nProbe = 3,
      m = 2, subDim = 32)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(out.toSeq == again.toSeq)
    // every neighbor sits in one of its query's probed cells — the
    // pruning is semantic, not just an IO optimization
    val cellOf = spark.read.parquet(s"$dir/cells")
      .select(col("vec_id").as("_id"), col("_cell"))
      .as[(Long, Int)].collect().toMap
    val centroids = spark.read.parquet(s"$dir/centroids")
    val probed = SimilarityOps.ivfProbe(queries, centroids, 3,
      "vec_id", "embedding", SimilarityOps.cosine)
      .select("query_id", "_cell").as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (q, n, _, _) =>
      assert(probed(q).contains(cellOf(n)),
        s"neighbor $n of query $q outside its probed cells")
    }
    // the code scan partition-prunes exactly like the cell scan
    val scan = IvfIndex.probedCodeScan(spark, dir, Seq(0, 2))
    val fs = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(fs.isDefined, "expected a FileSourceScanExec leaf")
    assert(fs.get.partitionFilters.exists(_.references.exists(
      _.name == "_cell")), "expected a _cell partition filter")
    // ADC ranking degrades gracefully: overlap with the exact in-cell
    // ranking (ss7's search) is nonzero — codes carry real signal
    val exact = IvfIndex.search(spark, dir, queries, 5, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adc = out.map(r => (r._1, r._2)).toSet
    assert((exact intersect adc).nonEmpty)
  }

  test("approx_count_distinct within 5% of exact on documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val (approx, exact) = docs
      .agg(approx_count_distinct(col("text")).as("a"),
        countDistinct(col("text")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("Download: dead-letters failed fetches, keeps good ones") {
    import graft.model.DirectoryMeta
    import graft.sources.Download
    val dir = java.nio.file.Files
      .createTempDirectory("graft-download").toString
    val manifest = Seq(
      DirectoryMeta("good-1", 1850, 1850, 1, 2, 2),
      DirectoryMeta("bad-2", 1851, 1851, 1, 2, 2))
    val results = Download.downloadAll(dir, manifest, {
      case "good-1" => Array[Byte](1, 2, 3)
      case u => throw new RuntimeException(s"404 for $u")
    }).sortBy(_.uuid)
    assert(results.map(r => (r.uuid, r.ok)) ==
      Seq(("bad-2", false), ("good-1", true)))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "good-1.tar.gz")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "bad-2.xml"))) // dead-letter marker
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "bad-2.tar.gz")))
  }

  test("Download: retry policy recovers transients, dead-letters only after exhaustion") {
    import graft.model.DirectoryMeta
    import graft.sources.Download
    val dir = java.nio.file.Files
      .createTempDirectory("graft-download-retry").toString
    val manifest = Seq(
      DirectoryMeta("flaky-1", 1850, 1850, 1, 2, 2),
      DirectoryMeta("dead-2", 1851, 1851, 1, 2, 2))
    val calls = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val slept = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val results = Download.downloadAll(dir, manifest, { u =>
      val n = calls.merge(u, 1, (a, b) => a + b)
      // flaky-1 succeeds on its 3rd try; dead-2 never does
      if (u == "flaky-1" && n >= 3) Array[Byte](7)
      else throw new RuntimeException(s"503 for $u")
    }, retry = Download.RetryPolicy(maxAttempts = 3, baseDelayMs = 100L),
      sleep = d => { slept.add(d); () }).sortBy(_.uuid)
    assert(results.map(r => (r.uuid, r.ok, r.attempts)) ==
      Seq(("dead-2", false, 3), ("flaky-1", true, 3)))
    // deterministic schedule: 100ms then 200ms before attempts 2 and 3
    assert(slept.contains(100L) && slept.contains(200L))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "flaky-1.tar.gz")))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "dead-2.xml")))
  }

  test("ivf delete: tombstones mask load-bearingly; vacuum is result-identical and reclaims") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ivf-del-spec").toString
    val kernel: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      graft.functions.CosineF32.cosineF32Native(_, _)
    IvfIndex.build(emb, dir, nList = 8, kernel = kernel)
    val queries = emb.filter(col("vec_id") < 10)
    def results() = IvfIndex.search(spark, dir, queries, 5, nProbe = 3,
        kernel = kernel)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val before = results()
    // the delete must be LOAD-BEARING: some %17 id ranks as a
    // neighbor pre-delete, else masking is vacuously green
    assert(before.exists(_._2 % 17 == 0),
      "no tombstone-target neighbor pre-delete — fixture vacuous")
    IvfIndex.delete(emb.filter(col("vec_id") % 17 === 0), dir)
    val masked = results()
    assert(masked != before, "delete changed nothing")
    assert(masked.forall(_._2 % 17 != 0), "a deleted id surfaced")
    // deleted ids remain valid queries
    assert(masked.exists(_._1 % 17 == 0), "deleted query ids vanished")
    // vacuum: same results, tombstones gone, cells physically smaller
    val cellsBefore = spark.read.parquet(s"$dir/cells").count()
    IvfIndex.vacuum(spark, dir)
    assert(results() == masked, "vacuum changed search results")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tombstones")), "tombstones survived")
    val cellsAfter = spark.read.parquet(s"$dir/cells").count()
    assert(cellsAfter < cellsBefore,
      s"vacuum reclaimed nothing: $cellsBefore -> $cellsAfter")
    // idempotent when no tombstones remain
    IvfIndex.vacuum(spark, dir)
    assert(results() == masked)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
