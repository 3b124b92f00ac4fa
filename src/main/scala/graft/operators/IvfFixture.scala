package graft.operators

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

/** Build-once-per-session holder for the persisted ANN indexes the
  * ss7/ss14 lanes search against.
  *
  * An index is an ARTIFACT, not a query: in production it is built once
  * (or incrementally) and searched thousands of times, so a benchmark
  * lane that re-trains k-means and rewrites 2–4 parquet tables inside
  * the timed region reports build+search and drowns the number that
  * matters. This object memoizes the build per (index kind, sf dir)
  * within the JVM: the first caller (Verify's single pass, or Bench's
  * untimed warmup pass) pays the build, every later call — in
  * particular Bench's timed runs — measures search only. Build cost is
  * tracked separately (PerfCompare `ivf_build` lane, PERF.md).
  *
  * Rebuild freshness: memoization is per-JVM, so every new Verify/Bench
  * process rebuilds from the current table state before its first
  * search — the fixture can never serve an index stale relative to the
  * data the same process is reading.
  */
object IvfFixture {

  private val built = new ConcurrentHashMap[String, String]()

  // sanitized path, not hashCode: abs(Int.MinValue) stays negative and
  // two dataset paths can collide on hashCode — a collision would let
  // concurrent suites overwrite each other's index scratch dir
  private def scratch(prefix: String, sfDir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"$prefix-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}").toString

  /** Torn-build guard shared by every persisted-index fixture. The
    * scratch path outlives the JVM, and each new JVM rebuilds with
    * overwrite semantics, so staleness self-heals — but a build killed
    * between its table writes (or a concurrent process mid-rebuild)
    * leaves a dir that READS fine and answers from partial data. The
    * builder deletes the marker before writing and re-creates it after
    * the last table lands; every access checks it, so a torn index
    * fails loudly instead of silently serving partial results.
    */
  private[graft] val MarkerName = "_GRAFT_INDEX_OK"

  private[graft] def buildWithMarker(dir: String)(build: => Unit): String = {
    import java.nio.file.{Files, Paths}
    val marker = Paths.get(dir, MarkerName)
    Files.deleteIfExists(marker)
    build
    Files.write(marker, Array.emptyByteArray)
    dir
  }

  private[graft] def checkMarker(dir: String): String = {
    val marker = java.nio.file.Paths.get(dir, MarkerName)
    require(java.nio.file.Files.exists(marker),
      s"persisted index at $dir has no $MarkerName marker — " +
        "torn build (killed mid-write or concurrent rebuild); " +
        "delete the directory and rebuild")
    dir
  }

  private def kernel: (Column, Column) => Column =
    graft.functions.CosineF32.cosineF32Native(_, _)

  /** Plain IVF index (ss7 parameters: nList=8) over `embeddings`;
    * builds on first call per sf dir, returns the index dir.
    */
  def ivfDir(spark: SparkSession, sfDir: String): String =
    checkMarker(built.computeIfAbsent(s"ivf:$sfDir", _ => {
      val dir = scratch("graft-ivf-q-index", sfDir)
      buildWithMarker(dir) {
        IvfIndex.build(graft.Tables.embeddings(spark, sfDir), dir,
          nList = 8, kernel = kernel)
      }
    }))

  /** IVF-PQ index (ss14 parameters: nList=8, m=2, subDim=32, kPq=4,
    * iters=1) over `embeddings`; builds on first call per sf dir.
    */
  def ivfPqDir(spark: SparkSession, sfDir: String): String =
    checkMarker(built.computeIfAbsent(s"ivfpq:$sfDir", _ => {
      val dir = scratch("graft-ivfpq-q-index", sfDir)
      buildWithMarker(dir) {
        IvfIndex.buildPq(graft.Tables.embeddings(spark, sfDir), dir,
          nList = 8, m = 2, subDim = 32, kPq = 4, iters = 1,
          kernel = kernel)
      }
    }))

  /** Incrementally-maintained IVF index (ss18): built from the
    * STANDING corpus (vec_id % 10 != 0 — so the centroids derive from
    * it), then the batch (vec_id % 10 == 0) is APPENDED against the
    * frozen centroids. Marker-guarded like every persisted fixture;
    * the append happens inside the guarded build, so a torn
    * build+append fails loudly rather than serving the standing rows
    * only.
    */
  def ivfAppendDir(spark: SparkSession, sfDir: String): String =
    checkMarker(built.computeIfAbsent(s"ivfapp:$sfDir", _ => {
      val dir = scratch("graft-ivf-append-index", sfDir)
      buildWithMarker(dir) {
        val emb = graft.Tables.embeddings(spark, sfDir)
        IvfIndex.build(emb.filter(col("vec_id") % 10 =!= 0), dir,
          nList = 8, kernel = kernel)
        IvfIndex.append(emb.filter(col("vec_id") % 10 === 0), dir,
          kernel = kernel)
      }
    }))

  /** Incrementally-maintained IVF-PQ index (ss19): built from the
    * standing corpus (centroids AND codebooks frozen there), batch
    * appended — cells and codes both.
    */
  def ivfPqAppendDir(spark: SparkSession, sfDir: String): String =
    checkMarker(built.computeIfAbsent(s"ivfpqapp:$sfDir", _ => {
      val dir = scratch("graft-ivfpq-append-index", sfDir)
      buildWithMarker(dir) {
        val emb = graft.Tables.embeddings(spark, sfDir)
        IvfIndex.buildPq(emb.filter(col("vec_id") % 10 =!= 0), dir,
          nList = 8, m = 2, subDim = 32, kPq = 4, iters = 1,
          kernel = kernel)
        IvfIndex.appendPq(emb.filter(col("vec_id") % 10 === 0), dir,
          m = 2, subDim = 32, kernel = kernel)
      }
    }))

  /** Tombstoned IVF index (ss22): ss7's full-corpus build, then every
    * vec_id % 17 == 0 logically DELETED — the tombstone set stays in
    * the artifact and search masks it. Deleted ids can still appear as
    * queries (deletion removes a vector from the searchable corpus,
    * not from the world).
    */
  def ivfDeleteDir(spark: SparkSession, sfDir: String): String =
    checkMarker(built.computeIfAbsent(s"ivfdel:$sfDir", _ => {
      val dir = scratch("graft-ivf-delete-index", sfDir)
      buildWithMarker(dir) {
        val emb = graft.Tables.embeddings(spark, sfDir)
        IvfIndex.build(emb, dir, nList = 8, kernel = kernel)
        IvfIndex.delete(emb.filter(col("vec_id") % 17 === 0), dir)
      }
    }))

  /** ss22's search half: ss7's query set against the tombstoned index. */
  def searchIvfDelete(spark: SparkSession, sfDir: String) = {
    val dir = ivfDeleteDir(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfIndex.search(spark, dir, emb.filter(col("vec_id") < 10),
      5, nProbe = 3, kernel = kernel, immutable = true)
  }

  /** ss19's search half: ss14's query set against the appended index. */
  def searchIvfPqAppend(spark: SparkSession, sfDir: String) = {
    val dir = ivfPqAppendDir(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfIndex.searchPq(spark, dir, emb.filter(col("vec_id") < 10),
      k = 5, nProbe = 3, m = 2, subDim = 32, kernel = kernel,
      immutable = true)
  }

  /** ss18's search half: ss7's query set against the appended index. */
  def searchIvfAppend(spark: SparkSession, sfDir: String) = {
    val dir = ivfAppendDir(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfIndex.search(spark, dir, emb.filter(col("vec_id") < 10),
      5, nProbe = 3, kernel = kernel, immutable = true)
  }

  /** ss7's search half against the memoized index. */
  def searchIvf(spark: SparkSession, sfDir: String) = {
    val dir = ivfDir(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfIndex.search(spark, dir, emb.filter(col("vec_id") < 10),
      5, nProbe = 3, kernel = kernel, immutable = true)
  }

  /** ss14's search half against the memoized index. */
  def searchIvfPq(spark: SparkSession, sfDir: String) = {
    val dir = ivfPqDir(spark, sfDir)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfIndex.searchPq(spark, dir, emb.filter(col("vec_id") < 10),
      k = 5, nProbe = 3, m = 2, subDim = 32, kernel = kernel,
      immutable = true)
  }
}

/** Build-once-per-session holder for the dd10 lane's persisted LSH band
  * index over the STANDING corpus (`documents` where source != src0) —
  * the same artifact-vs-query reasoning as [[IvfFixture]]: production
  * incremental dedup banks the corpus index once and ingests many
  * batches against it, so the timed lane should measure the ingest
  * (batch banding + bloom-reduced join), not a corpus re-index per
  * invocation. Per-JVM memoization keeps the index fresh relative to
  * the data each process reads; build cost stays visible in the
  * ScaleSmoke/PerfCompare records.
  */
object BandIndexFixture {

  private val built = new ConcurrentHashMap[String, String]()

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"band:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-band-index-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        DedupOps.bandIndexBuild(
          graft.Tables.documents(spark, sfDir)
            .filter(col("source") =!= "src0"),
          d, "doc_id", "text", shingleK = 3, numPerm = 16, bands = 4)
      }
    }))
}

/** Build-once-per-session holder for dd21's persisted exact-substring
  * gram bank over the STANDING corpus (`documents` where source !=
  * src0, with the 12-token boilerplate planted on id % 3 = 0 so
  * banked-gram hits exist) — [[BandIndexFixture]]'s artifact
  * reasoning on the dd20 axis: production banks the corpus' first-
  * occurrence grams once and ingests many batches against it. The
  * plant phrase is shared verbatim with the dd21 lane and oracle.
  */
object SubstrBankFixture {

  private val built = new ConcurrentHashMap[String, String]()

  /** The standing-corpus boilerplate the lane's batch re-encounters. */
  val Boilerplate =
    "the quick brown fox jumps over the lazy dog again and again"

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"substr:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-substr-bank-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        import org.apache.spark.sql.functions.{col, concat, lit, when}
        val standing = graft.Tables.documents(spark, sfDir)
          .filter(col("source") =!= "src0")
          .select(col("doc_id"), concat(col("text"),
            when(col("doc_id") % 3 === 0, lit(" " + Boilerplate))
              .otherwise(lit(""))).as("text"))
        DedupOps.substrBankBuild(standing, d, "doc_id", "text",
          minTokens = 6)
      }
    }))
}

/** Build-once-per-session holder for mm21's persisted frame-hash index
  * — [[BandIndexFixture]]'s reasoning on the media axis, with the
  * APPEND path inside the gated artifact: the standing corpus is the
  * trim-asset clips of doc_id % 5 ∈ {1, 2, 3} built via
  * [[MultimodalOps.frameHashIndexBuild]], then doc_id % 5 = 4 arrives
  * as a later ingest through [[MultimodalOps.frameHashIndexAppend]].
  * The lane queries the % 5 = 0 batch against the combined index, so
  * the oracle's full-corpus replay hash-gates BOTH write paths: a row
  * the append dropped, double-wrote, or mis-bucketed would shift a
  * bucket cap or a vote count.
  */
object FrameIndexFixture {

  private val built = new ConcurrentHashMap[String, String]()

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"frame:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-frame-index-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        val assets = MultimodalOps.synthY4mTrimAssets(
          graft.Tables.documents(spark, sfDir), "doc_id")
        MultimodalOps.frameHashIndexBuild(
          assets.filter(col("asset_id") % 5 >= 1 &&
            col("asset_id") % 5 <= 3), d)
        MultimodalOps.frameHashIndexAppend(
          assets.filter(col("asset_id") % 5 === 4), d)
      }
    }))
}

/** [[FrameIndexFixture]] plus a standing TAKEDOWN (mm28): the same
  * build(%5 ∈ 1..3) + append(%5 = 4) frame-hash index, then every
  * banked asset with id % 7 == 1 logically deleted via
  * [[MultimodalOps.postingIndexDelete]] — the merge-on-read tombstone
  * state an incremental probe must mask (the lane hash-gates
  * delete ≡ fresh-rebuild-without-the-deleted). Separate dir from
  * mm21's fixture: that lane gates the UNdeleted index.
  */
object FrameDeleteIndexFixture {

  private val built = new ConcurrentHashMap[String, String]()

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"framedel:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-framedel-index-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        val assets = MultimodalOps.synthY4mTrimAssets(
          graft.Tables.documents(spark, sfDir), "doc_id")
        MultimodalOps.frameHashIndexBuild(
          assets.filter(col("asset_id") % 5 >= 1 &&
            col("asset_id") % 5 <= 3), d)
        MultimodalOps.frameHashIndexAppend(
          assets.filter(col("asset_id") % 5 === 4), d)
        MultimodalOps.postingIndexDelete(
          graft.Tables.documents(spark, sfDir)
            .select(col("doc_id").as("asset_id"))
            .filter(col("asset_id") % 7 === 1 &&
              col("asset_id") % 5 =!= 0), d, "asset_id")
      }
    }))
}

/** [[FrameIndexFixture]]'s discipline on the audio axis (mm22): the
  * standing corpus' segment-key postings banked via the GENERIC
  * [[MultimodalOps.postingIndexBuild]], the %5 = 4 fifth appended —
  * one posting-index implementation, two modalities, both append
  * paths inside gated artifacts.
  */
object SegmentIndexFixture {

  private val built = new ConcurrentHashMap[String, String]()

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"segment:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-segment-index-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        val keys = MultimodalOps.distinctSegmentKeys(
          MultimodalOps.synthWavTrimAssets(
            graft.Tables.documents(spark, sfDir), "doc_id"))
        MultimodalOps.postingIndexBuild(
          keys.filter(col("asset_id") % 5 >= 1 &&
            col("asset_id") % 5 <= 3), d, "asset_id", "skey")
        MultimodalOps.postingIndexAppend(
          keys.filter(col("asset_id") % 5 === 4), d, "asset_id", "skey")
      }
    }))
}

/** [[FrameIndexFixture]]'s discipline on the SPATIAL axis (sp7): the
  * standing customer point corpus celled and banked via
  * [[SpatialOps.pointIndexBuild]] (cell = 25000, the sp1 radius), the
  * %5 = 4 fifth appended — the geocoded-address base a production
  * ingest would probe new points against.
  */
object PointIndexFixture {

  private val built = new ConcurrentHashMap[String, String]()

  /** sp1's md5-microdegree coordinate recipe, shared with the sp7
    * lane's batch side. */
  def withCoords(cu: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    cu.select(col("c_custkey"),
      (conv(substring(md5(col("c_custkey").cast("string")), 1, 7), 16, 10)
        .cast("long") % 1000000L).as("cx"),
      (conv(substring(md5(col("c_custkey").cast("string")), 9, 7), 16, 10)
        .cast("long") % 1000000L).as("cy"))
  }

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"point:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-point-index-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        val pts = withCoords(graft.Tables.customer(spark, sfDir))
        SpatialOps.pointIndexBuild(
          pts.filter(col("c_custkey") % 5 >= 1 && col("c_custkey") % 5 <= 3),
          d, "c_custkey", "cx", "cy", cell = 25000L)
        SpatialOps.pointIndexAppend(
          pts.filter(col("c_custkey") % 5 === 4), d, "c_custkey", "cx", "cy")
      }
    }))
}

/** [[FrameIndexFixture]]'s discipline on the BINARY axis (mm23): the
  * corpus' CDC chunk-key postings banked and appended through the
  * generic seam — the third modality on one implementation.
  */
object ChunkIndexFixture {

  private val built = new ConcurrentHashMap[String, String]()

  def dir(spark: SparkSession, sfDir: String): String =
    IvfFixture.checkMarker(built.computeIfAbsent(s"chunk:$sfDir", _ => {
      val d = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-chunk-index-${sfDir.replaceAll("[^A-Za-z0-9._-]", "_")}")
        .toString
      IvfFixture.buildWithMarker(d) {
        val keys = MultimodalOps.distinctChunkKeys(
          MultimodalOps.synthBinaryTrimAssets(
            graft.Tables.documents(spark, sfDir), "doc_id"))
        MultimodalOps.postingIndexBuild(
          keys.filter(col("asset_id") % 5 >= 1 &&
            col("asset_id") % 5 <= 3), d, "asset_id", "chunk_key")
        MultimodalOps.postingIndexAppend(
          keys.filter(col("asset_id") % 5 === 4), d, "asset_id",
          "chunk_key")
      }
    }))
}
