package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VideoCodecSpec extends SparkSpec {
  import spark.implicits._

  private def pix(id: Long)(f: Int, p: Int): (Int, Int, Int) = (
    ((id * 3 + f * 7 + p) % 256).toInt,
    ((id * 5 + f * 11 + p) % 256).toInt,
    ((id * 7 + f * 13 + p) % 256).toInt)

  test("decodeY4m roundtrips encode, frame and plane layout byte-exact") {
    for (w <- Seq(1, 4, 6); h <- Seq(1, 3); nf <- Seq(0, 1, 4)) {
      val bytes = VideoCodec.encodeY4m(w, h, nf, pix(w * 10 + h))
      val clip = VideoCodec.decodeY4m(bytes).get
      assert(clip.w == w && clip.h == h && clip.nFrames == nf)
      for (f <- 0 until nf) {
        val plane = w * h
        var ey = 0L; var eu = 0L; var ev = 0L
        for (p <- 0 until plane) {
          val (y, u, v) = pix(w * 10 + h)(f, p)
          ey += y; eu += u; ev += v
        }
        assert(clip.planeSums(f) == ((ey, eu, ev)), s"${w}x$h f=$f")
      }
    }
  }

  test("decodeY4m walks hand-built bytes with frame parameters and unordered header tags") {
    // header tags in a different order + an interlace tag; one frame
    // carries FRAME-level parameters — both legal Y4M
    val w = 2; val h = 2; val plane = w * h
    val header = "YUV4MPEG2 C444 F30:1 H2 W2 Ip\n"
    val f0 = "FRAME\n" + new String(Array.tabulate(3 * plane)(i =>
      (i + 1).toChar))
    val f1 = "FRAME Xparam\n" + new String(Array.tabulate(3 * plane)(i =>
      (i + 101).toChar))
    val bytes = (header + f0 + f1).getBytes("ISO-8859-1")
    val clip = VideoCodec.decodeY4m(bytes).get
    assert(clip.w == 2 && clip.h == 2 && clip.nFrames == 2)
    // frame 0: Y plane bytes 1..4, U 5..8, V 9..12
    assert(clip.planeSums(0) == ((1L + 2 + 3 + 4, 5L + 6 + 7 + 8,
      9L + 10 + 11 + 12)))
    assert(clip.planeSums(1) == ((101L + 102 + 103 + 104,
      105L + 106 + 107 + 108, 109L + 110 + 111 + 112)))
  }

  test("decodeY4m rejects corrupt payloads in-band, never throws") {
    val good = VideoCodec.encodeY4m(4, 3, 2, pix(5))
    def mut(f: Array[Byte] => Array[Byte]) =
      VideoCodec.decodeY4m(f(good.clone()))
    assert(VideoCodec.decodeY4m(null) == None)
    assert(VideoCodec.decodeY4m("JUNK".getBytes) == None)
    assert(mut(b => b.take(b.length - 5)) == None)  // torn final frame
    assert(mut { b => b(0) = 'X'; b } == None)      // wrong magic
    // a C444-sized body relabeled as 420 desyncs the frame walk
    // (frameBytes halves, the next marker lands mid-pixel-data)
    assert(VideoCodec.decodeY4m(
      new String(good, "ISO-8859-1").replace("C444", "C420")
        .getBytes("ISO-8859-1")) == None)
    // unsupported chroma tag is an in-band miss
    assert(VideoCodec.decodeY4m(
      new String(good, "ISO-8859-1").replace("C444", "C422")
        .getBytes("ISO-8859-1")) == None)
    // absent C tag defaults to 420 per spec — and 4x3 is odd-dim 420,
    // rejected by the even-dims rule before any walk
    assert(VideoCodec.decodeY4m(
      new String(good, "ISO-8859-1").replace(" C444", "")
        .getBytes("ISO-8859-1")) == None)
    // frame marker corrupted
    assert(VideoCodec.decodeY4m(
      new String(good, "ISO-8859-1").replaceFirst("FRAME", "FRAMX")
        .getBytes("ISO-8859-1")) == None)
    // crafted 9-digit dims must fail the Long bounds check, not wrap
    assert(VideoCodec.decodeY4m(
      new String(good, "ISO-8859-1").replace("W4", "W999999999")
        .getBytes("ISO-8859-1")) == None)
    // header never newline-terminated
    assert(VideoCodec.decodeY4m("YUV4MPEG2 W4 H3 C444".getBytes) == None)
  }

  test("decodeY4m handles the C420 family: quarter chroma planes, siting variants, even-dim rule") {
    def lum(f: Int, p: Int) = (7 * f + p) % 256
    def cu(f: Int, q: Int) = (11 * f + 2 * q) % 256
    def cv(f: Int, q: Int) = (13 * f + 3 * q) % 256
    val bytes = VideoCodec.encodeY4m420(6, 4, 3, lum, cu, cv)
    val clip = VideoCodec.decodeY4m(bytes).get
    assert(clip.w == 6 && clip.h == 4 && clip.nFrames == 3 && clip.c420)
    for (f <- 0 until 3) {
      val ey = (0 until 24).map(lum(f, _).toLong).sum
      val eu = (0 until 6).map(cu(f, _).toLong).sum
      val ev = (0 until 6).map(cv(f, _).toLong).sum
      assert(clip.planeSums(f) == ((ey, eu, ev)), s"f=$f")
    }
    // the siting suffixes share the byte layout — all must decode
    for (tag <- Seq("C420", "C420mpeg2", "C420paldv")) {
      val relabeled = VideoCodec.decodeY4m(
        new String(bytes, "ISO-8859-1").replace("C420jpeg", tag)
          .getBytes("ISO-8859-1"))
      assert(relabeled.exists(_.planeSums(0) == clip.planeSums(0)), tag)
    }
    // absent C tag = default 420: same body without the tag decodes
    val untagged = VideoCodec.decodeY4m(
      new String(bytes, "ISO-8859-1").replace(" C420jpeg", "")
        .getBytes("ISO-8859-1"))
    assert(untagged.exists(c => c.c420 && c.nFrames == 3))
    // odd luma dims under 420 are out of scope, in-band
    assert(intercept[IllegalArgumentException] {
      VideoCodec.encodeY4m420(5, 4, 1, lum, cu, cv)
    }.getMessage.contains("even"))
  }

  test("video aHash: sample-identical pairs collide even when the siting tag splits the byte hash") {
    val assets = MultimodalOps.synthY4mPairAssets(
      spark.range(40).toDF("doc_id"), "doc_id")
    val rows = MultimodalOps.videoAHashFingerprint(assets, stride = 2)
      .select(col("asset_id"), md5(col("content")).as("m"),
        col("vhash_bits"))
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    for (gid <- 0L until 40L by 2) {
      val (even, odd) = (rows(gid), rows(gid + 1))
      assert(even._3 == odd._3,
        s"fingerprint split a sample-identical pair gid=$gid")
      assert(even._2 != odd._2,
        s"siting-tag swap failed to split md5 at gid=$gid")
      val k = if ((gid / 8) % 3 == 1) gid - gid % 8 else gid
      val nf = if (k % 7 == 0) 2 else (2 + k % 3).toInt
      val sampled = (nf + 1) / 2
      assert(even._3.length == 64 * sampled, s"bits length gid=$gid")
      assert(even._3.forall(c => c == '0' || c == '1'))
      // brute-force replay of frame 0's 64 bits from the luma formula
      val w = (4 + 2 * (k % 3)).toInt; val h = (2 + 2 * (k % 2)).toInt
      def lum(p: Int): Long =
        if (k % 7 == 0) k % 251
        else (k * 9973 + (2 * (k % 97) + 37) * p) % 256
      val bs = new Array[Long](64); val bn = new Array[Long](64)
      var ts = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val b = (y * 8 / h) * 8 + x * 8 / w
        bs(b) += lum(y * w + x); bn(b) += 1; ts += lum(y * w + x)
      }
      val want = (0 until 64).map(b =>
        if (bs(b) * (w.toLong * h) > ts * bn(b)) '1' else '0').mkString
      assert(even._3.take(64) == want, s"frame-0 bits gid=$gid")
    }
    // coarse blocks: 4 consecutive gids share one clip — natural
    // cross-gid collisions by construction ((gid/8) % 3 == 1 → ids 8..15)
    assert((8L to 15L).map(rows(_)._3).distinct.size == 1,
      "coarse block 8..15 fingerprints diverged")
    // corrupt payload → null fingerprint, in-band
    val torn = MultimodalOps.videoAHashFingerprint(
      assets.withColumn("content", expr("substring(content, 1, 12)")))
      .select(col("vhash_bits")).as[Option[String]].collect()
    assert(torn.forall(_.isEmpty))
  }

  test("frame hashes: trims share exactly the overlap, re-muxes share everything, torn rows in-band") {
    val assets = MultimodalOps.synthY4mTrimAssets(
      spark.range(30).toDF("doc_id"), "doc_id")
    val rows = MultimodalOps.videoFrameHashes(assets)
      .select(col("asset_id"), col("frame_idx"), col("fhash"))
      .as[(Long, Option[Long], Option[String])].collect()
    val byId = rows.groupBy(_._1).map { case (id, rs) =>
      id -> rs.flatMap(r => r._2.zip(r._3)).sortBy(_._1).map(_._2).toSeq
    }
    for (bs <- 0L until 30L by 3) {
      val (m0, m1, m2) = (byId(bs), byId(bs + 1), byId(bs + 2))
      assert(m0.length == 4 && m1.length == 4 && m2.length == 4)
      assert(m0 == m2, s"tag-swap re-mux diverged at bs=$bs")
      // member 1 samples t=2..5: its first two frames are member 0's
      // last two (global-time alignment) — the trim/offset overlap
      assert(m1.take(2) == m0.drop(2), s"trim overlap broke at bs=$bs")
      val q = bs / 3
      if (q % 7 == 0) // flat triplet: every frame the all-zeros hash
        assert((m0 ++ m1).forall(_ == "0" * 64), s"flat bs=$bs")
    }
    // bytes differ across the tag swap even though frames match
    val md5s = assets.select(col("asset_id"), md5(col("content")))
      .as[(Long, String)].collect().toMap
    for (bs <- 0L until 30L by 3)
      assert(md5s(bs) != md5s(bs + 2), s"tag swap not byte-different bs=$bs")
    // corrupt payload → one in-band null-hash row
    val torn = MultimodalOps.videoFrameHashes(
      assets.withColumn("content", expr("substring(content, 1, 12)")))
      .select(col("asset_id"), col("fhash"))
      .as[(Long, Option[String])].collect()
    assert(torn.length == 30 && torn.forall(_._2.isEmpty))
  }

  test("sampleVideoFrames: real frame sampling end-to-end, torn rows in-band") {
    val assets = MultimodalOps.synthY4mAssets(
      spark.range(30).toDF("doc_id"), "doc_id")
    val out = MultimodalOps.sampleVideoFrames(assets, stride = 2)
      .select(col("asset_id"), col("frame_idx"), col("n_frames"),
        col("sum_y"), col("decoded"))
      .as[(Long, Option[Long], Option[Int], Option[Long], Boolean)]
      .collect()
    val byId = out.groupBy(_._1)
    assert(byId.size == 30)
    for (id <- 0L until 30L) {
      val rows = byId(id)
      if (id % 9 == 0) {
        assert(rows.length == 1 && !rows(0)._5 && rows(0)._2.isEmpty,
          s"id=$id")
      } else {
        val w = (4 + id % 3).toInt; val h = (2 + id % 3).toInt
        val nf = (3 + id % 5).toInt
        val want = (0 until nf by 2)
        assert(rows.flatMap(_._2).sorted.toSeq == want.map(_.toLong),
          s"id=$id sampled frames")
        for (r <- rows; f <- r._2) {
          val ey = (0 until w * h).map(p => (id * 3 + f * 7 + p) % 256).sum
          assert(r._4.contains(ey) && r._3.contains(nf), s"id=$id f=$f")
        }
      }
    }
  }
}
