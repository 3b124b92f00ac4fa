package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AudioCodecSpec extends SparkSpec {
  import spark.implicits._

  private def samples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(k => ((id * 31 + k * 17) % 65536 - 32768).toShort)

  test("decodeWavPcm16 agrees sample-exactly with javax.sound on the same bytes") {
    for (id <- 0L to 5L; n <- Seq(1, 7, 50)) {
      val s = samples(id, n)
      val bytes = AudioCodec.encodeWavPcm16(8000 + id.toInt * 100, s)
      val ours = AudioCodec.decodeWavPcm16(bytes).get
      assert(ours.sampleRate == 8000 + id * 100)
      assert(ours.samples.toSeq == s.toSeq)
      // independent JDK decoder on the identical bytes
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == 8000 + id * 100 &&
        fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16)
      val raw = ais.readAllBytes()
      assert(raw.length == 2 * n)
      val ref = Array.tabulate(n) { k =>
        (((raw(2 * k) & 0xff) | ((raw(2 * k + 1) & 0xff) << 8)).toShort)
      }
      assert(ref.toSeq == s.toSeq, s"javax.sound disagrees at id=$id n=$n")
    }
  }

  test("decodeWavPcm16 walks extra RIFF chunks, honoring odd-size padding") {
    val s = samples(3L, 9)
    val base = AudioCodec.encodeWavPcm16(11025, s)
    // splice a 5-byte LIST chunk (odd → 1 pad byte) between fmt and data
    val extra = new Array[Byte](8 + 5 + 1)
    extra(0) = 'L'; extra(1) = 'I'; extra(2) = 'S'; extra(3) = 'T'
    extra(4) = 5 // little-endian size 5
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // RIFF size field is not re-fixed — the walker must not depend on it
    val got = AudioCodec.decodeWavPcm16(spliced)
    assert(got.isDefined, "chunk walk failed on an extra LIST chunk")
    assert(got.get.samples.toSeq == s.toSeq && got.get.sampleRate == 11025)
  }

  test("decodeWavPcm16 rejects corrupt payloads in-band, never throws") {
    val good = AudioCodec.encodeWavPcm16(8000, samples(1L, 20))
    def mut(f: Array[Byte] => Array[Byte]): Option[AudioCodec.DecodedAudio] =
      AudioCodec.decodeWavPcm16(f(good.clone()))
    assert(AudioCodec.decodeWavPcm16(null) == None)
    assert(AudioCodec.decodeWavPcm16(Array[Byte](1, 2, 3)) == None)
    assert(mut(b => b.take(20)) == None)          // truncated body
    assert(mut { b => b(0) = 'X'; b } == None)    // wrong magic
    assert(mut { b => b(22) = 2; b } == None)     // stereo
    assert(mut { b => b(34) = 8; b } == None)     // 8-bit
    assert(mut { b => b(20) = 3; b } == None)     // non-PCM format
    // crafted u32 chunk size 0xFFFFFFFF must fail the Long bounds
    // check, not wrap into a negative offset
    assert(mut { b =>
      b(40) = -1; b(41) = -1; b(42) = -1; b(43) = -1; b
    } == None)
    // odd data size is not valid 16-bit PCM
    assert(mut { b => b(40) = 39; b } == None)
    // zero samples is a VALID (empty) clip, not corruption
    assert(AudioCodec.decodeWavPcm16(
      AudioCodec.encodeWavPcm16(8000, Array.empty[Short]))
      .exists(_.samples.isEmpty))
  }

  test("energy fingerprint: sample-identical pairs collide even when a spliced chunk splits the byte hash") {
    val assets = MultimodalOps.synthWavPairAssets(
      spark.range(20).toDF("doc_id"), "doc_id")
    val rows = MultimodalOps.audioEnergyFingerprint(assets)
      .select(col("asset_id"), md5(col("content")).as("m"),
        col("energy_bits"))
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    for (gid <- 0L until 20L by 2) {
      val (even, odd) = (rows(gid), rows(gid + 1))
      assert(even._3 == odd._3,
        s"fingerprint split a sample-identical pair gid=$gid")
      assert(even._2 != odd._2,
        s"spliced LIST chunk failed to split md5 at gid=$gid")
      val n = (400 + gid % 32).toInt
      assert(even._3.length == n / 8 - 1, s"bits length gid=$gid")
      assert(even._3.forall(c => c == '0' || c == '1'))
    }
    // corrupt payload → null fingerprint, in-band
    val torn = MultimodalOps.audioEnergyFingerprint(
      assets.withColumn("content", expr("substring(content, 1, 20)")))
      .select(col("energy_bits")).as[Option[String]].collect()
    assert(torn.forall(_.isEmpty))
  }

  test("synthWavPairAssets fixtures declare a spec-valid RIFF size after the splice") {
    val payloads = MultimodalOps.synthWavPairAssets(
      spark.range(10).toDF("doc_id"), "doc_id")
      .select(col("asset_id"), col("content"))
      .as[(Long, Array[Byte])].collect()
    for ((id, b) <- payloads) {
      val declared = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
      assert(declared == b.length - 8,
        s"RIFF size field off by ${b.length - 8 - declared} at id=$id")
    }
  }

  test("segment keys: offset re-cuts share exactly the aligned segments, re-muxes share everything") {
    val assets = MultimodalOps.synthWavTrimAssets(
      spark.range(30).toDF("doc_id"), "doc_id")
    val rows = MultimodalOps.audioSegmentKeys(assets)
      .select(col("asset_id"), col("seg_idx"), col("seg_key"))
      .as[(Long, Option[Long], Option[String])].collect()
    val byId = rows.groupBy(_._1).map { case (id, rs) =>
      id -> rs.flatMap(r => r._2.zip(r._3)).sortBy(_._1).map(_._2).toSeq
    }
    for (bs <- 0L until 30L by 3) {
      val (m0, m1, m2) = (byId(bs), byId(bs + 1), byId(bs + 2))
      assert(m0.length == 3 && m1.length == 3 && m2.length == 3)
      assert(m0 == m2, s"container-noise re-mux diverged at bs=$bs")
      // member 1 starts one segment (8 windows) later: its first two
      // segments are member 0's last two
      assert(m1.take(2) == m0.drop(1), s"segment overlap broke at bs=$bs")
      // exact-integer keys: every window energy replays from the formula
      val q = bs / 3
      val qk = if ((q / 2) % 5 == 1) q - q % 2 else q
      if (qk % 7 == 0)
        assert(m0.forall(_ == Seq.fill(8)("0").mkString("|")),
          s"flat (silence) keys wrong at bs=$bs")
      else {
        val want = (0 until 8).map { w =>
          (0 until 8).map { j =>
            val s = (qk * 9973 + (w * 8 + j) * 5741) % 65536 - 32768
            s.toLong * s
          }.sum
        }.mkString("|")
        assert(m0.head == want, s"segment-0 energies wrong at bs=$bs")
      }
    }
    // bytes differ across the splice even though samples match
    val md5s = assets.select(col("asset_id"), md5(col("content")))
      .as[(Long, String)].collect().toMap
    for (bs <- 0L until 30L by 3)
      assert(md5s(bs) != md5s(bs + 2), s"splice not byte-different bs=$bs")
    // corrupt payload → one in-band null-key row
    val torn = MultimodalOps.audioSegmentKeys(
      assets.withColumn("content", expr("substring(content, 1, 20)")))
      .select(col("asset_id"), col("seg_key"))
      .as[(Long, Option[String])].collect()
    assert(torn.length == 30 && torn.forall(_._2.isEmpty))
  }

  test("decodeAudioFeatures: real decode end-to-end, corrupt rows in-band") {
    val assets = MultimodalOps.synthWavAssets(
      spark.range(40).toDF("doc_id"), "doc_id")
    val out = MultimodalOps.decodeAudioFeatures(assets)
      .select(col("asset_id"), col("n_samples"), col("sample_rate"),
        col("sum_abs"), col("max_abs"), col("decoded"))
      .as[(Long, Option[Long], Option[Int], Option[Long], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size == 40)
    for (id <- 0L until 40L) {
      val r = out(id)
      if (id % 11 == 0) {
        assert(!r._6 && r._2.isEmpty && r._4.isEmpty, s"id=$id")
      } else {
        val n = (50 + id % 32).toInt
        val s = samples(id, n)
        assert(r._6 && r._2.contains(n.toLong), s"id=$id")
        assert(r._3.contains((8000 + (id % 3) * 4000).toInt), s"id=$id")
        assert(r._4.contains(s.map(v => math.abs(v.toLong)).sum), s"id=$id")
        assert(r._5.contains(s.map(v => math.abs(v.toLong)).max), s"id=$id")
      }
    }
  }
}
