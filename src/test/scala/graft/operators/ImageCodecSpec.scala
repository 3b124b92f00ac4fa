package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageCodecSpec extends SparkSpec {
  import spark.implicits._

  private def pix(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + 3 * x + 5 * y) % 256).toInt,
    ((id * 11 + x + 2 * y) % 256).toInt,
    ((id * 13 + 2 * x + y) % 256).toInt)

  test("decodeBmp24 agrees pixel-exactly with ImageIO on the same bytes") {
    // widths chosen to hit every row-padding remainder (w*3 % 4 =
    // 0,1,2,3) — the classic BMP decoder bug surface
    for (w <- 4 to 8; h <- Seq(1, 3, 5)) {
      val bytes = ImageCodec.encodeBmp24(w, h, pix(w * 100 + h))
      val ours = ImageCodec.decodeBmp24(bytes).get
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our ${w}x$h BMP")
      assert(ours.w == ref.getWidth && ours.h == ref.getHeight)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = ref.getRGB(x, y)
        val i = (y * w + x) * 3
        assert((ours.rgb(i) & 0xff) == ((argb >> 16) & 0xff) &&
          (ours.rgb(i + 1) & 0xff) == ((argb >> 8) & 0xff) &&
          (ours.rgb(i + 2) & 0xff) == (argb & 0xff),
          s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("decodeBmp24 handles top-down (negative height) storage") {
    val bytes = ImageCodec.encodeBmp24(5, 3, pix(9))
    // flip the stored height sign AND re-order rows to top-down: the
    // decoded image must be identical
    val neg = bytes.clone()
    val h = 3; val rowBytes = (5 * 3 + 3) & ~3
    val hv = -h
    neg(22) = (hv & 0xff).toByte; neg(23) = ((hv >> 8) & 0xff).toByte
    neg(24) = ((hv >> 16) & 0xff).toByte; neg(25) = ((hv >> 24) & 0xff).toByte
    for (y <- 0 until h)
      System.arraycopy(bytes, 54 + (h - 1 - y) * rowBytes,
        neg, 54 + y * rowBytes, rowBytes)
    val a = ImageCodec.decodeBmp24(bytes).get
    val b = ImageCodec.decodeBmp24(neg).get
    assert(a.w == b.w && a.h == b.h && a.rgb.toSeq == b.rgb.toSeq)
  }

  test("decodeBmp24 rejects corrupt payloads in-band, never throws") {
    val good = ImageCodec.encodeBmp24(4, 4, pix(1))
    assert(ImageCodec.decodeBmp24(null).isEmpty)
    assert(ImageCodec.decodeBmp24(Array[Byte]()).isEmpty)
    assert(ImageCodec.decodeBmp24("not a bmp".getBytes).isEmpty)
    assert(ImageCodec.decodeBmp24(good.take(20)).isEmpty)  // truncated body
    assert(ImageCodec.decodeBmp24(good.take(53)).isEmpty)  // truncated header
    val wrongBpp = good.clone(); wrongBpp(28) = 8
    assert(ImageCodec.decodeBmp24(wrongBpp).isEmpty)
    val compressed = good.clone(); compressed(30) = 1 // BI_RLE8
    assert(ImageCodec.decodeBmp24(compressed).isEmpty)
    assert(ImageCodec.decodeBmp24(good).isDefined)
  }

  test("decodeImageFeatures: real decode end-to-end, corrupt rows in-band") {
    val ids = spark.range(30).select(col("id").as("doc_id"))
    val out = MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthBmpAssets(ids, "doc_id"))
      .select("asset_id", "img_w", "img_h", "sum_r", "sum_g", "sum_b",
        "decoded")
      .as[(Long, Option[Int], Option[Int], Option[Long], Option[Long],
        Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    for (id <- 0L until 30L) {
      val r = out(id)
      if (id % 13 == 0) assert(!r._7 && r._2.isEmpty && r._4.isEmpty)
      else {
        val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
        val px = for (y <- 0 until h; x <- 0 until w) yield pix(id)(x, y)
        assert(r._7 && r._2.contains(w) && r._3.contains(h))
        assert(r._4.contains(px.map(_._1.toLong).sum) &&
          r._5.contains(px.map(_._2.toLong).sum) &&
          r._6.contains(px.map(_._3.toLong).sum), s"sums for id=$id")
      }
    }
  }

  test("aHash: pixel-identical pairs collide even when padding junk splits the byte hash") {
    val assets = MultimodalOps.synthBmpPairAssets(
      spark.range(40).toDF("doc_id"), "doc_id")
    val rows = MultimodalOps.aHashBits(assets)
      .select(col("asset_id"), md5(col("content")).as("m"),
        col("ahash_bits"))
      .as[(Long, String, String)].collect().map(r => r._1 -> r).toMap
    for (gid <- 0L until 40L by 2) {
      val (even, odd) = (rows(gid), rows(gid + 1))
      assert(even._3 == odd._3, s"aHash split a pixel-identical pair gid=$gid")
      assert(even._3.length == 64 && even._3.forall(c => c == '0' || c == '1'))
      val w = (4 + gid % 5).toInt
      if (w * 3 % 4 != 0) // padded widths: same pixels, DIFFERENT bytes
        assert(even._2 != odd._2, s"junk padding failed to split md5 at w=$w")
      else               // unpadded widths: encoder output is identical
        assert(even._2 == odd._2, s"unexpected byte diff at w=$w")
    }
    // the perceptual hash genuinely distinguishes different images
    assert(rows.values.map(_._3).toSet.size > 1)
    // corrupt payload → null fingerprint, in-band
    val torn = MultimodalOps.aHashBits(
      assets.withColumn("content", expr("substring(content, 1, 20)")))
      .select(col("ahash_bits")).as[Option[String]].collect()
    assert(torn.forall(_.isEmpty))
  }
}
