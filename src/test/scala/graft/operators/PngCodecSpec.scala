package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PngCodecSpec extends SparkSpec {
  import spark.implicits._

  private def px(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((id * 7 + 3 * x + 5 * y) % 256).toInt,
    ((id * 11 + x + 2 * y) % 256).toInt,
    ((id * 13 + 2 * x + y) % 256).toInt)

  test("decodePng roundtrips encodePng24 pixel-exactly") {
    for (id <- 0L until 12L) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val got = PngCodec.decodePng(PngCodec.encodePng24(w, h, px(id)))
      assert(got.isDefined, s"id=$id failed to decode")
      val img = got.get
      assert(img.w == w && img.h == h, s"id=$id dims")
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = px(id)(x, y)
        val i = (y * w + x) * 3
        assert((img.rgb(i) & 0xff) == r && (img.rgb(i + 1) & 0xff) == g &&
          (img.rgb(i + 2) & 0xff) == b, s"id=$id pixel ($x,$y)")
      }
    }
  }

  test("PNG and BMP containers decode to byte-identical RGB for identical pixels") {
    for (id <- 0L until 12L) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val png = PngCodec.decodePng(PngCodec.encodePng24(w, h, px(id))).get
      val bmp = ImageCodec.decodeBmp24(
        ImageCodec.encodeBmp24(w, h, px(id))).get
      assert(png.w == bmp.w && png.h == bmp.h, s"id=$id dims")
      assert(png.rgb.toSeq == bmp.rgb.toSeq, s"id=$id rgb diverged")
    }
  }

  test("decodePng rejects corrupt payloads in-band, never throws") {
    val good = PngCodec.encodePng24(6, 5, px(2))
    assert(PngCodec.decodePng(null) == None)
    assert(PngCodec.decodePng(Array[Byte](1, 2, 3)) == None)
    assert(PngCodec.decodePng(good.take(20)) == None)   // torn after sig
    assert(PngCodec.decodePng(good.take(7)) == None)    // torn inside sig
    val wrongMagic = good.clone(); wrongMagic(1) = 'X'
    assert(PngCodec.decodePng(wrongMagic) == None)
    // BMP bytes through the strict-PNG entry point: wrong signature
    assert(PngCodec.decodePng(
      ImageCodec.encodeBmp24(4, 3, px(1))) == None)
  }

  test("decodeAuto sniffs the container: BMP to the hand codec, PNG/JPEG to ImageIO") {
    val bmp = ImageCodec.encodeBmp24(5, 4, px(3))
    val png = PngCodec.encodePng24(5, 4, px(3))
    val viaBmp = PngCodec.decodeAuto(bmp).get
    val viaPng = PngCodec.decodeAuto(png).get
    assert(viaBmp.rgb.toSeq == viaPng.rgb.toSeq,
      "auto-decoded containers diverged on identical pixels")
    assert(PngCodec.decodeAuto(null) == None)
    assert(PngCodec.decodeAuto("GIF89a".getBytes) == None)
  }

  test("JPEG decodes through the same seam — dims deterministic, pixels never hash-gated") {
    // golden-only by design: JPEG is lossy and IDCT rounding is
    // decoder-dependent, so only DIMS are asserted (the mm15 rule)
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, ((x * 16) << 16) | ((y * 21) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpeg = bos.toByteArray
    val got = PngCodec.decodeJpeg(jpeg)
    assert(got.exists(d => d.w == 16 && d.h == 12), "jpeg dims")
    assert(PngCodec.decodeAuto(jpeg).exists(d => d.w == 16 && d.h == 12))
    assert(PngCodec.decodeJpeg(jpeg.take(10)) == None) // torn, in-band
  }

  test("jpegHeader walks the markers to SOF: dims, components, precision, baseline") {
    for (id <- 0L until 20L) {
      val w = (16 + id % 9).toInt; val h = (12 + id % 7).toInt
      val jpg = PngCodec.encodeJpeg24(w, h, 0.75f, px(id))
      val hd = PngCodec.jpegHeader(jpg)
      assert(hd.contains(PngCodec.JpegHeader(w, h, 3, 8, false)),
        s"id=$id got $hd")
      // agreement with the full decoder on the deterministic half
      val dec = PngCodec.decodeJpeg(jpg).get
      assert(dec.w == w && dec.h == h, s"id=$id decoder dims")
    }
  }

  test("jpegHeader reads SOF2 frames as progressive") {
    // JDK writer in progressive mode emits an SOF2 frame header
    val img = new java.awt.image.BufferedImage(24, 18,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 18; x <- 0 until 24)
      img.setRGB(x, y, ((x * 10) << 16) | ((y * 14) << 8) | 64)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val hd = PngCodec.jpegHeader(bos.toByteArray)
    assert(hd.contains(PngCodec.JpegHeader(24, 18, 3, 8, true)), s"got $hd")
  }

  test("jpegHeader misses in-band on torn, foreign, and SOF-less payloads") {
    val jpg = PngCodec.encodeJpeg24(20, 15, 0.75f, px(5))
    assert(PngCodec.jpegHeader(null) == None)
    assert(PngCodec.jpegHeader(jpg.take(4)) == None)  // SOI + FF, no frame
    assert(PngCodec.jpegHeader(jpg.take(2)) == None)  // bare SOI
    assert(PngCodec.jpegHeader(jpg.take(20)) == None) // torn mid-segment
    assert(PngCodec.jpegHeader(
      PngCodec.encodePng24(4, 3, px(1))) == None)     // wrong container
    assert(PngCodec.jpegHeader(
      ImageCodec.encodeBmp24(4, 3, px(1))) == None)
    // SOI then EOI with no frame: walk must stop, not scan entropy junk
    assert(PngCodec.jpegHeader(Array(0xff, 0xd8, 0xff, 0xd9)
      .map(_.toByte)) == None)
  }

  test("decodeImageFeatures over the mixed wire fixture: both branches fire, torn rows in-band") {
    val assets = MultimodalOps.synthWireImageAssets(
      spark.range(40).toDF("doc_id"), "doc_id")
    val out = MultimodalOps.decodeImageFeatures(
        assets, kernel = PngCodec.decodeAuto)
      .select(col("asset_id"), col("img_w"), col("sum_r"), col("decoded"))
      .as[(Long, Option[Int], Option[Long], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    for (id <- 0L until 40L) {
      val (_, wGot, srGot, dec) = out(id)
      if (id % 13 == 0) assert(!dec && wGot.isEmpty, s"id=$id torn row")
      else {
        val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
        val sr = (for (y <- 0 until h; x <- 0 until w)
          yield (id * 7 + 3 * x + 5 * y) % 256).sum
        assert(dec && wGot.contains(w) && srGot.contains(sr),
          s"id=$id (${if (id % 2 == 0) "png" else "bmp"})")
      }
    }
  }
}
