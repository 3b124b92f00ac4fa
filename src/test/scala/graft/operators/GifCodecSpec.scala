package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  private def px(id: Long)(f: Int, x: Int, y: Int): Int =
    ((id * 7 + f + x + 2 * y) % 4).toInt

  test("gifMeta roundtrips encodeGif across frame/delay/loop mixes") {
    for (id <- 0L until 16L) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val frames = (1 + id % 4).toInt
      val delays = (0 until frames).map(f => (5 + (id + f) % 10).toInt)
      val loop = if (id % 3 == 0) None else Some((id % 3).toInt)
      val bytes = GifCodec.encodeGif(w, h, delays, loop, px(id))
      val got = GifCodec.gifMeta(bytes)
      assert(got.contains(GifMeta(w, h, 4, frames, delays.sum, loop)),
        s"id=$id: $got")
    }
  }

  test("javax.imageio independently decodes the degenerate-LZW wire bytes (dims, frame count, pixels)") {
    // a full third-party decoder over the same bytes: a bit-packing or
    // sub-block framing bug would break it even if our own walk
    // (which never reads LZW) stayed green
    for (id <- Seq(1L, 2L, 5L)) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val frames = (1 + id % 4).toInt
      val bytes = GifCodec.encodeGif(w, h,
        Seq.fill(frames)(10), Some(0), px(id))
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, s"id=$id: no GIF reader")
      val r = readers.next()
      r.setInput(iis)
      assert(r.getNumImages(true) == frames, s"id=$id frame count")
      for (f <- 0 until frames) {
        val img = r.read(f)
        assert(img.getWidth == w && img.getHeight == h, s"id=$id dims")
        for (y <- 0 until h; x <- 0 until w) {
          val idx = (img.getRGB(x, y) & 0xff) / 85 // grayscale ramp
          assert(idx == px(id)(f, x, y), s"id=$id f=$f pixel ($x,$y)")
        }
      }
      r.dispose()
    }
  }

  test("gifMeta rejects the corrupt taxonomy in-band, never throws") {
    val good = GifCodec.encodeGif(6, 5, Seq(10, 20), Some(2), px(3))
    assert(GifCodec.gifMeta(null).isEmpty)
    assert(GifCodec.gifMeta(Array[Byte]()).isEmpty)
    assert(GifCodec.gifMeta(good.take(10)).isEmpty) // torn inside LSD
    val badSig = good.clone(); badSig(0) = 'X'.toByte // "XIF89a"
    assert(GifCodec.gifMeta(badSig).isEmpty)
    // trailer stomped to an unknown block type: walk must miss, not spin
    val noTrail = good.clone(); noTrail(noTrail.length - 1) = 0x55.toByte
    assert(GifCodec.gifMeta(noTrail).isEmpty)
    // truncated mid-frame (inside the LZW sub-blocks): torn hop
    assert(GifCodec.gifMeta(good.take(good.length - 8)).isEmpty)
    // 87a signature accepted (the walk reads both eras)
    val g87 = good.clone(); g87(4) = '7'.toByte
    assert(GifCodec.gifMeta(g87).isDefined)
  }
}
