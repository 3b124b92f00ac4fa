package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class TiffCodecSpec extends AnyFunSuite {

  private def dtOf(id: Long): String =
    f"2020:01:${1 + id % 28}%02d 12:00:${id % 60}%02d"

  test("ifdWalk roundtrips encodeTiffGray8 under both byte orders") {
    for (id <- 0L until 16L; le <- Seq(true, false)) {
      val w = (6 + id % 9).toInt; val h = (5 + id % 7).toInt
      val o = (1 + id % 8).toInt
      val bytes = TiffCodec.encodeTiffGray8(w, h, o, dtOf(id), le,
        (x, y) => ((id * 7 + 3 * x + 5 * y) % 256).toInt)
      val got = TiffCodec.ifdWalk(bytes)
      assert(got.contains(TiffMeta(w, h, o, 8, le, Some(dtOf(id)))),
        s"id=$id le=$le: $got")
    }
  }

  test("javax.imageio independently decodes the writer's bytes (dims + pixel values)") {
    // the JDK TIFF plugin is a full third-party reader of the same
    // wire bytes — if our writer mislaid an offset or flipped a byte
    // order it would disagree, not just our own walk
    for (id <- Seq(0L, 3L, 7L); le <- Seq(true, false)) {
      val w = (6 + id % 9).toInt; val h = (5 + id % 7).toInt
      val bytes = TiffCodec.encodeTiffGray8(w, h, 1, dtOf(id), le,
        (x, y) => ((id * 7 + 3 * x + 5 * y) % 256).toInt)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"id=$id le=$le: ImageIO rejected the TIFF")
      assert(img.getWidth == w && img.getHeight == h, s"id=$id le=$le dims")
      for (y <- 0 until h; x <- 0 until w) {
        val expect = ((id * 7 + 3 * x + 5 * y) % 256).toInt
        val got = img.getRaster.getSample(x, y, 0)
        assert(got == expect, s"id=$id le=$le pixel ($x,$y)")
      }
    }
  }

  test("ifdWalk rejects the corrupt taxonomy in-band, never throws") {
    val good = TiffCodec.encodeTiffGray8(8, 6, 3, dtOf(5), littleEndian = true,
      (x, y) => x + y)
    assert(TiffCodec.ifdWalk(null).isEmpty)
    assert(TiffCodec.ifdWalk(Array[Byte]()).isEmpty)
    assert(TiffCodec.ifdWalk(good.take(6)).isEmpty)  // torn IFD offset
    assert(TiffCodec.ifdWalk(good.take(9)).isEmpty)  // IFD beyond EOF
    val badOrder = good.clone(); badOrder(0) = 'X'.toByte
    assert(TiffCodec.ifdWalk(badOrder).isEmpty)
    val mixedOrder = good.clone(); mixedOrder(1) = 'M'.toByte // "IM" is neither
    assert(TiffCodec.ifdWalk(mixedOrder).isEmpty)
    val badMagic = good.clone(); badMagic(2) = 0x2b; badMagic(3) = 0x2b
    assert(TiffCodec.ifdWalk(badMagic).isEmpty)
    // entry count inflated past the buffer: bounds check must fire
    val hugeN = good.clone(); hugeN(8) = 0xff.toByte; hugeN(9) = 0x7f
    assert(TiffCodec.ifdWalk(hugeN).isEmpty)
    // DateTime offset stomped out of bounds: parse survives (dims are
    // intact), the string is dropped — partial damage stays partial
    val dtEntry = 8 + 2 + 12 * 10 // 11th entry = DateTime (ascending tags)
    val badDt = good.clone()
    badDt(dtEntry + 8) = 0xff.toByte; badDt(dtEntry + 9) = 0xff.toByte
    val partial = TiffCodec.ifdWalk(badDt)
    assert(partial.isDefined && partial.get.dateTime.isEmpty, s"$partial")
    // width entry retagged to an unknown tag: dims gone, walk misses
    val noW = good.clone(); noW(8 + 2) = 0x11; noW(8 + 2 + 1) = 0x11
    assert(TiffCodec.ifdWalk(noW).isEmpty)
  }

  test("spec defaults: orientation 1 and bits 1 when the tags are absent") {
    // hand-build a 2-entry IFD (width + length only), little-endian
    val b = new Array[Byte](8 + 2 + 2 * 12 + 4)
    b(0) = 'I'.toByte; b(1) = 'I'.toByte; b(2) = 42; b(4) = 8
    b(8) = 2 // entry count
    def entry(at: Int, tag: Int, v: Int): Unit = {
      b(at) = tag.toByte; b(at + 1) = (tag >> 8).toByte
      b(at + 2) = 3 // SHORT
      b(at + 4) = 1 // count
      b(at + 8) = v.toByte; b(at + 9) = (v >> 8).toByte
    }
    entry(10, 256, 7)
    entry(22, 257, 4)
    val got = TiffCodec.ifdWalk(b)
    assert(got.contains(TiffMeta(7, 4, 1, 1, true, None)), s"$got")
  }
}
