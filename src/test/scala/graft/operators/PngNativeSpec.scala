package graft.operators

import java.util.zip.{CRC32, Deflater}

import graft.SparkSpec

/** Byte-level contracts of the from-scratch PNG decoder.
  *
  * Two oracle families: (1) the JDK ImageIO reader on JDK-writer
  * round-trips — pins the common wire shapes (RGB/gray/ARGB/indexed)
  * byte-identically; (2) HAND-BUILT streams where the test computes
  * the forward filter itself — pins each of the five unfilter paths,
  * Adam7 pass geometry, sub-byte sample unpacking, the 16-bit high-
  * byte reduction, and every corrupt class in-band.
  */
class PngNativeSpec extends SparkSpec {

  // ---- hand-construction helpers -----------------------------------
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32()
    val tb = tag.getBytes("US-ASCII")
    crc.update(tb); crc.update(data)
    be32(data.length.toLong) ++ tb ++ data ++ be32(crc.getValue)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def png(w: Int, h: Int, depth: Int, colorType: Int,
                  interlace: Int, raw: Array[Byte],
                  palette: Array[Byte] = null): Array[Byte] = {
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array(depth.toByte, colorType.toByte, 0.toByte, 0.toByte,
        interlace.toByte)
    val plte = if (palette == null) Array.emptyByteArray
    else chunk("PLTE", palette)
    sig ++ chunk("IHDR", ihdr) ++ plte ++
      chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** forward-filter one RGB image with the SAME filter on every row —
    * the test-side twin of the decoder's unfilter. */
  private def filterRgb(w: Int, h: Int, ft: Int,
                        px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bpp = 3
    val lb = w * 3
    val cur = Array.ofDim[Byte](h, lb)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      cur(y)(3 * x) = r.toByte; cur(y)(3 * x + 1) = g.toByte
      cur(y)(3 * x + 2) = b.toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      out.write(ft)
      for (i <- 0 until lb) {
        val v = cur(y)(i) & 0xff
        val a = if (i >= bpp) cur(y)(i - bpp) & 0xff else 0
        val b = if (y > 0) cur(y - 1)(i) & 0xff else 0
        val c = if (i >= bpp && y > 0) cur(y - 1)(i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => v
          case 1 => (v - a) & 0xff
          case 2 => (v - b) & 0xff
          case 3 => (v - ((a + b) >> 1)) & 0xff
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a
            else if (pb <= pc) b else c
            (v - pred) & 0xff
        }
        out.write(f)
      }
    }
    out.toByteArray
  }

  private def rgbOf(img: ImageCodec.DecodedImage,
                    x: Int, y: Int): (Int, Int, Int) = {
    val o = (y * img.w + x) * 3
    (img.rgb(o) & 0xff, img.rgb(o + 1) & 0xff, img.rgb(o + 2) & 0xff)
  }

  // ---- filter coverage against the test-side forward filter --------
  test("all five scanline filters round-trip hand-filtered RGB exactly") {
    def px(x: Int, y: Int) = ((7 * x + 13 * y) % 256, (3 * x * y + 1) % 256,
      (x * x + 5 * y) % 256)
    for (ft <- 0 to 4; (w, h) <- Seq((1, 1), (3, 2), (7, 5), (16, 9))) {
      val bytes = png(w, h, 8, 2, 0, filterRgb(w, h, ft, px))
      val img = PngNative.decode(bytes)
        .getOrElse(fail(s"filter $ft ${w}x$h did not decode"))
      assert(img.w == w && img.h == h)
      for (y <- 0 until h; x <- 0 until w) {
        assert(rgbOf(img, x, y) == px(x, y), s"ft=$ft ($x,$y)")
      }
    }
  }

  // ---- JDK reader as oracle on JDK writer output --------------------
  test("byte-identical to the JDK reader on writer round-trips of every common shape") {
    import java.awt.image.BufferedImage
    def viaBoth(buf: BufferedImage): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(buf, "png", bos)
      val bytes = bos.toByteArray
      val nat = PngNative.decode(bytes).getOrElse(fail("native miss"))
      val jdk = PngCodec.decodePng(bytes).getOrElse(fail("jdk miss"))
      assert(nat.w == jdk.w && nat.h == jdk.h)
      assert(java.util.Arrays.equals(nat.rgb, jdk.rgb),
        s"pixel mismatch on type ${buf.getType}")
    }
    // TYPE_BYTE_GRAY is deliberately absent: Java's gray rides a LINEAR
    // colorspace and getRGB gamma-maps it, so the JDK reader is not a
    // raw-sample oracle there — the hand-built gray fixtures below pin
    // the raw-sample contract instead
    val rnd = new scala.util.Random(7)
    for (tpe <- Seq(BufferedImage.TYPE_INT_RGB, BufferedImage.TYPE_INT_ARGB,
      BufferedImage.TYPE_BYTE_BINARY,
      BufferedImage.TYPE_BYTE_INDEXED); (w, h) <- Seq((1, 1), (9, 4), (33, 17))) {
      val buf = new BufferedImage(w, h, tpe)
      for (y <- 0 until h; x <- 0 until w) {
        buf.setRGB(x, y, rnd.nextInt() | 0xff000000) // opaque random
      }
      viaBoth(buf)
    }
    // semi-transparent ARGB: alpha dropped RAW on both paths
    val argb = new BufferedImage(5, 3, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 3; x <- 0 until 5) {
      argb.setRGB(x, y, (x * 40 + y) << 24 | x << 16 | y << 8 | (x + y))
    }
    viaBoth(argb)
    // the existing encoder used by every PNG lane
    def px(x: Int, y: Int) = ((x * 31 + y) % 256, (y * 17) % 256, (x ^ y) % 256)
    val enc = PngCodec.encodePng24(11, 6, px)
    val nat = PngNative.decode(enc).get
    for (y <- 0 until 6; x <- 0 until 11) {
      assert(rgbOf(nat, x, y) == px(x, y))
    }
  }

  // ---- Adam7 --------------------------------------------------------
  test("Adam7 interlaced streams decode to the de-interlaced pixel grid") {
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    def px(x: Int, y: Int) = ((x * 29 + y * 7) % 256, (x + y * 19) % 256,
      (x * 3 ^ y * 5) % 256)
    // sizes straddling the 8x8 pass grid, incl. ones with EMPTY passes
    for ((w, h) <- Seq((1, 1), (3, 3), (8, 8), (13, 7), (17, 18))) {
      val out = new java.io.ByteArrayOutputStream()
      for ((x0, y0, dx, dy) <- passes) {
        val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
        val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
        if (pw > 0 && ph > 0) {
          for (py <- 0 until ph) {
            out.write(0) // filter None per pass row
            for (pxi <- 0 until pw) {
              val (r, g, b) = px(x0 + pxi * dx, y0 + py * dy)
              out.write(r); out.write(g); out.write(b)
            }
          }
        }
      }
      val bytes = png(w, h, 8, 2, 1, out.toByteArray)
      val img = PngNative.decode(bytes)
        .getOrElse(fail(s"interlaced ${w}x$h did not decode"))
      for (y <- 0 until h; x <- 0 until w) {
        assert(rgbOf(img, x, y) == px(x, y), s"${w}x$h ($x,$y)")
      }
    }
  }

  // ---- exotic depths ------------------------------------------------
  test("sub-byte gray scales to full range; palette indexes never scale; 16-bit takes the high byte") {
    // 1-bit gray, 10 px wide (crosses a byte boundary): checkerboard
    val row1 = Array[Byte](0, 0xAA.toByte, 0x80.toByte) // filter0 + bits
    val g1 = PngNative.decode(png(10, 1, 1, 0, 0, row1)).get
    for (x <- 0 until 10) {
      val want = if (x % 2 == 0) 255 else 0
      assert(rgbOf(g1, x, 0) == ((want, want, want)), s"x=$x")
    }
    // 2-bit gray: values 0..3 scale by 85
    val row2 = Array[Byte](0, 0x1B.toByte) // 00 01 10 11
    val g2 = PngNative.decode(png(4, 1, 2, 0, 0, row2)).get
    for ((x, v) <- Seq((0, 0), (1, 85), (2, 170), (3, 255))) {
      assert(rgbOf(g2, x, 0) == ((v, v, v)))
    }
    // 4-bit palette: indexes 0,1,2 into a 3-entry palette
    val pal = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val row4 = Array[Byte](0, 0x01, 0x20) // 0,1,2,0
    val p4 = PngNative.decode(png(4, 1, 4, 3, 0, row4, pal)).get
    assert(rgbOf(p4, 0, 0) == ((10, 20, 30)))
    assert(rgbOf(p4, 1, 0) == ((40, 50, 60)))
    assert(rgbOf(p4, 2, 0) == ((70, 80, 90)))
    assert(rgbOf(p4, 3, 0) == ((10, 20, 30)))
    // 8-bit gray: raw samples, no colorspace mapping
    val row8 = Array[Byte](0, 0, 0x40, 0x80.toByte, 0xFF.toByte)
    val g8 = PngNative.decode(png(4, 1, 8, 0, 0, row8)).get
    for ((x, v) <- Seq((0, 0), (1, 0x40), (2, 0x80), (3, 0xFF))) {
      assert(rgbOf(g8, x, 0) == ((v, v, v)))
    }
    // 16-bit gray: high byte wins
    val row16 = Array[Byte](0, 0x12, 0x34, 0xFE.toByte, 0xDC.toByte)
    val g16 = PngNative.decode(png(2, 1, 16, 0, 0, row16)).get
    assert(rgbOf(g16, 0, 0) == ((0x12, 0x12, 0x12)))
    assert(rgbOf(g16, 1, 0) == ((0xFE, 0xFE, 0xFE)))
    // 16-bit RGB
    val rowRgb16 = Array[Byte](0,
      0x11, 0x22, 0x33, 0x44, 0x55, 0x66)
    val c16 = PngNative.decode(png(1, 1, 16, 2, 0, rowRgb16)).get
    assert(rgbOf(c16, 0, 0) == ((0x11, 0x33, 0x55)))
    // gray+alpha: alpha dropped raw
    val rowGa = Array[Byte](0, 0x7F, 0x10)
    val ga = PngNative.decode(png(1, 1, 8, 4, 0, rowGa)).get
    assert(rgbOf(ga, 0, 0) == ((0x7F, 0x7F, 0x7F)))
  }

  // ---- corrupt taxonomy: all in-band --------------------------------
  test("corrupt taxonomy returns None in-band, never an exception") {
    def px(x: Int, y: Int) = (x % 256, y % 256, (x + y) % 256)
    val good = png(6, 4, 8, 2, 0, filterRgb(6, 4, 0, px))
    assert(PngNative.decode(good).isDefined)
    // truncations at every length
    for (n <- 0 until good.length) {
      assert(PngNative.decode(good.take(n)).isEmpty, s"truncated at $n")
    }
    // any single flipped byte is caught (CRC or structure), except in
    // chunk payload regions where the flip keeps CRC consistency
    // impossible — flip + decode must never throw, and flips inside
    // data/CRC regions must return None
    for (i <- 8 until good.length) {
      val c = good.clone(); c(i) = (c(i) ^ 0x5a).toByte
      PngNative.decode(c).foreach { img =>
        fail(s"flipped byte $i decoded")
      }
    }
    // unknown filter byte
    val badFilter = filterRgb(3, 2, 0, px); badFilter(0) = 5
    assert(PngNative.decode(png(3, 2, 8, 2, 0, badFilter)).isEmpty)
    // raster inflates short / long
    val short = filterRgb(3, 2, 0, px).dropRight(1)
    assert(PngNative.decode(png(3, 2, 8, 2, 0, short)).isEmpty)
    val long = filterRgb(3, 2, 0, px) ++ Array[Byte](1, 2, 3)
    assert(PngNative.decode(png(3, 2, 8, 2, 0, long)).isEmpty)
    // palette image without PLTE; palette index out of range
    assert(PngNative.decode(
      png(4, 1, 4, 3, 0, Array[Byte](0, 0x01, 0x20))).isEmpty)
    val pal1 = Array[Byte](1, 2, 3) // one entry; index 2 out of range
    assert(PngNative.decode(
      png(4, 1, 4, 3, 0, Array[Byte](0, 0x01, 0x20), pal1)).isEmpty)
    // illegal depth/type combos
    assert(PngNative.decode(png(2, 1, 4, 2, 0,
      Array[Byte](0, 0x11, 0x22, 0x33))).isEmpty) // rgb at depth 4
    // nonsense and empties
    assert(PngNative.decode(null).isEmpty)
    assert(PngNative.decode(Array.emptyByteArray).isEmpty)
    assert(PngNative.decode(Array.fill[Byte](64)(0x42)).isEmpty)
    // line-byte Int overflow: w=2^25, h=1, RGBA/16 = 64 bits/px passes
    // the 3L*w*h IHDR bound but w*channels*depth overflows Int — must
    // reject in-band, not NegativeArraySizeException (advisor r18)
    assert(PngNative.decode(
      png(1 << 25, 1, 16, 6, 0, Array[Byte](0))).isEmpty)
    // allocation bound: a ~60-byte file claiming a ~100 MB raster must
    // reject on the zlib max-expansion bound BEFORE allocating
    assert(PngNative.decode(
      png(1000000, 100, 8, 0, 0, Array[Byte](0))).isEmpty)
  }
}
