package graft.operators

/** Structural facts from a GIF89a stream — the ANIMATION container's
  * metadata layer: canvas dims, palette size, frame count, total
  * animation time, loop count. All deterministic wire bytes (the LZW
  * pixel data is skipped structurally, never decoded). */
case class GifMeta(w: Int, h: Int, gctColors: Int, frames: Int,
                   totalDelayCs: Int, loopCount: Option[Int])

/** Pure-JVM GIF89a reader/writer — the sixth hand-rolled codec (BMP,
  * WAV, Y4M, PNG/JPEG seam, TIFF), covering the animated-image
  * container class: multi-frame timing, loop extensions, sub-block
  * framing.
  *
  * The READER is a block walk, not a pixel decode: after the header
  * and logical screen descriptor it hops length-prefixed sub-blocks —
  * extensions (capturing NETSCAPE loop count and per-frame Graphic
  * Control delays) and image descriptors (counting frames, skipping
  * local tables and LZW data by their declared lengths) — to the
  * trailer. O(blocks) per asset with every hop bounds-checked; pixel
  * bytes are never interpreted, so cost is independent of image area
  * (the TIFF/JPEG O(header) discipline on a block-framed format).
  *
  * The WRITER emits real decodable wire bytes: the LZW stream uses the
  * degenerate-but-valid CLEAR-before-every-pixel encoding (the
  * dictionary never grows, so the code width stays minCodeSize+1
  * throughout — maximally inefficient, spec-exact; `javax.imageio`
  * decodes it, which TiffCodec-style cross-checks pin). Spec: GIF89a
  * (CompuServe, public), appendices C–F.
  */
object GifCodec {

  /** Fixed 4-color global table: palette index i → RGB (85i, 85i, 85i)
    * — grayscale ramp, so a cross-decoder check can recover the index
    * from any channel. */
  val PaletteSize = 4
  private val MinCodeSize = 2 // 4-color table → LZW min code size 2

  private def u16le(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

  /** Walk the block structure. None on any structural violation:
    * short/alien header, truncated descriptor, a sub-block or table
    * running past the buffer, or a missing trailer path (walk falls
    * off the end). */
  def gifMeta(bytes: Array[Byte]): Option[GifMeta] = {
    if (bytes == null || bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF89a" && sig != "GIF87a") return None
    val w = u16le(bytes, 6)
    val h = u16le(bytes, 8)
    if (w == 0 || h == 0) return None // degenerate canvas: not an image
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctColors = if (hasGct) 1 << ((packed & 0x07) + 1) else 0
    var pos = 13 + (if (hasGct) 3 * gctColors else 0)
    var frames = 0
    var totalDelayCs = 0
    var loopCount: Option[Int] = None
    var pendingDelay = 0
    // hop one length-prefixed sub-block chain; -1 = torn
    def skipSubBlocks(from: Int): Int = {
      var p = from
      while (p < bytes.length && bytes(p) != 0) {
        p += 1 + (bytes(p) & 0xff)
      }
      if (p >= bytes.length) -1 else p + 1 // consume the 0 terminator
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => // trailer: done
          return Some(GifMeta(w, h, gctColors, frames, totalDelayCs,
            loopCount))
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 > bytes.length) return None
          val label = bytes(pos + 1) & 0xff
          if (label == 0xf9 && pos + 7 < bytes.length &&
              (bytes(pos + 2) & 0xff) == 4) {
            pendingDelay = u16le(bytes, pos + 4) // centiseconds
          }
          if (label == 0xff && pos + 14 <= bytes.length &&
              (bytes(pos + 2) & 0xff) == 11 &&
              new String(bytes, pos + 3, 11,
                java.nio.charset.StandardCharsets.US_ASCII) == "NETSCAPE2.0") {
            // sub-block: 03 01 lo hi
            if (pos + 18 <= bytes.length && (bytes(pos + 14) & 0xff) == 3)
              loopCount = Some(u16le(bytes, pos + 16))
          }
          val next = skipSubBlocks(pos + 2)
          if (next < 0) return None
          pos = next
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) return None
          val ipacked = bytes(pos + 9) & 0xff
          val lctColors =
            if ((ipacked & 0x80) != 0) 1 << ((ipacked & 0x07) + 1) else 0
          var p = pos + 10 + 3 * lctColors
          if (p + 1 > bytes.length) return None
          p += 1 // LZW min code size byte
          val next = skipSubBlocks(p)
          if (next < 0) return None
          frames += 1
          totalDelayCs += pendingDelay
          pendingDelay = 0
          pos = next
        case _ => return None // unknown top-level block: not a GIF we read
      }
    }
    None // fell off the end without a trailer
  }

  /** Multi-frame GIF89a writer: full-canvas frames over the fixed
    * 4-color global table, per-frame delays (centiseconds), a NETSCAPE
    * loop extension when `loop` is defined, degenerate-valid LZW. */
  def encodeGif(w: Int, h: Int, delays: Seq[Int], loop: Option[Int],
                pix: (Int, Int, Int) => Int): Array[Byte] = {
    require(w > 0 && w <= 0xffff && h > 0 && h <= 0xffff, s"bad dims ${w}x$h")
    require(delays.nonEmpty, "at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u16(w); u16(h)
    out.write(0x80 | 0x10 | 0x01) // GCT present, 4 entries (size bits 1)
    out.write(0); out.write(0)    // bg index, aspect
    for (i <- 0 until PaletteSize) { // grayscale ramp
      out.write(85 * i); out.write(85 * i); out.write(85 * i)
    }
    loop.foreach { n =>
      require(n >= 0 && n <= 0xffff, s"bad loop count $n")
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      out.write(3); out.write(1); u16(n); out.write(0)
    }
    delays.zipWithIndex.foreach { case (delayCs, f) =>
      require(delayCs >= 0 && delayCs <= 0xffff, s"bad delay $delayCs")
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0) // disposal none, no transparency
      u16(delayCs); out.write(0); out.write(0)
      out.write(0x2c) // image descriptor: full canvas
      u16(0); u16(0); u16(w); u16(h); out.write(0)
      out.write(MinCodeSize)
      // degenerate LZW: CLEAR before every pixel code keeps the
      // dictionary empty and the code width fixed at MinCodeSize+1
      val clear = 1 << MinCodeSize
      val eoi = clear + 1
      val width = MinCodeSize + 1
      val codes = new scala.collection.mutable.ArrayBuffer[Int](2 * w * h + 2)
      codes += clear
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          codes += (pix(f, x, y) & (PaletteSize - 1))
          codes += clear
          x += 1
        }
        y += 1
      }
      codes(codes.length - 1) = eoi // final CLEAR slot becomes EOI
      // LSB-first bit packing into 255-byte sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      var acc = 0; var nbits = 0
      codes.foreach { c =>
        acc |= c << nbits; nbits += width
        while (nbits >= 8) { data.write(acc & 0xff); acc >>= 8; nbits -= 8 }
      }
      if (nbits > 0) data.write(acc & 0xff)
      val bs = data.toByteArray
      var off = 0
      while (off < bs.length) {
        val n = math.min(255, bs.length - off)
        out.write(n); out.write(bs, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }
}
