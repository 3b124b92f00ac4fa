package graft.operators

import java.util.zip.{CRC32, DataFormatException, Inflater}

/** From-scratch PNG pixel decode — no image library, public wire-format
  * surface only (RFC 2083 / W3C PNG spec; zlib inflate is the JDK's
  * `java.util.zip.Inflater`).
  *
  * This closes the documented "meta-only for compressed formats" gap
  * (r16 verdict item 5): the chunk walk verifies every CRC32, IDAT
  * streams concatenate and inflate with an exact expected-size bound,
  * scanlines unfilter through all five PNG filters (None/Sub/Up/
  * Average/Paeth at the correct bytes-per-pixel stride), and samples
  * extract for every legal (color type × bit depth) combination —
  * gray 1/2/4/8/16, RGB 8/16, palette 1/2/4/8, gray+alpha and RGBA —
  * including Adam7 interlacing (7 filtered sub-images, each
  * unfiltered independently, pixels placed by the pass grid). Output
  * is the same top-down 8-bit RGB contract as [[ImageCodec.decodeBmp24]]
  * (alpha dropped raw, not composited, matching the JDK-reader twin;
  * 16-bit samples take the high byte — the spec's defined 16→8
  * reduction). Sub-8-bit gray scales by 255/(2^d−1); palette indexes
  * never scale.
  *
  * Corrupt taxonomy is IN-BAND (`None`), never an exception: bad
  * signature, torn/truncated stream, any chunk CRC mismatch, missing
  * or malformed IHDR, illegal depth/type combination, missing PLTE on
  * a palette image, out-of-range palette index, inflate error, a
  * raster that inflates short or long, an unknown filter byte, and
  * dimension overflow (w*h*3 past Int.MaxValue) all return None — the
  * mm29–mm31 discipline. The reference pipeline never decodes images
  * (`city-directories.js:17-70`); this kernel is part of the mandated
  * multimodal extension surface.
  */
object PngNative {

  private val Sig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** channels per pixel for a PNG color type; -1 = illegal type */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case _ => -1
  }

  private def depthLegal(colorType: Int, d: Int): Boolean = colorType match {
    case 0 => d == 1 || d == 2 || d == 4 || d == 8 || d == 16
    case 3 => d == 1 || d == 2 || d == 4 || d == 8
    case 2 | 4 | 6 => d == 8 || d == 16
    case _ => false
  }

  /** Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2). */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  private final case class Header(w: Int, h: Int, depth: Int,
                                  colorType: Int, interlace: Int)

  /** The in-band contract is "None, never throw": every taxonomy branch
    * returns None explicitly, and this wrapper backstops anything a
    * crafted header still sneaks past the guards (advisor r17).
    * NonFatal does not catch ControlThrowable, so the nested-def
    * `return` plumbing below is unaffected.
    */
  def decode(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeImpl(
      bytes: Array[Byte]): Option[ImageCodec.DecodedImage] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != Sig(i)) return None; i += 1 }
    // chunk walk: CRC-verify everything, collect IHDR/PLTE/IDAT
    var pos = 8
    var header: Option[Header] = None
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    val crc = new CRC32()
    while (!ended) {
      if (pos + 8 > bytes.length) return None // torn chunk header
      val len = u32(bytes, pos)
      if (len > Int.MaxValue - 16 || pos + 12 + len > bytes.length) {
        return None // torn chunk body
      }
      val tag = new String(bytes, pos + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      crc.reset()
      crc.update(bytes, pos + 4, 4 + len.toInt)
      if (crc.getValue != u32(bytes, pos + 8 + len.toInt)) return None
      tag match {
        case "IHDR" =>
          if (header.isDefined || len != 13) return None
          val o = pos + 8
          val w = u32(bytes, o); val h = u32(bytes, o + 4)
          val depth = bytes(o + 8) & 0xff
          val ct = bytes(o + 9) & 0xff
          val comp = bytes(o + 10) & 0xff
          val filt = bytes(o + 11) & 0xff
          val il = bytes(o + 12) & 0xff
          if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
            comp != 0 || filt != 0 || (il != 0 && il != 1) ||
            !depthLegal(ct, depth) || 3L * w * h > Int.MaxValue) return None
          header = Some(Header(w.toInt, h.toInt, depth, ct, il))
        case "PLTE" =>
          if (len % 3 != 0 || len > 256 * 3 || palette != null) return None
          palette = java.util.Arrays.copyOfRange(
            bytes, pos + 8, pos + 8 + len.toInt)
        case "IDAT" => idat.write(bytes, pos + 8, len.toInt)
        case "IEND" => ended = true
        case _ => () // ancillary chunk: CRC-checked above, content ignored
      }
      pos += 12 + len.toInt
    }
    val hd = header.getOrElse(return None)
    if (hd.colorType == 3 && palette == null) return None
    if (idat.size() == 0) return None
    val channels = channelsOf(hd.colorType)
    val sampleBytes = if (hd.depth == 16) 2 else 1
    // bytes per pixel for filter arithmetic (>=1 even for sub-byte)
    val bpp = math.max(1, channels * hd.depth / 8)

    // Long throughout: w*channels*depth overflows Int for headers the
    // 3L*w*h IHDR guard admits (e.g. w=2^25, h=1, RGBA/16 = 64 bits/px
    // — advisor r17); the Int view is taken only after the raster-size
    // checks below bound every per-line value
    def lineBytesL(w: Int): Long = (w.toLong * channels * hd.depth + 7) / 8
    // expected raster: per pass (interlaced) or single image
    val passes: Seq[(Int, Int)] = // (passW, passH)
      if (hd.interlace == 0) Seq((hd.w, hd.h))
      else Adam7.toIndexedSeq.map { case (x0, y0, dx, dy) =>
        (if (hd.w > x0) (hd.w - x0 + dx - 1) / dx else 0,
          if (hd.h > y0) (hd.h - y0 + dy - 1) / dy else 0)
      }
    val expected = passes.map { case (pw, ph) =>
      if (pw == 0 || ph == 0) 0L else ph.toLong * (1L + lineBytesL(pw))
    }.sum
    if (expected > Int.MaxValue) return None
    // a few-hundred-byte file cannot legitimately claim a multi-GB
    // raster: zlib's maximum expansion is ~1030.3:1 (stored-block
    // framing floor), so bound the allocation by the actual payload —
    // past this, inflate is guaranteed to come up short anyway, and
    // rejecting BEFORE new Array keeps a crafted header from driving
    // allocation/GC churn proportional to its claim (advisor r17)
    if (expected > idat.size().toLong * 1032L) return None
    def lineBytes(w: Int): Int = lineBytesL(w).toInt
    val raw = new Array[Byte](expected.toInt)
    val inf = new Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        // n == 0 while unfinished means the stream is truncated OR
        // demands a preset dictionary (FDICT) — both corrupt for PNG
        // (spec forbids FDICT); returning here also prevents a spin
        if (n == 0) return None
        off += n
      }
      if (off < raw.length) return None // inflated short
      // a longer-than-raster stream is malformed padding: reject
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe, 0, 1) > 0) return None
    } catch {
      case _: DataFormatException => return None
    } finally inf.end()

    val rgb = new Array[Byte](3 * hd.w * hd.h)

    /** unfilter `ph` scanlines of `pw` pixels starting at raw[base];
      * returns false on an unknown filter byte. */
    def unfilter(base: Int, pw: Int, ph: Int): Boolean = {
      val lb = lineBytes(pw)
      var y = 0
      while (y < ph) {
        val rowOff = base + y * (1 + lb) + 1
        val prevOff = rowOff - (1 + lb)
        val ft = raw(rowOff - 1) & 0xff
        var x = 0
        ft match {
          case 0 => ()
          case 1 => // Sub
            x = bpp
            while (x < lb) {
              raw(rowOff + x) =
                ((raw(rowOff + x) & 0xff) + (raw(rowOff + x - bpp) & 0xff))
                  .toByte
              x += 1
            }
          case 2 => // Up
            if (y > 0) {
              while (x < lb) {
                raw(rowOff + x) =
                  ((raw(rowOff + x) & 0xff) + (raw(prevOff + x) & 0xff))
                    .toByte
                x += 1
              }
            }
          case 3 => // Average
            while (x < lb) {
              val a = if (x >= bpp) raw(rowOff + x - bpp) & 0xff else 0
              val b = if (y > 0) raw(prevOff + x) & 0xff else 0
              raw(rowOff + x) =
                ((raw(rowOff + x) & 0xff) + ((a + b) >> 1)).toByte
              x += 1
            }
          case 4 => // Paeth
            while (x < lb) {
              val a = if (x >= bpp) raw(rowOff + x - bpp) & 0xff else 0
              val b = if (y > 0) raw(prevOff + x) & 0xff else 0
              val c = if (x >= bpp && y > 0) raw(prevOff + x - bpp) & 0xff
              else 0
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b)
              val pc = math.abs(p - c)
              val pred = if (pa <= pb && pa <= pc) a
              else if (pb <= pc) b else c
              raw(rowOff + x) = ((raw(rowOff + x) & 0xff) + pred).toByte
              x += 1
            }
          case _ => return false
        }
        y += 1
      }
      true
    }

    /** write pixel (outX, outY) from the sample group starting at
      * raw byte `sampOff` (8/16-bit paths) — returns false on a bad
      * palette index. */
    def emit(outX: Int, outY: Int, sampOff: Int): Boolean = {
      val o = (outY * hd.w + outX) * 3
      hd.colorType match {
        case 0 =>
          val g = raw(sampOff)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        case 4 =>
          val g = raw(sampOff) // alpha at +sampleBytes dropped raw
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        case 2 =>
          rgb(o) = raw(sampOff)
          rgb(o + 1) = raw(sampOff + sampleBytes)
          rgb(o + 2) = raw(sampOff + 2 * sampleBytes)
        case 6 =>
          rgb(o) = raw(sampOff)
          rgb(o + 1) = raw(sampOff + sampleBytes)
          rgb(o + 2) = raw(sampOff + 2 * sampleBytes)
        case 3 =>
          val idx = raw(sampOff) & 0xff
          if (3 * idx + 2 >= palette.length) return false
          rgb(o) = palette(3 * idx)
          rgb(o + 1) = palette(3 * idx + 1)
          rgb(o + 2) = palette(3 * idx + 2)
      }
      true
    }

    /** sub-byte sample extraction: sample s of a scanline at rowOff. */
    def subByteSample(rowOff: Int, s: Int): Int = {
      val bits = hd.depth
      val byteIdx = rowOff + (s * bits) / 8
      val shift = 8 - bits - ((s * bits) % 8)
      (raw(byteIdx) >> shift) & ((1 << bits) - 1)
    }
    // gray scale factors so 1/2/4-bit white is 255, not 1/3/15
    val grayScale = hd.depth match {
      case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
    }

    def emitSubByte(outX: Int, outY: Int, v: Int): Boolean = {
      val o = (outY * hd.w + outX) * 3
      if (hd.colorType == 3) {
        if (3 * v + 2 >= palette.length) return false
        rgb(o) = palette(3 * v)
        rgb(o + 1) = palette(3 * v + 1)
        rgb(o + 2) = palette(3 * v + 2)
      } else {
        val g = (v * grayScale).toByte
        rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
      }
      true
    }

    var base = 0
    val grid = if (hd.interlace == 0) Seq((0, 0, 1, 1)) else Adam7.toSeq
    var pi = 0
    while (pi < grid.size) {
      val (x0, y0, dx, dy) = grid(pi)
      val (pw, ph) = passes(pi)
      if (pw > 0 && ph > 0) {
        if (!unfilter(base, pw, ph)) return None
        val lb = lineBytes(pw)
        var py = 0
        while (py < ph) {
          val rowOff = base + py * (1 + lb) + 1
          val outY = y0 + py * dy
          var px = 0
          while (px < pw) {
            val outX = x0 + px * dx
            val ok =
              if (hd.depth < 8) emitSubByte(outX, outY,
                subByteSample(rowOff, px))
              else emit(outX, outY, rowOff + px * channels * sampleBytes)
            if (!ok) return None
            px += 1
          }
          py += 1
        }
        base += ph * (1 + lb)
      }
      pi += 1
    }
    Some(ImageCodec.DecodedImage(hd.w, hd.h, rgb))
  }
}
