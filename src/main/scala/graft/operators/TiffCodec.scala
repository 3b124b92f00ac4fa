package graft.operators

/** Parsed facts from a TIFF baseline IFD — the metadata layer camera
  * imagery actually ships (EXIF is this same IFD structure embedded in
  * a JPEG APP1 segment, so the walk below is the load-bearing half of
  * EXIF extraction). */
case class TiffMeta(w: Int, h: Int, orientation: Int, bitsPerSample: Int,
                    littleEndian: Boolean, dateTime: Option[String])

/** Pure-JVM TIFF 6.0 baseline reader/writer — the fourth hand-rolled
  * codec beside BMP/WAV/Y4M, for the metadata-bearing image container.
  *
  * Unlike JPEG (mm19), where only the frame header is deterministic,
  * a TIFF's ENTIRE tag directory is fixed by the writer: byte order
  * mark, magic, and a sorted table of (tag, type, count, value)
  * entries. The reader walks IFD0 under EITHER byte order ("II"
  * little-endian — the EXIF default — or "MM" big-endian, both live in
  * real corpora) with every offset bounds-checked, values read
  * left-justified from the 4-byte value field per spec §2, and ASCII
  * values (DateTime) followed through their out-of-line offset. Torn
  * or alien payloads return None — in-band, never thrown.
  *
  * Spec: TIFF 6.0 (Adobe, public), §2 "TIFF Structure"; tag constants
  * from §8. Scale shape: O(header) per asset — the strip data is never
  * touched, so profiling a 100 MB scan costs the same as a thumbnail.
  */
object TiffCodec {

  private val TagWidth = 256
  private val TagLength = 257
  private val TagBits = 258
  private val TagCompression = 259
  private val TagPhotometric = 262
  private val TagStripOffsets = 273
  private val TagOrientation = 274
  private val TagSamplesPerPixel = 277
  private val TagRowsPerStrip = 278
  private val TagStripByteCounts = 279
  private val TagDateTime = 306

  private def u16(b: Array[Byte], at: Int, le: Boolean): Int =
    if (le) (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
    else ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)

  private def u32(b: Array[Byte], at: Int, le: Boolean): Long =
    if (le) (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
    else ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  /** Walk IFD0 and read the gateable facts. None on any structural
    * violation: short header, unknown byte order, wrong magic, IFD or
    * ASCII offset out of bounds, or missing width/length. Orientation
    * defaults to 1 and BitsPerSample to 1 when absent (spec defaults).
    */
  def ifdWalk(bytes: Array[Byte]): Option[TiffMeta] = {
    if (bytes == null || bytes.length < 8) return None
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return None
    if (u16(bytes, 2, le) != 42) return None
    val ifdOff = u32(bytes, 4, le)
    if (ifdOff < 8 || ifdOff + 2 > bytes.length) return None
    val off = ifdOff.toInt
    val n = u16(bytes, off, le)
    if (off + 2 + 12L * n + 4 > bytes.length) return None
    var w, h = -1
    var orientation = 1
    var bits = 1
    var dateTime: Option[String] = None
    var i = 0
    while (i < n) {
      val e = off + 2 + 12 * i
      val tag = u16(bytes, e, le)
      val typ = u16(bytes, e + 2, le)
      val count = u32(bytes, e + 4, le)
      // SHORT (3) and LONG (4) values of count 1 live left-justified
      // in the 4-byte value field; anything larger is an offset
      def shortOrLong: Option[Int] =
        if (count != 1) None
        else if (typ == 3) Some(u16(bytes, e + 8, le))
        else if (typ == 4) {
          val v = u32(bytes, e + 8, le)
          if (v <= Int.MaxValue) Some(v.toInt) else None
        } else None
      tag match {
        case TagWidth       => shortOrLong.foreach(v => w = v)
        case TagLength      => shortOrLong.foreach(v => h = v)
        case TagBits        => shortOrLong.foreach(v => bits = v)
        case TagOrientation => shortOrLong.foreach(v => orientation = v)
        case TagDateTime if typ == 2 && count >= 2 =>
          // ASCII, NUL-terminated; count > 4 means out-of-line
          val at = if (count <= 4) e + 8 else u32(bytes, e + 8, le)
          if (at >= 0 && at + count <= bytes.length)
            dateTime = Some(new String(bytes, at.toInt,
              count.toInt - 1, java.nio.charset.StandardCharsets.US_ASCII))
        case _ => ()
      }
      i += 1
    }
    if (w <= 0 || h <= 0) None // absent or degenerate dims: not an image
    else Some(TiffMeta(w, h, orientation, bits, le, dateTime))
  }

  /** Minimal single-strip 8-bit grayscale TIFF writer, either byte
    * order — enough wire surface for the walk above and for
    * `javax.imageio` to decode (the independent cross-check
    * TiffCodecSpec runs). Layout: 8-byte header, IFD0 at 8 with 11
    * ascending-tag entries, the 20-byte DateTime ASCII block, then the
    * pixel strip. */
  def encodeTiffGray8(w: Int, h: Int, orientation: Int, dateTime: String,
                      littleEndian: Boolean,
                      pix: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(orientation >= 1 && orientation <= 8, s"bad orientation")
    val dt = (dateTime + "\u0000").getBytes(
      java.nio.charset.StandardCharsets.US_ASCII)
    require(dt.length == 20, s"DateTime must be 19 ASCII chars: $dateTime")
    val nEntries = 11
    val ifdOff = 8
    val dtOff = ifdOff + 2 + 12 * nEntries + 4
    val stripOff = dtOff + dt.length
    val out = new Array[Byte](stripOff + w * h)
    val le = littleEndian
    def putU16(at: Int, v: Int): Unit =
      if (le) { out(at) = v.toByte; out(at + 1) = (v >> 8).toByte }
      else { out(at) = (v >> 8).toByte; out(at + 1) = v.toByte }
    def putU32(at: Int, v: Long): Unit =
      if (le) { out(at) = v.toByte; out(at + 1) = (v >> 8).toByte
        out(at + 2) = (v >> 16).toByte; out(at + 3) = (v >> 24).toByte }
      else { out(at) = (v >> 24).toByte; out(at + 1) = (v >> 16).toByte
        out(at + 2) = (v >> 8).toByte; out(at + 3) = v.toByte }
    out(0) = (if (le) 'I' else 'M').toByte
    out(1) = out(0)
    putU16(2, 42)
    putU32(4, ifdOff)
    putU16(ifdOff, nEntries)
    var e = ifdOff + 2
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      putU16(e, tag); putU16(e + 2, typ); putU32(e + 4, count)
      if (typ == 3 && count == 1) putU16(e + 8, value.toInt)
      else putU32(e + 8, value)
      e += 12
    }
    entry(TagWidth, 3, 1, w)
    entry(TagLength, 3, 1, h)
    entry(TagBits, 3, 1, 8)
    entry(TagCompression, 3, 1, 1) // none
    entry(TagPhotometric, 3, 1, 1) // BlackIsZero
    entry(TagStripOffsets, 4, 1, stripOff)
    entry(TagOrientation, 3, 1, orientation)
    entry(TagSamplesPerPixel, 3, 1, 1)
    entry(TagRowsPerStrip, 3, 1, h)
    entry(TagStripByteCounts, 4, 1, w.toLong * h)
    entry(TagDateTime, 2, dt.length, dtOff)
    putU32(e, 0) // no next IFD
    System.arraycopy(dt, 0, out, dtOff, dt.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(stripOff + y * w + x) = (pix(x, y) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
