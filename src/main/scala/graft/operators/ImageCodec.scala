package graft.operators

/** Pure-JVM 24-bit BMP codec — the REAL decode kernel behind
  * [[MultimodalOps.decodeImageFeatures]] (retiring the md5 stub that
  * carried the multimodal plumbing since round 8; the stub remains as
  * the spec twin for the batching shape).
  *
  * Why BMP, hand-rolled: the container's pixel decode is byte-exact and
  * dependency-free, so the SAME bytes decode identically on any
  * executor, any JVM, any round — the determinism a hash-gated oracle
  * needs — while still exercising the honest quirks of a real container
  * format: little-endian multi-byte headers, BGR channel order, rows
  * padded to 4-byte boundaries, and bottom-up row storage (positive
  * height) vs top-down (negative height). ImageIO's BMP plugin reads
  * the same files; ImageCodecSpec pins pixel-exact agreement.
  *
  * Scale shape: the codec is a plain static JVM kernel — no reflection,
  * no shared state — so it runs iterator-to-iterator inside
  * `mapPartitions` with zero per-row setup, the same batch shape a
  * Pandas-UDF decode would use on a Python stack.
  */
object ImageCodec {

  /** Decoded image: width, height, and row-major top-down RGB triples
    * (r, g, b per pixel, 0-255 each). */
  final case class DecodedImage(w: Int, h: Int, rgb: Array[Byte])

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** Encode a 24-bit uncompressed bottom-up BMP. `rgb(x, y)` returns the
    * (r, g, b) triple for the TOP-DOWN pixel grid; the encoder writes
    * rows bottom-up with 4-byte row padding, per the format.
    */
  def encodeBmp24(w: Int, h: Int,
                  rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims: ${w}x$h")
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length)   // file size
    putI32(out, 10, 54)          // pixel data offset
    putI32(out, 14, 40)          // BITMAPINFOHEADER size
    putI32(out, 18, w)
    putI32(out, 22, h)           // positive = bottom-up
    putU16(out, 26, 1)           // planes
    putU16(out, 28, 24)          // bpp
    putI32(out, 30, 0)           // BI_RGB
    putI32(out, 34, dataSize)
    var y = 0
    while (y < h) {
      // row y of the top-down grid lands at bottom-up slot (h - 1 - y)
      val base = 54 + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        out(base + 3 * x) = (b & 0xff).toByte     // BGR order
        out(base + 3 * x + 1) = (g & 0xff).toByte
        out(base + 3 * x + 2) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bit uncompressed BMP (bottom-up or top-down). Returns
    * None for anything that isn't one — wrong magic, truncated header,
    * unsupported bpp/compression, or pixel data shorter than the header
    * claims — so corrupt payloads surface as in-band misses, not task
    * failures.
    */
  def decodeBmp24(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.length < 54 ||
      bytes(0) != 'B' || bytes(1) != 'M') return None
    val off = i32(bytes, 10)
    val w = i32(bytes, 18)
    val rawH = i32(bytes, 22)
    val topDown = rawH < 0
    // ALL dimension arithmetic in Long: crafted headers with w near
    // 2^30 wrap `w * 3` to a negative Int (passing the bounds check on
    // a negative product), and rawH == Int.MinValue survives a 32-bit
    // math.abs — both would throw out of the codec instead of
    // returning the in-band None the contract promises.
    val hL = math.abs(rawH.toLong)
    if (w <= 0 || hL == 0 || u16(bytes, 28) != 24 ||
      i32(bytes, 30) != 0) return None
    val rowBytesL = (3L * w + 3) & ~3L
    // each factor is individually bounded by the payload length before
    // the product, so rowBytesL * hL cannot overflow (< 2^62)
    if (off < 54 || rowBytesL > bytes.length || hL > bytes.length ||
      off.toLong + rowBytesL * hL > bytes.length)
      return None
    // past the bound, 3·w·h <= rowBytes·h <= bytes.length < 2^31
    val h = hL.toInt
    val rowBytes = rowBytesL.toInt
    val rgb = new Array[Byte]((3L * w * h).toInt)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base = off + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        rgb(i) = bytes(base + 3 * x + 2)     // R
        rgb(i + 1) = bytes(base + 3 * x + 1) // G
        rgb(i + 2) = bytes(base + 3 * x)     // B
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(w, h, rgb))
  }

  /** Exact-integer features of a decoded image: per-channel sums (the
    * oracle-replayable decode evidence — a padding or row-order bug
    * shifts them immediately) plus dims. */
  def channelSums(img: DecodedImage): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    val a = img.rgb
    while (i < a.length) {
      r += a(i) & 0xff; g += a(i + 1) & 0xff; b += a(i + 2) & 0xff
      i += 3
    }
    (r, g, b)
  }
}
