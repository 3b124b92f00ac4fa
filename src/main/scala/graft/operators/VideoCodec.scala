package graft.operators

/** Pure-JVM Y4M (YUV4MPEG2) codec — the VIDEO member of the real-kernel
  * family ([[ImageCodec]] BMP, [[AudioCodec]] WAV): a genuine,
  * widely-used uncompressed video container (the interchange format of
  * codec toolchains), simple enough to parse byte-exactly with no
  * dependencies, so the same bytes decode identically on any executor
  * and a hash-gated oracle can verify frame features analytically.
  *
  * Scope: C444 planar frames (full-resolution Y, U, V planes) AND the
  * format's default C420 family (C420 / C420jpeg / C420mpeg2 /
  * C420paldv — quarter-resolution chroma planes, even dims required;
  * the chroma-siting suffixes differ only in sample positioning, not
  * byte layout). Anything else — wrong magic, missing/invalid W/H,
  * unsupported chroma, odd dims under 420, a frame marker that isn't
  * `FRAME`, a trailing partial frame — returns None: corrupt payloads
  * surface as in-band misses, never task failures. All size arithmetic
  * runs in Long (the decodeBmp24 r12 lesson).
  *
  * Scale shape: [[DecodedY4m]] keeps the raw buffer + per-frame offsets
  * and computes plane sums IN PLACE — no per-frame allocation, so a
  * frame-sampling operator streams through a clip without materializing
  * frames (the `mapInPandas` batch discipline, minus the copy).
  */
object VideoCodec {

  /** Decoded clip: dims, chroma mode, the raw buffer, and each frame's
    * pixel-data offset (Y plane w·h bytes, then U and V planes — w·h
    * each for C444, (w/2)·(h/2) each for the C420 family). */
  final case class DecodedY4m(w: Int, h: Int, c420: Boolean,
                              data: Array[Byte],
                              frameOffsets: Array[Int]) {
    def nFrames: Int = frameOffsets.length

    private def chromaPlane: Int = if (c420) (w / 2) * (h / 2) else w * h

    /** Exact-integer per-plane sums of frame `f`, computed in place. */
    def planeSums(f: Int): (Long, Long, Long) = {
      val plane = w * h
      val cp = chromaPlane
      val base = frameOffsets(f)
      var sy = 0L
      var i = 0
      while (i < plane) { sy += data(base + i) & 0xff; i += 1 }
      var su = 0L; var sv = 0L
      i = 0
      while (i < cp) {
        su += data(base + plane + i) & 0xff
        sv += data(base + plane + cp + i) & 0xff
        i += 1
      }
      (sy, su, sv)
    }
  }

  /** Encode a C444 clip; `pix(f, p)` returns the (y, u, v) triple for
    * pixel index p (row-major) of frame f. */
  def encodeY4m(w: Int, h: Int, frames: Int,
                pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0 && frames >= 0, s"bad dims: ${w}x$h x$frames")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val planeL = w.toLong * h
    val totalL = header.length +
      frames.toLong * (marker.length + 3L * planeL)
    require(totalL <= Int.MaxValue,
      s"encoded clip exceeds 2 GiB: ${w}x$h x$frames = $totalL bytes")
    val plane = planeL.toInt
    val out = new Array[Byte](totalL.toInt)
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var f = 0
    while (f < frames) {
      System.arraycopy(marker, 0, out, off, marker.length)
      off += marker.length
      var p = 0
      while (p < plane) {
        val (y, u, v) = pix(f, p)
        out(off + p) = (y & 0xff).toByte
        out(off + plane + p) = (u & 0xff).toByte
        out(off + 2 * plane + p) = (v & 0xff).toByte
        p += 1
      }
      off += 3 * plane
      f += 1
    }
    out
  }

  /** Encode a C420jpeg clip (even dims): `lum(f, p)` over w·h luma
    * pixels, `chrU`/`chrV(f, q)` over the (w/2)·(h/2) chroma grid. */
  def encodeY4m420(w: Int, h: Int, frames: Int,
                   lum: (Int, Int) => Int,
                   chrU: (Int, Int) => Int,
                   chrV: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames >= 0, s"bad dims: ${w}x$h x$frames")
    require((w & 1) == 0 && (h & 1) == 0, s"C420 needs even dims: ${w}x$h")
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val planeL = w.toLong * h
    val cpL = (w / 2).toLong * (h / 2)
    val totalL = header.length +
      frames.toLong * (marker.length + planeL + 2L * cpL)
    require(totalL <= Int.MaxValue,
      s"encoded clip exceeds 2 GiB: ${w}x$h x$frames = $totalL bytes")
    val plane = planeL.toInt
    val cp = cpL.toInt
    val out = new Array[Byte](totalL.toInt)
    System.arraycopy(header, 0, out, 0, header.length)
    var off = header.length
    var f = 0
    while (f < frames) {
      System.arraycopy(marker, 0, out, off, marker.length)
      off += marker.length
      var p = 0
      while (p < plane) { out(off + p) = (lum(f, p) & 0xff).toByte; p += 1 }
      var q = 0
      while (q < cp) {
        out(off + plane + q) = (chrU(f, q) & 0xff).toByte
        out(off + plane + cp + q) = (chrV(f, q) & 0xff).toByte
        q += 1
      }
      off += plane + 2 * cp
      f += 1
    }
    out
  }

  private val Magic = "YUV4MPEG2"

  /** Decode a C444 Y4M clip. None for anything malformed — in-band
    * miss, never a throw. */
  def decodeY4m(bytes: Array[Byte]): Option[DecodedY4m] = {
    if (bytes == null || bytes.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (bytes(i) != Magic.charAt(i)) return None
      i += 1
    }
    // header line: ASCII up to \n, bounded (spec headers are short)
    val hEnd = {
      var j = Magic.length
      val bound = math.min(bytes.length, 256)
      while (j < bound && bytes(j) != '\n') j += 1
      if (j >= bound || bytes(j) != '\n') return None
      j
    }
    val params = new String(bytes, Magic.length, hEnd - Magic.length,
      java.nio.charset.StandardCharsets.US_ASCII)
      .split(" ").filter(_.nonEmpty)
    def intParam(tag: Char): Long = params.collectFirst {
      case p if p.length > 1 && p.charAt(0) == tag &&
        p.drop(1).forall(_.isDigit) && p.length <= 10 =>
        p.drop(1).toLong
    }.getOrElse(-1L)
    val w = intParam('W')
    val h = intParam('H')
    // chroma defaults to 420 per spec — an ABSENT C tag means C420
    val c420Tags = Set("C420", "C420jpeg", "C420mpeg2", "C420paldv")
    val is444 = params.contains("C444")
    val is420 = params.exists(c420Tags.contains) ||
      !params.exists(p => p.nonEmpty && p.charAt(0) == 'C')
    if (!is444 && !is420) return None
    if (w <= 0 || h <= 0 || w > bytes.length || h > bytes.length) return None
    // 420 halves chroma dims — quarter planes only tile evenly for
    // even luma dims; odd-dim 420 is out of scope, in-band
    if (is420 && ((w & 1L) == 1L || (h & 1L) == 1L)) return None
    // Long math: each factor is individually bounded by the payload
    // length, so the products below cannot wrap; a zero-frame clip is
    // VALID (header only), so the per-frame bound is checked inside the
    // walk, not up front
    val plane = w * h
    val frameBytes =
      if (is444) 3L * plane else plane + 2L * ((w / 2) * (h / 2))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    var off = hEnd + 1L
    while (off < bytes.length) {
      // frame marker: "FRAME" + optional params, newline-terminated
      if (off + 6 > bytes.length) return None
      val fm = "FRAME"
      var k = 0
      while (k < 5) {
        if (bytes((off + k).toInt) != fm.charAt(k)) return None
        k += 1
      }
      var j = off + 5
      val bound = math.min(bytes.length.toLong, j + 256)
      while (j < bound && bytes(j.toInt) != '\n') j += 1
      if (j >= bound || bytes(j.toInt) != '\n') return None
      val dataOff = j + 1
      if (dataOff + frameBytes > bytes.length) return None // partial frame
      offsets += dataOff.toInt
      off = dataOff + frameBytes
    }
    Some(DecodedY4m(w.toInt, h.toInt, !is444, bytes, offsets.toArray))
  }
}
