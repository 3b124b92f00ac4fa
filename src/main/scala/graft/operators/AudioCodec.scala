package graft.operators

/** Pure-JVM PCM WAV codec — the audio twin of [[ImageCodec]]'s BMP
  * kernel, giving [[MultimodalOps.decodeAudioFeatures]] a REAL
  * container parse (RIFF chunk walk, little-endian headers, 16-bit
  * signed samples) under the same determinism contract: the same bytes
  * decode identically on any executor, any JVM, any round, so a
  * hash-gated oracle can verify the decode analytically.
  *
  * Scope: mono, 16-bit, uncompressed PCM (audioFormat 1) — the
  * canonical interchange shape. Anything else (wrong magic, truncated
  * header, compressed formats, multi-channel, odd bit depths, data
  * chunk longer than the payload) returns None so corrupt payloads
  * surface as in-band misses, never task failures. All size arithmetic
  * runs in Long — a crafted chunk length must fail the bounds check,
  * not wrap it (the decodeBmp24 r12 lesson).
  */
object AudioCodec {

  /** Decoded clip: sample rate and the signed 16-bit samples. */
  final case class DecodedAudio(sampleRate: Int, samples: Array[Short])

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

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b(off) == t.charAt(0) && b(off + 1) == t.charAt(1) &&
      b(off + 2) == t.charAt(2) && b(off + 3) == t.charAt(3)

  private def putTag(b: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = t.charAt(i).toByte; i += 1 }
  }

  /** Encode mono 16-bit PCM as a canonical 44-byte-header WAV. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && sampleRate <= Int.MaxValue / 2,
      s"bad sample rate: $sampleRate")
    val dataSizeL = samples.length.toLong * 2
    require(44 + dataSizeL <= Int.MaxValue,
      s"encoded clip exceeds 2 GiB: ${samples.length} samples")
    val dataSize = dataSizeL.toInt
    val out = new Array[Byte](44 + dataSize)
    putTag(out, 0, "RIFF"); putI32(out, 4, 36 + dataSize)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putI32(out, 16, 16)
    putU16(out, 20, 1)            // PCM
    putU16(out, 22, 1)            // mono
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate * 2) // byte rate
    putU16(out, 32, 2)            // block align
    putU16(out, 34, 16)           // bits per sample
    putTag(out, 36, "data"); putI32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode mono 16-bit PCM WAV via a proper RIFF chunk walk (extra
    * chunks between fmt and data are skipped, odd chunk sizes padded
    * per the spec). Returns None for anything that isn't exactly this
    * format — in-band miss, never a throw.
    */
  def decodeWavPcm16(bytes: Array[Byte]): Option[DecodedAudio] = {
    if (bytes == null || bytes.length < 44 ||
      !tag(bytes, 0, "RIFF") || !tag(bytes, 8, "WAVE")) return None
    val len = bytes.length.toLong
    var off = 12L
    var sampleRate = -1
    var fmtOk = false
    var dataOff = -1L
    var dataSize = -1L
    while (off + 8 <= len && (!fmtOk || dataOff < 0)) {
      val id = off.toInt
      val size = i32(bytes, id + 4).toLong & 0xffffffffL // u32, Long math
      val body = off + 8
      if (body + size > len) return None
      if (tag(bytes, id, "fmt ")) {
        if (size < 16) return None
        fmtOk = u16(bytes, (body).toInt) == 1 &&       // PCM
          u16(bytes, (body + 2).toInt) == 1 &&          // mono
          u16(bytes, (body + 14).toInt) == 16           // 16-bit
        if (!fmtOk) return None
        sampleRate = i32(bytes, (body + 4).toInt)
        if (sampleRate <= 0) return None
      } else if (tag(bytes, id, "data")) {
        dataOff = body; dataSize = size
      }
      off = body + size + (size & 1L) // RIFF chunks pad to even
    }
    if (!fmtOk || dataOff < 0 || (dataSize & 1L) == 1L) return None
    val n = (dataSize / 2).toInt
    val samples = new Array[Short](n)
    var i = 0
    val base = dataOff.toInt
    while (i < n) {
      samples(i) = u16(bytes, base + 2 * i).toShort
      i += 1
    }
    Some(DecodedAudio(sampleRate, samples))
  }

  /** Exact-integer features of a decoded clip: sample count, sum of
    * absolute amplitudes, and peak — oracle-replayable decode evidence
    * (an endianness or chunk-walk bug shifts the sum immediately). */
  def amplitudeStats(a: DecodedAudio): (Long, Long, Long) = {
    var sumAbs = 0L; var maxAbs = 0L
    var i = 0
    while (i < a.samples.length) {
      val v = math.abs(a.samples(i).toLong)
      sumAbs += v; if (v > maxAbs) maxAbs = v
      i += 1
    }
    (a.samples.length.toLong, sumAbs, maxAbs)
  }
}
