package graft.operators

/** Parsed facts from an MPEG-1 Layer III frame-header walk — the
  * wire-audio analog of [[TiffMeta]]/JPEG mm19: everything here is
  * fixed by the encoder's header bytes, no payload decode.
  * `minBitrateKbps == maxBitrateKbps` ⟺ CBR. `durationMs` is the
  * exact integer `nFrames · 1152 · 1000 / sampleRate` (truncating —
  * both engines replay the same division). */
case class Mp3Profile(nFrames: Int, sampleRate: Int, minBitrateKbps: Int,
                      maxBitrateKbps: Int, channelMode: Int,
                      durationMs: Long, hasId3: Boolean, hasCrc: Boolean)

/** Parsed facts from an ADTS (AAC transport) header walk. Duration is
  * `totalBlocks · 1024 · 1000 / sampleRate` — 1024 PCM samples per raw
  * data block, `number_of_raw_data_blocks + 1` blocks per frame. */
case class AdtsProfile(nFrames: Int, sampleRate: Int, profile: Int,
                       channels: Int, durationMs: Long, hasCrc: Boolean)

/** Pure-JVM MP3 (MPEG-1 Layer III) and ADTS (AAC) frame-header
  * walkers + deterministic writers — the dominant wire-audio formats
  * (WAV, the only previously gated audio container, is the RAW
  * interchange shape; crawled audio is overwhelmingly MP3/AAC).
  *
  * Specs: ISO/IEC 11172-3 §2.4.1.3 (MP3 header fields, bitrate and
  * sample-rate tables), ISO/IEC 13818-7 §6.2 (ADTS fixed+variable
  * header). Both walks are O(n_frames) byte arithmetic over the
  * header chain — sync word, table lookups, frame-length hop — the
  * payload (huffman / spectral data) is NEVER decoded, per the mm15
  * design rule: profiling a 100 MB asset costs the header chain only.
  *
  * Corrupt taxonomy IN-BAND (None, never thrown), the
  * TiffCodec/GifCodec discipline: torn header, lost sync mid-stream,
  * reserved version/layer/bitrate/sample-rate/emphasis codes,
  * free-format bitrate (0 — length not derivable from the header, so
  * the walk cannot continue honestly), truncated final frame, ID3v2
  * size past EOF, zero frames. NOT corrupt: a trailing 128-byte ID3v1
  * "TAG" block (ubiquitous in crawled MP3s — ends the walk cleanly)
  * and an ID3v2 footer (flag bit 4 — the leading hop skips it).
  */
object Mp3Codec {

  /** MPEG-1 Layer III bitrate table, kbps, index 1–14 (0 = free
    * format, 15 = forbidden — both resolve None). */
  private val BitrateL3 = Array(-1, 32, 40, 48, 56, 64, 80, 96, 112,
    128, 160, 192, 224, 256, 320, -1)

  /** MPEG-1 sample-rate table (index 3 reserved). */
  private val SampleRates = Array(44100, 48000, 32000, -1)

  private def u8(b: Array[Byte], at: Int): Int = b(at) & 0xff

  /** Walk the whole frame chain. None on any structural violation. */
  def mp3Walk(bytes: Array[Byte]): Option[Mp3Profile] = {
    if (bytes == null || bytes.length < 4) return None
    var off = 0
    var hasId3 = false
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      // ID3v2: 10-byte header, 28-bit synchsafe size (7 bits/byte)
      val size = (u8(bytes, 6) << 21) | (u8(bytes, 7) << 14) |
        (u8(bytes, 8) << 7) | u8(bytes, 9)
      if ((u8(bytes, 6) | u8(bytes, 7) | u8(bytes, 8) | u8(bytes, 9))
          >= 0x80) return None // synchsafe bytes must have bit 7 clear
      // footer flag (v2.4 §3.1, bit 4): the size field excludes the
      // 10-byte trailer copy of the header, so hop it too
      off = 10 + size + (if ((u8(bytes, 5) & 0x10) != 0) 10 else 0)
      if (off >= bytes.length) return None
      hasId3 = true
    }
    var nFrames = 0
    var sampleRate = -1
    var minBr = Int.MaxValue
    var maxBr = -1
    var channelMode = -1
    var hasCrc = false
    while (off < bytes.length) {
      // ID3v1 trailer: exactly 128 "TAG"-led bytes at EOF (extremely
      // common in crawled MP3s) is metadata, not lost sync — end the
      // walk, don't corrupt-classify the file
      if (bytes.length - off == 128 && bytes(off) == 'T' &&
          bytes(off + 1) == 'A' && bytes(off + 2) == 'G')
        return finishMp3(nFrames, sampleRate, minBr, maxBr, channelMode,
          hasId3, hasCrc)
      if (off + 4 > bytes.length) return None // torn header
      if (u8(bytes, off) != 0xff ||
        (u8(bytes, off + 1) & 0xe0) != 0xe0) return None // lost sync
      val b1 = u8(bytes, off + 1)
      if (((b1 >> 3) & 3) != 3) return None // not MPEG-1 (2/2.5/resvd)
      if (((b1 >> 1) & 3) != 1) return None // not Layer III
      val crc = (b1 & 1) == 0
      val b2 = u8(bytes, off + 2)
      val br = BitrateL3((b2 >> 4) & 0xf)
      if (br < 0) return None // free format / forbidden
      val sr = SampleRates((b2 >> 2) & 3)
      if (sr < 0) return None // reserved sample-rate index
      val padding = (b2 >> 1) & 1
      val b3 = u8(bytes, off + 3)
      val mode = (b3 >> 6) & 3
      if ((b3 & 3) == 2) return None // reserved emphasis
      if (nFrames == 0) { sampleRate = sr; channelMode = mode }
      else if (sr != sampleRate || mode != channelMode)
        return None // mid-stream format switch = alien/corrupt
      val frameLen = 144 * br * 1000 / sr + padding
      if (frameLen < 4 || off + frameLen > bytes.length)
        return None // truncated final frame
      minBr = math.min(minBr, br); maxBr = math.max(maxBr, br)
      hasCrc = hasCrc || crc
      nFrames += 1
      off += frameLen
    }
    finishMp3(nFrames, sampleRate, minBr, maxBr, channelMode, hasId3,
      hasCrc)
  }

  private def finishMp3(nFrames: Int, sampleRate: Int, minBr: Int,
      maxBr: Int, channelMode: Int, hasId3: Boolean,
      hasCrc: Boolean): Option[Mp3Profile] =
    if (nFrames == 0) None
    else Some(Mp3Profile(nFrames, sampleRate, minBr, maxBr, channelMode,
      nFrames.toLong * 1152L * 1000L / sampleRate, hasId3, hasCrc))

  /** Deterministic MP3 writer for the synthetic corpus: `brIdx(i)`
    * picks each frame's bitrate index (1–14), `padBit(i)` its padding
    * bit. Payload bytes are a fixed id-free fill — the walk never
    * reads them. */
  def encodeMp3(nFrames: Int, srIdx: Int, mode: Int, withCrc: Boolean,
                id3Size: Int, brIdx: Int => Int,
                padBit: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (id3Size >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0) // v2.3, no flags
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size))
    }
    val sr = SampleRates(srIdx)
    for (i <- 0 until nFrames) {
      val br = BitrateL3(brIdx(i))
      val pad = padBit(i) & 1
      val frameLen = 144 * br * 1000 / sr + pad
      out.write(0xff)
      out.write(0xe0 | (3 << 3) | (1 << 1) | (if (withCrc) 0 else 1))
      out.write((brIdx(i) << 4) | (srIdx << 2) | (pad << 1))
      out.write(mode << 6) // emphasis 0, original/copyright 0
      out.write(new Array[Byte](frameLen - 4))
    }
    out.toByteArray
  }

  /** ID3v2.3 text frames (the metadata layer crawled MP3s actually
    * carry): returns frameId → text for every ISO-8859-1 text frame
    * in the tag ("TIT2" title, "TPE1" artist, "TALB" album, …);
    * user-defined TXXX frames carry their own description/value
    * layout and come back keyed "TXXX:<description>".
    * None when the tag is absent, alien, or STRUCTURALLY torn (a
    * frame size running past the tag boundary) — never a partial
    * read. Non-latin encodings (UTF-16 etc.) are spec-valid but
    * skipped (counted by the caller via map size vs profile needs);
    * padding (a zero where a frame id should start) ends the walk
    * per spec §3. Only the 10 + size tag bytes are touched. */
  def id3TextFrames(bytes: Array[Byte]): Option[Map[String, String]] = {
    if (bytes == null || bytes.length < 10) return None
    if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'))
      return None
    if (u8(bytes, 3) != 3) return None // v2.3 only (the wire majority)
    if ((u8(bytes, 6) | u8(bytes, 7) | u8(bytes, 8) | u8(bytes, 9))
        >= 0x80) return None // synchsafe violation
    val size = (u8(bytes, 6) << 21) | (u8(bytes, 7) << 14) |
      (u8(bytes, 8) << 7) | u8(bytes, 9)
    val end = 10 + size
    if (end > bytes.length) return None // torn tag
    var off = 10
    val out = Map.newBuilder[String, String]
    while (off < end) {
      if (bytes(off) == 0) return Some(out.result()) // padding
      if (off + 10 > end) return None // torn frame header
      val id = new String(bytes, off, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (!id.forall(c => (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')))
        return None // alien frame id
      val fsize = (u8(bytes, off + 4) << 24) | (u8(bytes, off + 5) << 16) |
        (u8(bytes, off + 6) << 8) | u8(bytes, off + 7)
      if (fsize < 1 || off + 10 + fsize > end) return None // overrun
      if (id == "TXXX" && u8(bytes, off + 10) == 0) {
        // user-defined text (§4.2.2): encoding byte, NUL-terminated
        // description, then the value — NOT the plain-text layout, so
        // it needs its own split; keyed "TXXX:<description>" because
        // the spec allows many TXXX frames per tag
        val raw = new String(bytes, off + 11, fsize - 1,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val nul = raw.indexOf(0.toChar)
        if (nul < 0) return None // description never terminates: torn
        out += s"TXXX:${raw.substring(0, nul)}" ->
          raw.substring(nul + 1).takeWhile(_ != 0.toChar)
      } else if (id.startsWith("T") && u8(bytes, off + 10) == 0) {
        // ISO-8859-1 text frame; text may be NUL-terminated
        val raw = new String(bytes, off + 11, fsize - 1,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        out += id -> raw.takeWhile(_ != 0.toChar)
      }
      off += 10 + fsize
    }
    Some(out.result())
  }

  /** Deterministic ID3v2.3 writer for the synthetic corpus: ISO-8859-1
    * text frames + `pad` padding bytes. */
  def encodeId3(frames: Seq[(String, String)], pad: Int): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    for ((id, text) <- frames) {
      val t = text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      body.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val fsize = t.length + 1
      body.write((fsize >> 24) & 0xff); body.write((fsize >> 16) & 0xff)
      body.write((fsize >> 8) & 0xff); body.write(fsize & 0xff)
      body.write(0); body.write(0) // frame flags
      body.write(0) // ISO-8859-1 encoding byte
      body.write(t)
    }
    body.write(new Array[Byte](pad))
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0)
    out.write((b.length >> 21) & 0x7f); out.write((b.length >> 14) & 0x7f)
    out.write((b.length >> 7) & 0x7f); out.write(b.length & 0x7f)
    out.write(b)
    out.toByteArray
  }

  /** ADTS sampling-frequency table (index ≥ 13 reserved). */
  private val AdtsRates = Array(96000, 88200, 64000, 48000, 44100,
    32000, 24000, 22050, 16000, 12000, 11025, 8000, 7350, -1, -1, -1)

  /** Walk an ADTS frame chain. None on any structural violation:
    * torn/lost sync, layer ≠ 0, reserved sampling index, frame length
    * shorter than its own header, truncated final frame, mid-stream
    * format switch. */
  def adtsWalk(bytes: Array[Byte]): Option[AdtsProfile] = {
    if (bytes == null || bytes.length < 7) return None
    var off = 0
    var nFrames = 0
    var sampleRate = -1
    var profile = -1
    var channels = -1
    var hasCrc = false
    var totalBlocks = 0L
    while (off < bytes.length) {
      if (off + 7 > bytes.length) return None
      if (u8(bytes, off) != 0xff ||
        (u8(bytes, off + 1) & 0xf0) != 0xf0) return None // sync 0xFFF
      val b1 = u8(bytes, off + 1)
      if (((b1 >> 1) & 3) != 0) return None // layer must be 00
      val crcAbsent = b1 & 1
      val b2 = u8(bytes, off + 2)
      val prof = (b2 >> 6) & 3
      val sfi = (b2 >> 2) & 0xf
      val sr = AdtsRates(sfi)
      if (sr < 0) return None
      val chan = ((b2 & 1) << 2) | ((u8(bytes, off + 3) >> 6) & 3)
      val frameLen = ((u8(bytes, off + 3) & 3) << 11) |
        (u8(bytes, off + 4) << 3) | ((u8(bytes, off + 5) >> 5) & 7)
      val blocks = (u8(bytes, off + 6) & 3) + 1
      val headerLen = if (crcAbsent == 1) 7 else 9
      if (frameLen < headerLen || off + frameLen > bytes.length)
        return None
      if (nFrames == 0) { sampleRate = sr; profile = prof; channels = chan }
      else if (sr != sampleRate || prof != profile || chan != channels)
        return None
      hasCrc = hasCrc || crcAbsent == 0
      totalBlocks += blocks
      nFrames += 1
      off += frameLen
    }
    if (nFrames == 0) None
    else Some(AdtsProfile(nFrames, sampleRate, profile, channels,
      totalBlocks * 1024L * 1000L / sampleRate, hasCrc))
  }

  /** Deterministic ADTS writer: `payloadLen(i)` sizes each frame's raw
    * data beyond the header. */
  def encodeAdts(nFrames: Int, sfi: Int, profile: Int, channels: Int,
                 withCrc: Boolean, payloadLen: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val headerLen = if (withCrc) 9 else 7
    for (i <- 0 until nFrames) {
      val frameLen = headerLen + payloadLen(i)
      out.write(0xff)
      out.write(0xf0 | (if (withCrc) 0 else 1)) // MPEG-4, layer 00
      out.write((profile << 6) | (sfi << 2) | ((channels >> 2) & 1))
      out.write(((channels & 3) << 6) | ((frameLen >> 11) & 3))
      out.write((frameLen >> 3) & 0xff)
      out.write(((frameLen & 7) << 5) | 0x1f) // buffer fullness high
      out.write(0xfc) // fullness low 6 bits, 1 raw block (00)
      if (withCrc) { out.write(0); out.write(0) }
      out.write(new Array[Byte](payloadLen(i)))
    }
    out.toByteArray
  }
}
