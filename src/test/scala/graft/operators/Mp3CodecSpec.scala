package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts for the MP3/ADTS header walks: writer→walker
  * roundtrip across the parameter space, every corrupt-taxonomy class
  * resolving None in-band, and the exact integer duration rule. */
class Mp3CodecSpec extends AnyFunSuite {

  test("mp3 roundtrip: CBR, VBR envelope, padding, CRC, ID3 skip, duration") {
    // CBR, no tag, no CRC
    val cbr = Mp3Codec.encodeMp3(4, srIdx = 0, mode = 1, withCrc = false,
      id3Size = -1, brIdx = _ => 9, padBit = _ => 0)
    val p = Mp3Codec.mp3Walk(cbr).get
    assert(p == Mp3Profile(4, 44100, 128, 128, 1,
      4L * 1152 * 1000 / 44100, hasId3 = false, hasCrc = false))
    // VBR + ID3 + CRC + per-frame padding
    val vbr = Mp3Codec.encodeMp3(5, srIdx = 2, mode = 3, withCrc = true,
      id3Size = 23, brIdx = i => 1 + (i * 5) % 14, padBit = i => i % 2)
    val q = Mp3Codec.mp3Walk(vbr).get
    assert(q.nFrames == 5 && q.sampleRate == 32000 && q.hasId3 && q.hasCrc)
    // brIdx 1,6,11,2,7 -> 32,80,192,40,96
    assert(q.minBitrateKbps == 32 && q.maxBitrateKbps == 192)
    assert(q.durationMs == 5L * 1152 * 1000 / 32000)
  }

  test("mp3 corrupt taxonomy is in-band: torn, lost sync, reserved codes, bad synchsafe, free format") {
    val good = Mp3Codec.encodeMp3(3, 1, 0, withCrc = false, id3Size = -1,
      brIdx = _ => 5, padBit = _ => 0)
    assert(Mp3Codec.mp3Walk(null).isEmpty)
    assert(Mp3Codec.mp3Walk(Array[Byte](1, 2)).isEmpty)
    assert(Mp3Codec.mp3Walk(good.dropRight(3)).isEmpty) // torn final frame
    val lost = good.clone(); lost(0) = 0x00
    assert(Mp3Codec.mp3Walk(lost).isEmpty) // lost sync
    val v2 = good.clone(); v2(1) = (v2(1) & ~0x18).toByte
    assert(Mp3Codec.mp3Walk(v2).isEmpty) // non-MPEG1 version
    val badSr = good.clone(); badSr(2) = (badSr(2) | 0x0c).toByte
    assert(Mp3Codec.mp3Walk(badSr).isEmpty) // reserved sample rate
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Mp3Codec.mp3Walk(free).isEmpty) // free-format bitrate
    val emph = good.clone(); emph(3) = (emph(3) | 0x02).toByte
    assert(Mp3Codec.mp3Walk(emph).isEmpty) // reserved emphasis
    // ID3 size bytes must be synchsafe (bit 7 clear)
    val tagged = Mp3Codec.encodeMp3(2, 0, 0, withCrc = false, id3Size = 8,
      brIdx = _ => 3, padBit = _ => 0)
    val badTag = tagged.clone(); badTag(6) = 0x80.toByte
    assert(Mp3Codec.mp3Walk(badTag).isEmpty)
    // mid-stream format switch: two CBR streams at different rates
    val a = Mp3Codec.encodeMp3(1, 0, 0, withCrc = false, id3Size = -1,
      brIdx = _ => 3, padBit = _ => 0)
    val b = Mp3Codec.encodeMp3(1, 1, 0, withCrc = false, id3Size = -1,
      brIdx = _ => 3, padBit = _ => 0)
    assert(Mp3Codec.mp3Walk(a ++ b).isEmpty)
  }

  test("id3v2.3 text frames: roundtrip, padding stop, corrupt taxonomy in-band") {
    val tag = Mp3Codec.encodeId3(
      Seq("TIT2" -> "A Title", "TPE1" -> "Someone", "TALB" -> "An LP"),
      pad = 7)
    val m = Mp3Codec.id3TextFrames(tag).get
    assert(m == Map("TIT2" -> "A Title", "TPE1" -> "Someone",
      "TALB" -> "An LP"))
    // trailing audio bytes are never read past the tag boundary
    val audio = Mp3Codec.encodeMp3(1, 0, 0, withCrc = false,
      id3Size = -1, _ => 5, _ => 0)
    assert(Mp3Codec.id3TextFrames(tag ++ audio).contains(m))
    // tagless / alien / torn / overrun all miss in-band
    assert(Mp3Codec.id3TextFrames(null).isEmpty)
    assert(Mp3Codec.id3TextFrames(audio).isEmpty) // no tag
    val v4 = tag.clone(); v4(3) = 4
    assert(Mp3Codec.id3TextFrames(v4).isEmpty) // unsupported version
    assert(Mp3Codec.id3TextFrames(tag.dropRight(12)).isEmpty) // torn tag
    val overrun = tag.clone(); overrun(14) = 0x7f.toByte
    assert(Mp3Codec.id3TextFrames(overrun).isEmpty) // frame size overrun
    val alien = tag.clone(); alien(10) = 'x'.toByte
    assert(Mp3Codec.id3TextFrames(alien).isEmpty) // bad frame id
    // empty tag (pure padding) is a VALID zero-frame tag
    assert(Mp3Codec.id3TextFrames(Mp3Codec.encodeId3(Nil, pad = 16))
      .contains(Map.empty[String, String]))
  }

  test("adts roundtrip and corrupt taxonomy") {
    val ok = Mp3Codec.encodeAdts(3, sfi = 4, profile = 1, channels = 2,
      withCrc = false, payloadLen = i => 12 + i)
    val p = Mp3Codec.adtsWalk(ok).get
    assert(p == AdtsProfile(3, 44100, 1, 2,
      3L * 1024 * 1000 / 44100, hasCrc = false))
    val crc = Mp3Codec.encodeAdts(2, sfi = 11, profile = 3, channels = 6,
      withCrc = true, payloadLen = _ => 5)
    val q = Mp3Codec.adtsWalk(crc).get
    assert(q.sampleRate == 8000 && q.channels == 6 && q.hasCrc)
    assert(Mp3Codec.adtsWalk(null).isEmpty)
    assert(Mp3Codec.adtsWalk(ok.dropRight(3)).isEmpty) // torn
    val lost = ok.clone(); lost(0) = 0x12
    assert(Mp3Codec.adtsWalk(lost).isEmpty)
    val layer = ok.clone(); layer(1) = (layer(1) | 0x02).toByte
    assert(Mp3Codec.adtsWalk(layer).isEmpty) // layer != 00
    val badSfi = Mp3Codec.encodeAdts(1, sfi = 13, profile = 0,
      channels = 1, withCrc = false, payloadLen = _ => 4)
    assert(Mp3Codec.adtsWalk(badSfi).isEmpty) // reserved rate index
    // mid-stream switch
    val c1 = Mp3Codec.encodeAdts(1, sfi = 4, profile = 1, channels = 2,
      withCrc = false, payloadLen = _ => 4)
    val c2 = Mp3Codec.encodeAdts(1, sfi = 5, profile = 1, channels = 2,
      withCrc = false, payloadLen = _ => 4)
    assert(Mp3Codec.adtsWalk(c1 ++ c2).isEmpty)
  }

  test("trailing ID3v1 TAG block and ID3v2 footer are metadata, not corrupt") {
    val audio = Mp3Codec.encodeMp3(3, srIdx = 0, mode = 1,
      withCrc = false, id3Size = -1, brIdx = _ => 9, padBit = _ => 0)
    // 128-byte ID3v1 trailer: TAG + title/artist/album/year/comment
    val v1 = new Array[Byte](128)
    v1(0) = 'T'; v1(1) = 'A'; v1(2) = 'G'
    val p = Mp3Codec.mp3Walk(audio ++ v1).get
    assert(p.nFrames == 3 && !p.hasId3, "v1 trailer must end the walk")
    // a 128-byte non-TAG tail is still lost sync
    val junk = new Array[Byte](128)
    assert(Mp3Codec.mp3Walk(audio ++ junk).isEmpty)
    // a TAG block NOT at EOF (frames follow) is still lost sync
    assert(Mp3Codec.mp3Walk(audio ++ v1 ++ audio).isEmpty)
    // ID3v2 with footer flag: size excludes the 10-byte trailer copy
    val withFooter = {
      val out = new java.io.ByteArrayOutputStream()
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0x10) // v2.4, footer flag
      out.write(0); out.write(0); out.write(0); out.write(8)
      out.write(new Array[Byte](8))
      out.write('3'); out.write('D'); out.write('I') // footer header
      out.write(4); out.write(0); out.write(0x10)
      out.write(0); out.write(0); out.write(0); out.write(8)
      out.toByteArray ++ audio
    }
    val q = Mp3Codec.mp3Walk(withFooter).get
    assert(q.nFrames == 3 && q.hasId3, "footer hop missed the frames")
  }

  test("TXXX user-defined frames parse their description/value layout") {
    // hand-build a TXXX frame: encoding 0, desc NUL value
    def txxx(desc: String, value: String): Array[Byte] = {
      val body = (desc + "\u0000" + value).getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val out = new java.io.ByteArrayOutputStream()
      out.write("TXXX".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      val fsize = body.length + 1
      out.write((fsize >> 24) & 0xff); out.write((fsize >> 16) & 0xff)
      out.write((fsize >> 8) & 0xff); out.write(fsize & 0xff)
      out.write(0); out.write(0) // flags
      out.write(0) // ISO-8859-1
      out.write(body)
      out.toByteArray
    }
    // splice two TXXX frames plus a plain text frame into one tag
    val plain = Mp3Codec.encodeId3(Seq("TIT2" -> "Title"), pad = 0)
    val frames = plain.drop(10) ++ txxx("replaygain", "-3.1 dB") ++
      txxx("catalog", "X42")
    val out = new java.io.ByteArrayOutputStream()
    out.write('I'); out.write('D'); out.write('3')
    out.write(3); out.write(0); out.write(0)
    out.write((frames.length >> 21) & 0x7f)
    out.write((frames.length >> 14) & 0x7f)
    out.write((frames.length >> 7) & 0x7f)
    out.write(frames.length & 0x7f)
    out.write(frames)
    val m = Mp3Codec.id3TextFrames(out.toByteArray).get
    assert(m == Map("TIT2" -> "Title", "TXXX:replaygain" -> "-3.1 dB",
      "TXXX:catalog" -> "X42"), m.toString)
    // a TXXX whose description never NUL-terminates is torn
    val torn = {
      val body = "no-terminator".getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val o = new java.io.ByteArrayOutputStream()
      o.write("TXXX".getBytes(
        java.nio.charset.StandardCharsets.US_ASCII))
      val fsize = body.length + 1
      o.write((fsize >> 24) & 0xff); o.write((fsize >> 16) & 0xff)
      o.write((fsize >> 8) & 0xff); o.write(fsize & 0xff)
      o.write(0); o.write(0); o.write(0)
      o.write(body)
      val f = o.toByteArray
      val t = new java.io.ByteArrayOutputStream()
      t.write('I'); t.write('D'); t.write('3')
      t.write(3); t.write(0); t.write(0)
      t.write((f.length >> 21) & 0x7f); t.write((f.length >> 14) & 0x7f)
      t.write((f.length >> 7) & 0x7f); t.write(f.length & 0x7f)
      t.write(f)
      t.toByteArray
    }
    assert(Mp3Codec.id3TextFrames(torn).isEmpty)
  }
}
