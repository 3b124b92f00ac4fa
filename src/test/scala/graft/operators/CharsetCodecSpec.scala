package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts for charset sniffing: BOM dispatch, the RFC
  * 3629 validation walk's exact reject set, the latin-1 fallback, and
  * the torn taxonomy. */
class CharsetCodecSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8
  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def sniff(b: Array[Byte]) = CharsetCodec.sniff(b)

  test("BOM dispatch and decode roundtrip in all five classes") {
    val t = "hello wire text"
    assert(sniff(bytes(0xef, 0xbb, 0xbf) ++ t.getBytes(utf8))
      .contains(SniffedText("utf-8-bom", t)))
    assert(sniff(bytes(0xff, 0xfe) ++
      t.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
      .contains(SniffedText("utf-16le", t)))
    assert(sniff(bytes(0xfe, 0xff) ++
      t.getBytes(java.nio.charset.StandardCharsets.UTF_16BE))
      .contains(SniffedText("utf-16be", t)))
    assert(sniff(t.getBytes(utf8)).contains(SniffedText("utf-8", t)))
    // multi-byte UTF-8 without BOM still labels utf-8
    assert(sniff("héllo".getBytes(utf8))
      .contains(SniffedText("utf-8", "héllo")))
    // invalid UTF-8 falls back to latin-1, byte-per-char
    assert(sniff("abc".getBytes(utf8) ++ bytes(0xe9, 0x20))
      .contains(SniffedText("latin-1", "abcé ")))
    // empty input is valid empty UTF-8
    assert(sniff(Array.emptyByteArray)
      .contains(SniffedText("utf-8", "")))
    assert(sniff(null).isEmpty)
  }

  test("RFC 3629 validation walk rejects exactly the spec's reject set") {
    import CharsetCodec.validUtf8
    def v(xs: Int*): Boolean = validUtf8(bytes(xs: _*), 0)
    assert(v(0x41, 0x7f))                     // ASCII
    assert(v(0xc2, 0x80))                     // min 2-byte
    assert(v(0xdf, 0xbf))                     // max 2-byte
    assert(v(0xe0, 0xa0, 0x80))               // min 3-byte
    assert(v(0xed, 0x9f, 0xbf))               // just below surrogates
    assert(v(0xee, 0x80, 0x80))               // just above surrogates
    assert(v(0xf0, 0x90, 0x80, 0x80))         // min 4-byte (U+10000)
    assert(v(0xf4, 0x8f, 0xbf, 0xbf))         // U+10FFFF
    assert(!v(0x80))                          // bare continuation
    assert(!v(0xc0, 0xaf))                    // overlong 2-byte
    assert(!v(0xc1, 0xbf))                    // overlong 2-byte
    assert(!v(0xe0, 0x9f, 0xbf))              // overlong 3-byte
    assert(!v(0xed, 0xa0, 0x80))              // surrogate D800
    assert(!v(0xf0, 0x8f, 0xbf, 0xbf))        // overlong 4-byte
    assert(!v(0xf4, 0x90, 0x80, 0x80))        // past U+10FFFF
    assert(!v(0xf5, 0x80, 0x80, 0x80))        // F5 never valid
    assert(!v(0xc2))                          // truncated 2-byte
    assert(!v(0xe0, 0xa0))                    // truncated 3-byte
    assert(!v(0xf0, 0x90, 0x80))              // truncated 4-byte
    assert(!v(0xc2, 0x41))                    // non-continuation tail
  }

  test("structural violations miss in-band: lying BOM, torn UTF-16") {
    // UTF-8 BOM over invalid bytes
    assert(sniff(bytes(0xef, 0xbb, 0xbf, 0xc0, 0xaf)).isEmpty)
    // torn UTF-16 (odd byte count after BOM), both endians
    val le = bytes(0xff, 0xfe) ++
      "ab".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    assert(sniff(le.take(le.length - 1)).isEmpty)
    val be = bytes(0xfe, 0xff) ++
      "ab".getBytes(java.nio.charset.StandardCharsets.UTF_16BE)
    assert(sniff(be.take(be.length - 1)).isEmpty)
    // a lone FF (not a BOM pair) is invalid UTF-8 -> latin-1, not torn
    assert(sniff(bytes(0xff)).exists(_.charset == "latin-1"))
  }
}
