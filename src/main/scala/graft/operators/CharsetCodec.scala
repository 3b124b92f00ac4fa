package graft.operators

/** Sniffed wire-text facts: the detected charset label and the
  * decoded text (JVM String, i.e. the UTF-8-normalizable form). */
case class SniffedText(charset: String, text: String)

/** Pure-JVM charset sniffing + transcode for crawled wire text — the
  * normalization step every text operator in this engine assumes has
  * already happened (tokenizers, shingles, language ID all key on
  * UTF-8 strings), but real crawl payloads arrive as UTF-8 with and
  * without BOM, UTF-16 both endiannesses, and single-byte legacy
  * bytes. The sniff is deterministic byte arithmetic, no heuristics
  * that could drift between runs:
  *
  *   1. BOM EF BB BF → "utf-8-bom": strip, then the full RFC 3629
  *      validation walk must pass (a BOM claiming UTF-8 over invalid
  *      bytes is a torn/corrupt asset, None in-band)
  *   2. BOM FF FE → "utf-16le", FE FF → "utf-16be": strip; an ODD
  *      remaining byte count is torn (None)
  *   3. no BOM, full RFC 3629 validation walk passes → "utf-8"
  *      (pure ASCII is valid UTF-8 and labels as such)
  *   4. otherwise → "latin-1": every byte maps 1:1 to U+00..U+FF, so
  *      decoding cannot fail — the deterministic legacy fallback
  *      (a production deployment slots a statistical detector between
  *      3 and 4 behind the same seam; the fallback keeps the lane
  *      engine-replayable)
  *
  * The validation walk rejects exactly what RFC 3629 rejects:
  * continuation-byte leads, overlong encodings (C0/C1 and the E0/F0
  * low ranges), UTF-16 surrogates (ED A0..BF), codepoints past
  * U+10FFFF (F4 90.. and F5..FF), and truncated sequences.
  */
object CharsetCodec {

  private def cont(b: Array[Byte], i: Int): Boolean =
    i < b.length && (b(i) & 0xc0) == 0x80

  /** RFC 3629 validation from `from` to end. */
  private[operators] def validUtf8(b: Array[Byte], from: Int): Boolean = {
    var i = from
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation lead / overlong C0-C1
      else if (c < 0xe0) {
        if (!cont(b, i + 1)) return false
        i += 2
      } else if (c < 0xf0) {
        if (!cont(b, i + 1) || !cont(b, i + 2)) return false
        val c1 = b(i + 1) & 0xff
        if (c == 0xe0 && c1 < 0xa0) return false // overlong
        if (c == 0xed && c1 >= 0xa0) return false // surrogate
        i += 3
      } else if (c < 0xf5) {
        if (!cont(b, i + 1) || !cont(b, i + 2) || !cont(b, i + 3))
          return false
        val c1 = b(i + 1) & 0xff
        if (c == 0xf0 && c1 < 0x90) return false // overlong
        if (c == 0xf4 && c1 >= 0x90) return false // past U+10FFFF
        i += 4
      } else return false // F5..FF never valid
    }
    true
  }

  /** Sniff + decode. None on structural violations only (a lying
    * UTF-8 BOM, torn UTF-16); the latin-1 fallback makes BOM-less
    * non-UTF-8 bytes always decodable. */
  def sniff(bytes: Array[Byte]): Option[SniffedText] = {
    if (bytes == null) return None
    val n = bytes.length
    if (n >= 3 && (bytes(0) & 0xff) == 0xef && (bytes(1) & 0xff) == 0xbb &&
        (bytes(2) & 0xff) == 0xbf) {
      if (!validUtf8(bytes, 3)) return None // BOM lies
      Some(SniffedText("utf-8-bom", new String(bytes, 3, n - 3,
        java.nio.charset.StandardCharsets.UTF_8)))
    } else if (n >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xfe) {
      if ((n - 2) % 2 != 0) return None // torn code unit
      Some(SniffedText("utf-16le", new String(bytes, 2, n - 2,
        java.nio.charset.StandardCharsets.UTF_16LE)))
    } else if (n >= 2 && (bytes(0) & 0xff) == 0xfe &&
        (bytes(1) & 0xff) == 0xff) {
      if ((n - 2) % 2 != 0) return None
      Some(SniffedText("utf-16be", new String(bytes, 2, n - 2,
        java.nio.charset.StandardCharsets.UTF_16BE)))
    } else if (validUtf8(bytes, 0)) {
      Some(SniffedText("utf-8", new String(bytes,
        java.nio.charset.StandardCharsets.UTF_8)))
    } else {
      Some(SniffedText("latin-1", new String(bytes,
        java.nio.charset.StandardCharsets.ISO_8859_1)))
    }
  }
}
