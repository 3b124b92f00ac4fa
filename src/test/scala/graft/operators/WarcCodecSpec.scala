package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contracts for the WARC record walk: writer→walker
  * roundtrip, the type census, the response digest, and every
  * corrupt-taxonomy class resolving None in-band. */
class WarcCodecSpec extends AnyFunSuite {

  private val utf8 = java.nio.charset.StandardCharsets.UTF_8
  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def corpus(body: String) = Seq(
    ("warcinfo", null, "software: graft-synth 1.0".getBytes(utf8)),
    ("request", "http://h/p", "GET / HTTP/1.1\r\n\r\n".getBytes(utf8)),
    ("response", "http://h/p", body.getBytes(utf8)),
    ("metadata", "http://h/p", "fetchTimeMs: 42".getBytes(utf8)))

  test("roundtrip: census, payload octets, response md5") {
    val body = "HTTP/1.1 200 OK\r\n\r\nhello warc"
    val w = WarcCodec.encodeWarc(corpus(body))
    val p = WarcCodec.warcWalk(w).get
    assert(p.nRecords == 4 && p.nWarcinfo == 1 && p.nRequest == 1 &&
      p.nResponse == 1 && p.nMetadata == 1 && p.nOther == 0)
    assert(p.payloadBytes == 25 + 18 + body.length + 15)
    assert(p.responseMd5 == md5hex(body.getBytes(utf8)))
    // multiple responses digest in file order (concatenated stream)
    val two = WarcCodec.encodeWarc(Seq(
      ("response", "u", "ab".getBytes(utf8)),
      ("response", "u", "cd".getBytes(utf8))))
    assert(WarcCodec.warcWalk(two).get.responseMd5 ==
      md5hex("abcd".getBytes(utf8)))
    // WARC/1.1 also parses; unknown type counts as other
    val v11 = WarcCodec.encodeWarc(Seq(("revisit", "u", Array[Byte](1))))
    val w11 = new String(v11, utf8).replaceFirst("WARC/1\\.0", "WARC/1.1")
      .getBytes(utf8)
    val q = WarcCodec.warcWalk(w11).get
    assert(q.nRecords == 1 && q.nOther == 1 && q.responseMd5 == null)
    // empty payload is valid
    assert(WarcCodec.warcWalk(WarcCodec.encodeWarc(
      Seq(("response", "u", Array.emptyByteArray)))).get
      .payloadBytes == 0L)
  }

  test("responsePayloads: bytes in file order, same corrupt taxonomy") {
    val body = "HTTP/1.1 200 OK\r\n\r\npayload-one"
    val w = WarcCodec.encodeWarc(corpus(body))
    val ps = WarcCodec.responsePayloads(w).get
    assert(ps.map(new String(_, utf8)) == Seq(body))
    val two = WarcCodec.encodeWarc(Seq(
      ("response", "u", "first".getBytes(utf8)),
      ("metadata", "u", "skip".getBytes(utf8)),
      ("response", "u", "second".getBytes(utf8))))
    assert(WarcCodec.responsePayloads(two).get
      .map(new String(_, utf8)) == Seq("first", "second"))
    // no responses → empty seq INSIDE a successful parse
    val none = WarcCodec.encodeWarc(Seq(("metadata", "u",
      "m".getBytes(utf8))))
    assert(WarcCodec.responsePayloads(none).contains(Seq.empty))
    // same structural taxonomy as the profile walk
    assert(WarcCodec.responsePayloads(w.take(w.length - 3)).isEmpty)
    assert(WarcCodec.responsePayloads(null).isEmpty)
  }

  test("corrupt taxonomy is in-band: None, never thrown") {
    val good = WarcCodec.encodeWarc(corpus("body"))
    assert(WarcCodec.warcWalk(null).isEmpty)
    assert(WarcCodec.warcWalk(Array[Byte](1, 2, 3)).isEmpty)
    // torn record terminator (the synth id%13 class)
    assert(WarcCodec.warcWalk(good.take(good.length - 3)).isEmpty)
    // alien version line (the synth id%17 class)
    val alien = good.clone()
    alien(0) = 'H'; alien(1) = 'T'; alien(2) = 'T'; alien(3) = 'P'
    assert(WarcCodec.warcWalk(alien).isEmpty)
    // unsupported WARC version
    val v2 = new String(good, utf8).replaceFirst("WARC/1\\.0", "WARC/2.0")
      .getBytes(utf8)
    assert(WarcCodec.warcWalk(v2).isEmpty)
    // header line without a colon
    val noColon = new String(good, utf8)
      .replaceFirst("WARC-Date: 2020-01-01T00:00:00Z", "WARC-Date-junk")
    assert(WarcCodec.warcWalk(noColon.getBytes(utf8)).isEmpty)
    // non-numeric Content-Length
    val badLen = new String(good, utf8)
      .replaceFirst("Content-Length: 25", "Content-Length: 2x")
    assert(WarcCodec.warcWalk(badLen.getBytes(utf8)).isEmpty)
    // missing Content-Length entirely
    val noLen = WarcCodec.encodeWarc(Seq(("response", "u",
      "x".getBytes(utf8))))
    val stripped = new String(noLen, utf8)
      .replaceFirst("Content-Length: 1\r\n", "")
    assert(WarcCodec.warcWalk(stripped.getBytes(utf8)).isEmpty)
    // payload length past EOF
    val overrun = new String(good, utf8)
      .replaceFirst("Content-Length: 25", "Content-Length: 9999")
    assert(WarcCodec.warcWalk(overrun.getBytes(utf8)).isEmpty)
    // terminator bytes stomped (payload intact, CRLFCRLF broken)
    val stomped = good.clone()
    // find the first terminator: right after the warcinfo payload
    val s = new String(good, utf8)
    val t = s.indexOf("graft-synth 1.0") + "graft-synth 1.0".length
    stomped(t) = 'x'
    assert(WarcCodec.warcWalk(stomped).isEmpty)
  }
}
