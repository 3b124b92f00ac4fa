package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz pin for the in-band-miss contract shared by all three media
  * kernels: NO byte mutation, truncation, or splice may make a decoder
  * throw — corrupt input is data (`None`), never a task failure. Pure
  * JVM, no Spark session needed. Deterministic LCG so a failure
  * reproduces; each case that decodes to Some must also be internally
  * consistent (offsets in range), which the feature accessors implicitly
  * exercise.
  */
class CodecFuzzSpec extends AnyFunSuite {

  // SplittableRandom, NOT a raw power-of-two LCG: an LCG's low 2 bits
  // cycle with period 4, and with a draw count per round that happens
  // to be ≡ 0 (mod 4) the kind selector locks onto ONE mutation kind
  // forever (observed: every wav round spliced benignly, every y4m
  // round stomped fatally). SplittableRandom's mixer has no such
  // low-bit structure and its algorithm is specified → deterministic.
  private def mutations(base: Array[Byte], seed: Long,
                        rounds: Int): Iterator[Array[Byte]] = {
    val r = new java.util.SplittableRandom(seed)
    (0 until rounds).iterator.map { _ =>
      val b = base.clone()
      r.nextInt(4) match {
        case 0 => // single-byte flip
          if (b.nonEmpty) b(r.nextInt(b.length)) = r.nextInt(256).toByte
          b
        case 1 => // truncation
          b.take(r.nextInt(b.length + 1))
        case 2 => // 4-byte stomp (hits size/dim fields)
          if (b.length >= 4) {
            val at = r.nextInt(b.length - 3)
            var i = 0
            while (i < 4) { b(at + i) = r.nextInt(256).toByte; i += 1 }
          }
          b
        case _ => // splice garbage tail
          b ++ Array.fill(r.nextInt(32))(r.nextInt(256).toByte)
      }
    }
  }

  private def exercise[A](name: String, base: Array[Byte],
                          decode: Array[Byte] => Option[A],
                          consume: A => Unit): Unit = {
    assert(decode(base).isDefined, s"$name: pristine payload must decode")
    var some = 0; var none = 0
    for (m <- mutations(base, seed = name.hashCode.toLong, rounds = 2000)) {
      decode(m) match { // must not throw, ever
        case Some(a) => consume(a); some += 1
        case None => none += 1
      }
    }
    // the fuzz must actually exercise BOTH outcomes: plenty of rejects,
    // and some survivors (mutations in pixel/sample data still decode)
    assert(none > 0, s"$name: no mutation was rejected")
    assert(some > 0, s"$name: every mutation was rejected — fuzz too weak")
  }

  test("decodeBmp24 never throws under mutation, truncation, or splice") {
    val base = ImageCodec.encodeBmp24(9, 7, (x, y) => (x * 3, y * 5, x + y))
    exercise("bmp", base, ImageCodec.decodeBmp24,
      (img: ImageCodec.DecodedImage) => ImageCodec.channelSums(img))
  }

  test("decodeWavPcm16 never throws under mutation, truncation, or splice") {
    val base = AudioCodec.encodeWavPcm16(8000,
      Array.tabulate(120)(k => (k * 523 - 30000).toShort))
    exercise("wav", base, AudioCodec.decodeWavPcm16,
      (a: AudioCodec.DecodedAudio) => AudioCodec.amplitudeStats(a))
  }

  test("decodeY4m never throws under mutation, truncation, or splice") {
    val base = VideoCodec.encodeY4m(6, 4, 3, (f, p) => (f + p, f * 2, p))
    exercise("y4m", base, VideoCodec.decodeY4m,
      (c: VideoCodec.DecodedY4m) =>
        (0 until c.nFrames).foreach(c.planeSums))
  }

  test("decodePng never throws under mutation, truncation, or splice") {
    val base = PngCodec.encodePng24(9, 7, (x, y) => (x * 29, y * 53, x + y))
    exercise("png", base, PngCodec.decodePng,
      (img: ImageCodec.DecodedImage) => ImageCodec.channelSums(img))
  }

  test("PngNative.decode never throws under mutation, truncation, or splice") {
    val base = PngCodec.encodePng24(9, 7, (x, y) => (x * 29, y * 53, x + y))
    // every CRC-checked chunk makes most mutations reject, which is the
    // point: the native decoder's reject path must be as crash-free as
    // its decode path. Survivors exist because the mutator also emits
    // pristine-prefix truncation splices past IEND (ignored trailer).
    exercise("png-native", base, PngNative.decode,
      (img: ImageCodec.DecodedImage) => ImageCodec.channelSums(img))
  }

  test("decodeJpeg never throws under mutation, truncation, or splice") {
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      img.setRGB(x, y, ((x * 10) << 16) | ((y * 15) << 8) | ((x + y) * 5))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    exercise("jpeg", bos.toByteArray, PngCodec.decodeJpeg,
      (d: ImageCodec.DecodedImage) => ImageCodec.channelSums(d))
  }

  test("jpegHeader never throws under mutation, truncation, or splice") {
    // the marker walk parses length fields straight off attacker-shaped
    // bytes — every offset must be bounds-checked, and a surviving
    // parse must carry sane fields (positive dims, per the contract)
    val base = PngCodec.encodeJpeg24(24, 16, 0.75f,
      (x, y) => (x * 10, y * 15, (x + y) * 5))
    exercise("jpeg-header", base, PngCodec.jpegHeader,
      (h: PngCodec.JpegHeader) =>
        assert(h.w > 0 && h.h > 0 && h.nComponents > 0))
  }

  test("ifdWalk never throws under mutation, truncation, or splice") {
    // the IFD walk chases offsets and counts straight off the wire —
    // every hop must be bounds-checked; a surviving parse must carry
    // positive dims per the contract
    val base = TiffCodec.encodeTiffGray8(9, 7, 3,
      "2020:01:05 12:00:31", littleEndian = true, (x, y) => x * 3 + y)
    exercise("tiff", base, TiffCodec.ifdWalk,
      (m: TiffMeta) => assert(m.w > 0 && m.h > 0))
  }

  test("gifMeta never throws under mutation, truncation, or splice") {
    // the block walk hops attacker-controlled length prefixes — every
    // hop must be bounds-checked and the walk must terminate; a
    // surviving parse must carry positive dims
    val base = GifCodec.encodeGif(6, 5, Seq(10, 20, 30), Some(2),
      (f, x, y) => (f + x + y) % 4)
    exercise("gif", base, GifCodec.gifMeta,
      (m: GifMeta) => assert(m.w > 0 && m.h > 0 && m.frames >= 0))
  }

  test("decodeAuto never throws across sniffed containers under mutation") {
    // mutations can flip a payload's magic INTO another branch's —
    // the sniffing kernel must stay in-band on all of them
    for ((name, base) <- Seq(
        "auto-bmp" -> ImageCodec.encodeBmp24(9, 7, (x, y) => (x, y, x + y)),
        "auto-png" -> PngCodec.encodePng24(9, 7, (x, y) => (x, y, x + y)))) {
      exercise(name, base, PngCodec.decodeAuto,
        (img: ImageCodec.DecodedImage) => ImageCodec.channelSums(img))
    }
  }
}
