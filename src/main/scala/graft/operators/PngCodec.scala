package graft.operators

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Wire-format image decode via the in-JDK `javax.imageio` plugins —
  * the bridge from the hand-rolled [[ImageCodec]] (BMP, byte-exact by
  * construction) to the containers real corpora actually ship: PNG
  * (lossless — decoded pixels are bit-identical on any conformant
  * decoder, so PNG lanes stay hash-gated) and JPEG (lossy and
  * decoder-dependent — decode works through the same seam but its
  * pixel values are never hash-gated, only dims; the mm15 design rule).
  *
  * Contract matches the other kernels: any corrupt, truncated, or
  * foreign payload returns None — in-band miss, never a task failure
  * (`ImageIO.read` throws on torn streams; the catch is the contract).
  * Output is [[ImageCodec.DecodedImage]] — row-major top-down RGB —
  * so every downstream feature op (channel sums, aHash) is
  * container-agnostic.
  *
  * Scale: `setUseCache(false)` keeps executors off temp-file caches.
  * NOTE this flag is PROCESS-GLOBAL JVM state, set on first load of
  * this object — any other ImageIO user in the same executor inherits
  * in-memory (uncached) streams. That is the behavior a Spark executor
  * wants (no temp-file churn under /tmp), but it is a deliberate,
  * documented global. The codec is a static kernel like the others —
  * no per-row setup inside `mapPartitions`.
  */
object PngCodec {

  ImageIO.setUseCache(false)

  private val PngSig: Array[Int] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def hasPngSig(b: Array[Byte]): Boolean =
    b.length >= 8 && (0 until 8).forall(i => (b(i) & 0xff) == PngSig(i))

  private def hasJpegSig(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  /** Encode a 24-bit RGB PNG via the JDK writer. `rgb(x, y)` returns
    * the (r, g, b) triple for the top-down pixel grid — the same
    * callback shape as [[ImageCodec.encodeBmp24]], so fixtures encode
    * identical pixels into both containers.
    */
  def encodePng24(w: Int, h: Int,
                  rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims: ${w}x$h")
    require(w.toLong * h <= (Int.MaxValue / 4),
      s"image exceeds the int pixel budget: ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = ImageIO.write(img, "png", bos)
    require(ok, "JDK PNG writer unavailable")
    bos.toByteArray
  }

  private def readToRgb(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    try {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue) return None
      val rgb = new Array[Byte](3 * w * h)
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val px = row(x)
          val i = (y * w + x) * 3
          rgb(i) = ((px >> 16) & 0xff).toByte
          rgb(i + 1) = ((px >> 8) & 0xff).toByte
          rgb(i + 2) = (px & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(ImageCodec.DecodedImage(w, h, rgb))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode a PNG payload to top-down RGB. None for anything that is
    * not a well-formed PNG — wrong signature, torn stream, or a
    * payload the JDK reader rejects. Lossless: decoded pixels are
    * bit-identical to what [[encodePng24]] was given (pinned by spec),
    * so PNG features stay hash-gated like BMP's.
    */
  def decodePng(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    if (bytes == null || !hasPngSig(bytes)) None else readToRgb(bytes)

  /** Decode a JPEG payload. Dims are deterministic; pixel values are
    * DECODER-DEPENDENT (IDCT rounding differs across libjpeg builds) —
    * callers must never hash-gate them (golden/fuzz coverage only).
    */
  def decodeJpeg(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    if (bytes == null || !hasJpegSig(bytes)) None else readToRgb(bytes)

  /** Magic-sniffing kernel for mixed-container corpora — the
    * [[MultimodalOps.decodeImageFeatures]] seam: BMP routes to the
    * byte-exact hand-rolled codec, PNG to the from-scratch
    * [[PngNative]] decoder (r17; PngNativeSpec pins it byte-identical
    * to the JDK reader on every color type), JPEG to the JDK reader
    * (pixel values are decoder-dependent there — never hash-gated),
    * anything else is an in-band miss. One kernel, any wire format.
    */
  def decodeAuto(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    if (bytes == null || bytes.length < 3) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') ImageCodec.decodeBmp24(bytes)
    else if (hasPngSig(bytes)) PngNative.decode(bytes)
    else if (hasJpegSig(bytes)) readToRgb(bytes)
    else None

  /** Encode a 24-bit RGB JPEG via the JDK writer at an EXPLICIT
    * compression quality — fixtures must pin the quality so the
    * deterministic half of the container (the header walked by
    * [[jpegHeader]]) is reproducible; the lossy half (pixel values
    * after IDCT) stays decoder-dependent and is never hash-gated
    * (the mm15 design rule).
    */
  def encodeJpeg24(w: Int, h: Int, quality: Float,
                   rgb: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims: ${w}x$h")
    require(quality > 0f && quality <= 1f, s"bad quality: $quality")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = rgb(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    val writers = ImageIO.getImageWritersByFormatName("jpeg")
    require(writers.hasNext, "JDK JPEG writer unavailable")
    val writer = writers.next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** The DETERMINISTIC half of a JPEG: frame-header facts fixed by the
    * standard's marker syntax (ITU-T T.81 §B.2.2), independent of any
    * decoder's IDCT. `progressive` = the frame is SOF2-coded. */
  final case class JpegHeader(w: Int, h: Int, nComponents: Int,
                              precision: Int, progressive: Boolean)

  /** Marker-walk JPEG frame-header parse — pure arithmetic over the
    * public wire syntax, NO entropy decode: skip SOI, then walk the
    * length-prefixed marker segments to the first SOFn (C0–C3, C5–C7,
    * C9–CB, CD–CF; C4/C8/CC are DHT/JPG/DAC, not frames) and read
    * precision, height, width, component count big-endian. Unlike
    * [[decodeJpeg]] this is hash-gateable: the header bytes are what
    * the encoder wrote, deterministically, even though decoded pixels
    * are not. None for torn/foreign payloads, a SOS/EOI reached before
    * any SOF, a zero dimension (DNL-deferred height is out of scope —
    * the JDK writer never emits it), or a segment length that walks
    * off the buffer — in-band miss, never a task failure.
    */
  def jpegHeader(bytes: Array[Byte]): Option[JpegHeader] = {
    if (bytes == null || !hasJpegSig(bytes)) return None
    val n = bytes.length
    var i = 2 // past SOI
    while (i + 1 < n) {
      // markers may be preceded by fill bytes (0xFF*)
      if ((bytes(i) & 0xff) != 0xff) return None
      var j = i
      while (j + 1 < n && (bytes(j + 1) & 0xff) == 0xff) j += 1
      if (j + 1 >= n) return None
      val marker = bytes(j + 1) & 0xff
      i = j + 2
      marker match {
        case 0x01 | 0xd8 => // TEM / SOI: standalone, no segment
        case m if m >= 0xd0 && m <= 0xd7 => // RSTn: standalone
        case 0xd9 | 0xda => return None // EOI / SOS before any SOF
        case m if m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc =>
          if (i + 7 >= n) return None
          val len = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
          if (len < 8 || i + len > n) return None
          val precision = bytes(i + 2) & 0xff
          val h = ((bytes(i + 3) & 0xff) << 8) | (bytes(i + 4) & 0xff)
          val w = ((bytes(i + 5) & 0xff) << 8) | (bytes(i + 6) & 0xff)
          val nc = bytes(i + 7) & 0xff
          if (w <= 0 || h <= 0 || nc <= 0) return None
          return Some(JpegHeader(w, h, nc, precision, m == 0xc2))
        case _ => // length-prefixed segment: skip
          if (i + 1 >= n) return None
          val len = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
          if (len < 2 || i + len > n) return None
          i += len
      }
    }
    None
  }
}
