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
  * Scale: `setUseCache(false)` keeps executors off temp-file caches;
  * the codec is a static kernel like the others — no per-row setup
  * inside `mapPartitions`.
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
    * byte-exact hand-rolled codec, PNG/JPEG to the JDK readers,
    * anything else is an in-band miss. One kernel, any wire format.
    */
  def decodeAuto(bytes: Array[Byte]): Option[ImageCodec.DecodedImage] =
    if (bytes == null || bytes.length < 3) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') ImageCodec.decodeBmp24(bytes)
    else if (hasPngSig(bytes)) readToRgb(bytes)
    else if (hasJpegSig(bytes)) readToRgb(bytes)
    else None
}
