package graft.operators

import java.io.ByteArrayInputStream

import graft.operators.ImageCodec.RawImage

/** JPEG/PNG (and whatever else the running JDK's `javax.imageio`
  * registry carries — GIF, the usual service-provider set) decode behind
  * the [[ImageCodec]] seam: the real crawl-image formats, with zero
  * external jars. Output is the same row-major RGB [[RawImage]] the
  * PPM/BMP paths produce, so grayscale → area downscale → dHash
  * ([[ImageCodec.dHash64]]) run unchanged downstream.
  *
  * ORACLE BOUNDARY — why this stays spec-only: PNG decode is exact
  * (lossless, bit-defined), but JPEG reconstruction is only required to
  * be IDCT-accurate within tolerance, so decoded samples may differ by
  * ±1 across JVM vendors/versions. Downstream dHash is designed to
  * shrug that off (adjacent-pixel COMPARISONS survive small uniform
  * perturbations), and the spec asserts exactly that robustness — but a
  * byte-exact DuckDB oracle twin would be asserting a non-guarantee.
  * The q_media_* board rows therefore keep their deterministic PPM
  * payloads; this reader is the production on-ramp for real payloads.
  */
object ImageIoCodec {

  /** Magic-sniffed decode: JPEG (FF D8), PNG (89 50 4E 47), GIF
    * (47 49 46). Returns None for anything unrecognized or that the
    * ImageIO registry fails to parse — same return-None contract as
    * [[ImageCodec.decodePpm]], so one corrupt payload degrades to the
    * stub path instead of killing the task. */
  def decode(bytes: Array[Byte]): Option[RawImage] =
    if (!looksSupported(bytes)) None
    else
      try {
        val buf = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
        if (buf == null) None
        else if (buf.getWidth.toLong * buf.getHeight > (1L << 26)) None
        else {
          val w = buf.getWidth
          val h = buf.getHeight
          val rgb = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // getRGB returns packed sRGB regardless of the source
              // color model (gray, palette, CMYK-converted) — exactly
              // the normalization the seam wants
              val px = buf.getRGB(x, y)
              val d = (y * w + x) * 3
              rgb(d) = ((px >> 16) & 0xff).toByte
              rgb(d + 1) = ((px >> 8) & 0xff).toByte
              rgb(d + 2) = (px & 0xff).toByte
              x += 1
            }
            y += 1
          }
          Some(RawImage(w, h, rgb))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

  /** Container sniff on leading magic bytes (the `kind` column can lie —
    * crawl MIME types routinely do). */
  def looksSupported(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && (
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) || // JPEG SOI
        (bytes(0) == 0x89.toByte && bytes(1) == 'P' &&
          bytes(2) == 'N' && bytes(3) == 'G') ||              // PNG
        (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))

  /** PNG encode (lossless round-trip face for specs). */
  def encodePng(img: RawImage): Array[Byte] = encode(img, "png")

  /** JPEG encode at ImageIO's default quality (spec face: prove dHash
    * survives the lossy round-trip). */
  def encodeJpeg(img: RawImage): Array[Byte] = encode(img, "jpg")

  private def encode(img: RawImage, format: String): Array[Byte] = {
    val buf = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        buf.setRGB(x, y,
          ((img.rgb(s) & 0xff) << 16) | ((img.rgb(s + 1) & 0xff) << 8) |
            (img.rgb(s + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(buf, format, out),
      s"no ImageIO writer for $format in this JVM")
    out.toByteArray
  }
}
