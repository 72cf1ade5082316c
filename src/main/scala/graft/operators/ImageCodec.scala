package graft.operators

/** Real (if minimal) image codec for the multimodal seam: binary PPM
  * (P6) and uncompressed 24-bit BMP decode/encode, integer grayscale,
  * exact area-average downscale, and the 64-bit difference hash (dHash,
  * the standard perceptual near-dup fingerprint: downscale to 9×8 gray,
  * emit one bit per adjacent-pixel comparison). Everything is integer
  * arithmetic, so results are deterministic across JVMs and expressible
  * in the DuckDB oracle.
  *
  * This replaces the round-8 byte-fold stand-in: the bytes flowing
  * through [[Multimodal]] now pass a genuine container parse and a
  * genuine perceptual hash. (JPEG/PNG/H.264 remain out of scope — no
  * codec libraries in this environment — but they would slot into these
  * exact signatures.) */
object ImageCodec {

  /** Decoded raster: row-major RGB, 3 bytes per pixel. */
  final case class RawImage(width: Int, height: Int, rgb: Array[Byte])

  // ---------------------------------------------------------------- PPM

  /** Binary PPM (P6, maxval ≤ 255) decode; `#` comments and arbitrary
    * whitespace in the header are handled per the netpbm spec. Returns
    * None on anything that is not a well-formed P6 payload. */
  def decodePpm(bytes: Array[Byte]): Option[RawImage] = {
    var i = 0
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else in = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    i = 2
    val w = readInt(); val h = readInt(); val maxv = readInt()
    // Raster-size arithmetic in Long (ADVICE r9): a crafted 65536×65536
    // header overflows w*h*3 in Int to a NEGATIVE value that PASSES the
    // length guard, so copyOfRange throws instead of honoring the
    // return-None contract. 1<<26 pixels (~192 MiB RGB) bounds any
    // plausible in-row thumbnail payload.
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    if (w.toLong * h > (1L << 26)) return None
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= bytes.length) return None
    val sep = bytes(i)
    if (sep != ' ' && sep != '\t' && sep != '\r' && sep != '\n') return None
    i += 1
    val need = w * h * 3
    if (bytes.length - i < need) return None
    Some(RawImage(w, h, java.util.Arrays.copyOfRange(bytes, i, i + need)))
  }

  /** Binary PPM (P6) encode with the canonical single-`\n` header. */
  def encodePpm(img: RawImage): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  // ---------------------------------------------------------------- BMP

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Uncompressed 24-bit BMP decode (BITMAPINFOHEADER, BI_RGB): BGR
    * byte order, rows padded to 4 bytes, bottom-up when height > 0 and
    * top-down when height < 0 — both normalized to top-down RGB. */
  def decodeBmp(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return None
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val planes = le16(bytes, 26)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (w <= 0 || hRaw == 0 || planes != 1 || bpp != 24 || compression != 0)
      return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    // Same Long-arithmetic guard as decodePpm (ADVICE r9): unvalidated
    // header w/h can overflow rowBytes and w*h*3 in Int, wrapping past the
    // length guard on a ~58-byte crafted file and then throwing (or
    // attempting a multi-GB allocation) instead of returning None.
    if (w.toLong * h > (1L << 26)) return None
    val rowBytes = ((w.toLong * 3 + 3) / 4 * 4).toInt
    if (dataOff < 0 || bytes.length - dataOff < rowBytes.toLong * h) return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val src = dataOff + srcRow * rowBytes
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        rgb(d) = bytes(src + x * 3 + 2)     // R (BMP stores BGR)
        rgb(d + 1) = bytes(src + x * 3 + 1) // G
        rgb(d + 2) = bytes(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(RawImage(w, h, rgb))
  }

  /** Uncompressed 24-bit bottom-up BMP encode (the spec round-trip
    * face). */
  def encodeBmp(img: RawImage): Array[Byte] = {
    val rowBytes = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54); putLe32(14, 40)
    putLe32(18, img.width); putLe32(22, img.height)
    out(26) = 1; out(28) = 24
    putLe32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dst = 54 + (img.height - 1 - y) * rowBytes
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        out(dst + x * 3) = img.rgb(s + 2)     // B
        out(dst + x * 3 + 1) = img.rgb(s + 1) // G
        out(dst + x * 3 + 2) = img.rgb(s)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------- gray / dHash

  /** Integer ITU-R 601 luma: `(299·R + 587·G + 114·B) / 1000`, floored —
    * exact on both engines, and the identity on gray pixels (R=G=B=v ⟹
    * luma = v), which is what makes the rendered-frame oracle exact. */
  def grayscale(img: RawImage): Array[Int] = {
    val g = new Array[Int](img.width * img.height)
    var p = 0
    while (p < g.length) {
      val r = img.rgb(p * 3) & 0xff
      val gg = img.rgb(p * 3 + 1) & 0xff
      val b = img.rgb(p * 3 + 2) & 0xff
      g(p) = (299 * r + 587 * gg + 114 * b) / 1000
      p += 1
    }
    g
  }

  /** Exact area-average downscale of a gray raster to `tw`×`th`: cell
    * (x,y) covers source columns `⌊x·w/tw⌋ until ⌊(x+1)·w/tw⌋` (rows
    * likewise) and takes the floored integer mean — deterministic, no
    * float resampling kernel. Requires w ≥ tw and h ≥ th. */
  def downscaleGray(g: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    require(w >= tw && h >= th, s"downscale needs w>=$tw, h>=$th")
    val out = new Array[Int](tw * th)
    var y = 0
    while (y < th) {
      val y0 = y * h / th; val y1 = (y + 1) * h / th
      var x = 0
      while (x < tw) {
        val x0 = x * w / tw; val x1 = (x + 1) * w / tw
        var s = 0L; var n = 0
        var yy = y0
        while (yy < y1) {
          var xx = x0
          while (xx < x1) { s += g(yy * w + xx); n += 1; xx += 1 }
          yy += 1
        }
        out(y * tw + x) = (s / n).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit difference hash: downscale the gray raster to 9×8, then bit
    * `y·8 + x` is set iff `gray(x,y) > gray(x+1,y)`. Brightness-SHIFT
    * invariant by construction (a monotone shift preserves every
    * adjacent comparison), which is exactly the near-dup robustness the
    * byte fold it replaces did not have. */
  def dHash64(img: RawImage): Long = {
    val ds = downscaleGray(grayscale(img), img.width, img.height, 9, 8)
    var acc = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (ds(y * 9 + x) > ds(y * 9 + x + 1)) acc |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    acc
  }
}
