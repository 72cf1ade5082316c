package graft

import graft.operators.{ImageCodec, Multimodal}
import graft.operators.ImageCodec.RawImage

/** Round-9 (VERDICT r8 #6): real bytes through the multimodal seam —
  * the PPM/BMP codec decodes genuine containers, dHash is a genuine
  * perceptual hash (brightness-shifted copies of a frame collide while
  * distinct frames do not), and the Dataset pipeline carries real
  * dimensions end to end. */
class ImageCodecSpec extends SparkSpec {

  private def gradient(w: Int, h: Int, dx: Int, dy: Int): RawImage = {
    // pixel values capped at 200 so a +25 brightness shift cannot clamp
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(200, 10 + dx * x + dy * y)
      val p = (y * w + x) * 3
      rgb(p) = v.toByte; rgb(p + 1) = v.toByte; rgb(p + 2) = v.toByte
    }
    RawImage(w, h, rgb)
  }

  private def shifted(img: RawImage, d: Int): RawImage =
    RawImage(img.width, img.height,
      img.rgb.map(b => ((b & 0xff) + d).toByte))

  test("PPM round-trip preserves dimensions and every byte") {
    val img = gradient(17, 11, 3, 5)
    val dec = ImageCodec.decodePpm(ImageCodec.encodePpm(img))
    assert(dec.isDefined)
    assert(dec.get.width == 17 && dec.get.height == 11)
    assert(dec.get.rgb.sameElements(img.rgb))
  }

  test("PPM header comments and whitespace variants parse") {
    val img = gradient(9, 8, 7, 3)
    val loose = ("P6 # a comment\n# another line\n  9\t8 # dims\n255\n")
      .getBytes("US-ASCII") ++ img.rgb
    val dec = ImageCodec.decodePpm(loose)
    assert(dec.isDefined && dec.get.width == 9 && dec.get.height == 8)
    assert(dec.get.rgb.sameElements(img.rgb))
  }

  test("PPM decode rejects malformed payloads instead of misreading them") {
    assert(ImageCodec.decodePpm("P5\n9 8\n255\n".getBytes).isEmpty) // not P6
    assert(ImageCodec.decodePpm("P6\n9 8\n255\n".getBytes).isEmpty) // truncated raster
    assert(ImageCodec.decodePpm("P6\n0 8\n255\n".getBytes).isEmpty) // zero width
    assert(ImageCodec.decodePpm(Array[Byte]()).isEmpty)
    // ADVICE r9: a 65536x65536 header overflows w*h*3 in Int to a negative
    // value that passed the old length guard — must return None, not throw
    assert(ImageCodec.decodePpm("P6\n65536 65536\n255\nxxx".getBytes).isEmpty)
    assert(ImageCodec.decodePpm("P6\n1431655766 1\n255\nxxx".getBytes).isEmpty)
  }

  test("BMP decode rejects overflow-crafted headers instead of throwing") {
    // Craft a 58-byte BMP whose header claims dimensions that overflow
    // Int raster arithmetic; the decode must return None (ADVICE r9).
    def crafted(w: Int, h: Int): Array[Byte] = {
      val b = new Array[Byte](58)
      def le32(off: Int, v: Int): Unit = {
        b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
        b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
      }
      b(0) = 'B'; b(1) = 'M'; le32(10, 54); le32(14, 40)
      le32(18, w); le32(22, h); b(26) = 1; b(28) = 24; le32(30, 0)
      b
    }
    assert(ImageCodec.decodeBmp(crafted(65536, 65536)).isEmpty)
    assert(ImageCodec.decodeBmp(crafted(1431655766, 1)).isEmpty)
    assert(ImageCodec.decodeBmp(crafted(0x40000000, 4)).isEmpty)
  }

  test("BMP round-trip flips bottom-up rows and swaps BGR back correctly") {
    // 2x2 with four distinct colors — any row-order or channel-order
    // mistake changes the result
    val img = RawImage(2, 2, Array[Byte](
      10, 20, 30,   40, 50, 60,
      70, 80, 90,  100, 110, 120))
    val dec = ImageCodec.decodeBmp(ImageCodec.encodeBmp(img))
    assert(dec.isDefined)
    assert(dec.get.width == 2 && dec.get.height == 2)
    assert(dec.get.rgb.sameElements(img.rgb))
    // odd width exercises the 4-byte row padding
    val odd = gradient(3, 2, 11, 7)
    val dec2 = ImageCodec.decodeBmp(ImageCodec.encodeBmp(odd))
    assert(dec2.isDefined && dec2.get.rgb.sameElements(odd.rgb))
  }

  test("area downscale is the exact block mean") {
    // 18x16, each 2x2 block constant v = row*10+col of the 9x8 target
    val rgb = new Array[Byte](18 * 16 * 3)
    for (y <- 0 until 16; x <- 0 until 18) {
      val v = (y / 2) * 10 + (x / 2)
      val p = (y * 18 + x) * 3
      rgb(p) = v.toByte; rgb(p + 1) = v.toByte; rgb(p + 2) = v.toByte
    }
    val g = ImageCodec.grayscale(RawImage(18, 16, rgb))
    val ds = ImageCodec.downscaleGray(g, 18, 16, 9, 8)
    for (y <- 0 until 8; x <- 0 until 9)
      assert(ds(y * 9 + x) == y * 10 + math.min(x, 8),
        s"cell ($x,$y): ${ds(y * 9 + x)}")
  }

  test("dHash: brightness-shifted copies collide, distinct frames do not") {
    val a = gradient(36, 24, 4, 2)
    val brighter = shifted(a, 25)
    val other = gradient(36, 24, -4, 2) // opposite horizontal slope
    assert(ImageCodec.dHash64(a) == ImageCodec.dHash64(brighter),
      "a monotone brightness shift must not change any adjacent comparison")
    assert(ImageCodec.dHash64(a) != ImageCodec.dHash64(other),
      "frames with opposite gradients must not collide")
    // and the same holds after a PPM encode/decode round trip
    val viaCodec = ImageCodec.decodePpm(ImageCodec.encodePpm(brighter)).get
    assert(ImageCodec.dHash64(a) == ImageCodec.dHash64(viaCodec))
  }

  test("extractFeatures carries REAL dimensions for image kinds (r9)") {
    import spark.implicits._
    val img = gradient(17, 11, 3, 5)
    val media = Seq(
      Multimodal.MediaRecord(1L, "image/ppm", ImageCodec.encodePpm(img)),
      Multimodal.MediaRecord(2L, "image/bmp", ImageCodec.encodeBmp(img)),
      Multimodal.MediaRecord(3L, "text", "hello stub".getBytes)).toDS()
    val f = Multimodal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).width == 17L && f(1L).height == 11L)
    assert(f(2L).width == 17L && f(2L).height == 11L)
    // non-image kinds keep the deterministic stub fakes
    assert(f(3L).width == f(3L).checksum % 640L)
  }

  test("rendered doc video: frames demux on the 227-byte boundary and dHash via the real decoder") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a" * 100),            // 2 frames
      (2L, "a" * 100),            // identical — all fingerprints shared
      (3L, "zyxwvutsrq" * 30)).toDF("doc_id", "text") // distinct content
    val media = Multimodal.mediaFromDocumentsAsVideo(docs)
    val rec = media.filter(_.media_id == 1L).collect().head
    assert(rec.content.length == 2 * Multimodal.FrameBytes)
    val frames = Multimodal.frameSample(media, Multimodal.FrameBytes, 1)
    // every demuxed frame must decode as a real 9x8 P6 image
    frames.collect().foreach { fr =>
      val img = ImageCodec.decodePpm(fr.frame)
      assert(img.isDefined && img.get.width == 9 && img.get.height == 8,
        s"frame ${fr.media_id}/${fr.frame_idx} failed the real decoder")
    }
    val dup = Multimodal.mediaDHashDup(media, stride = 1, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dup.contains((1L, 2L)), "identical renders must pair")
    assert(!dup.contains((1L, 3L)) && !dup.contains((2L, 3L)),
      "distinct content must not pair")
  }
}

/** The JDK-ImageIO on-ramp (r9 VERDICT task 5): real JPEG/PNG decode
  * behind the same seam, verified spec-only — JPEG IDCT is per-JVM
  * (±1 sample tolerance), so these stay off the DuckDB-oracle board;
  * the dHash downstream must shrug the loss off. */
class ImageIoCodecSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{ImageCodec, ImageIoCodec}
  import graft.operators.ImageCodec.RawImage

  private def gradient(w: Int, h: Int): RawImage = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = ((x * 255) / w).toByte
      rgb(p + 1) = ((y * 255) / h).toByte
      rgb(p + 2) = (((x + y) * 255) / (w + h)).toByte
    }
    RawImage(w, h, rgb)
  }

  test("PNG round-trip is pixel-exact through the seam") {
    val img = gradient(32, 24)
    val dec = ImageIoCodec.decode(ImageIoCodec.encodePng(img))
    assert(dec.isDefined)
    assert(dec.get.width == 32 && dec.get.height == 24)
    assert(dec.get.rgb.sameElements(img.rgb))
  }

  test("a JPEG and the PNG re-encode of the same raster land within Hamming <= 2 on dHash") {
    val img = gradient(64, 48)
    val viaPng = ImageIoCodec.decode(ImageIoCodec.encodePng(img)).get
    val viaJpeg = ImageIoCodec.decode(ImageIoCodec.encodeJpeg(img)).get
    val hp = ImageCodec.dHash64(viaPng)
    val hj = ImageCodec.dHash64(viaJpeg)
    assert(java.lang.Long.bitCount(hp ^ hj) <= 2,
      s"dHash drifted ${java.lang.Long.bitCount(hp ^ hj)} bits across the lossy round-trip")
    // and the PNG path matches the raw raster's hash exactly (lossless)
    assert(hp === ImageCodec.dHash64(img))
  }

  test("decode rejects garbage, truncation and oversized dimensions with None") {
    assert(ImageIoCodec.decode(Array[Byte]()).isEmpty)
    assert(ImageIoCodec.decode("not an image at all".getBytes).isEmpty)
    val png = ImageIoCodec.encodePng(gradient(16, 16))
    assert(ImageIoCodec.decode(png.take(20)).isEmpty) // truncated after magic
    // PPM bytes are not ImageIO's problem: the sniff rejects them
    assert(ImageIoCodec.decode("P6\n2 2\n255\n0123456789ab".getBytes).isEmpty)
  }

  test("decodeMedia routes image/jpeg and image/png kinds through ImageIO") {
    import graft.operators.Multimodal
    val img = gradient(20, 10)
    val rec = Multimodal.MediaRecord(1L, "image/png",
      ImageIoCodec.encodePng(img))
    val feats = Multimodal.decodeMedia(rec)
    assert(feats.width === 20L && feats.height === 10L)
    val recJ = Multimodal.MediaRecord(2L, "image/jpeg",
      ImageIoCodec.encodeJpeg(img))
    val featsJ = Multimodal.decodeMedia(recJ)
    assert(featsJ.width === 20L && featsJ.height === 10L)
  }
}
