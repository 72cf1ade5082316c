package graft.operators

/** Real (if minimal) audio codec for the multimodal seam: RIFF/WAVE
  * 16-bit PCM decode/encode, integer channel fold, integer features
  * (duration, zero crossings, mean amplitude) and a 64-bit
  * ENERGY-CONTOUR fingerprint — the audio analog of [[ImageCodec]]'s
  * dHash: 65 equal frames of mean |amplitude|, one bit per
  * adjacent-frame comparison. The comparison is the integer cross
  * product e_i·len_{i+1} > e_{i+1}·len_i (no division), so the
  * fingerprint is exact across JVMs AND invariant to uniform volume
  * scaling — re-encoded-louder copies collide, which is precisely what
  * an audio near-dup gate wants.
  *
  * This upgrades the audio half of the seam from the byte-fold stub the
  * same way round 9 upgraded images: the bytes now pass a genuine
  * container parse (RIFF chunk walk, fmt validation, bounds from the
  * ADVICE r9 hardening stance) before any feature leaves the codec.
  * (MP3/AAC/Opus remain out of scope — no codec libraries in this
  * environment — but they would slot into these exact signatures.) */
object AudioCodec {

  /** Decoded clip: interleaved 16-bit samples. */
  final case class RawAudio(sampleRate: Int, channels: Int,
                            samples: Array[Short])

  /** Max decoded samples (~128 MiB as shorts) — the plausibility bound
    * that turns a corrupt length field into None, not an OOM. */
  val MaxSamples: Long = 1L << 26

  /** RIFF/WAVE PCM (format 1, 16-bit) decode. Walks the chunk list —
    * extra chunks (LIST, fact, ...) are skipped per the RIFF spec.
    * Returns None on anything not a well-formed 16-bit PCM payload. */
  def decodeWav(bytes: Array[Byte]): Option[RawAudio] = {
    def u16(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      if (o + 4 > bytes.length) ""
      else new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1
    var channels = -1
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val len = u32(off + 4)
      if (len < 0 || off + 8 + len > bytes.length) return None
      if (id == "fmt ") {
        if (len < 16) return None
        val fmt = u16(off + 8)
        channels = u16(off + 10)
        rate = u32(off + 12).toInt
        val bits = u16(off + 22)
        if (fmt != 1 || bits != 16) return None
        if (channels < 1 || channels > 8) return None
        if (rate < 1 || rate > 384000) return None
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = len
      }
      off += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0) return None
    val nSamples = dataLen / 2
    if (nSamples <= 0 || nSamples > MaxSamples) return None
    if (nSamples % channels != 0) return None
    val out = new Array[Short](nSamples.toInt)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(dataOff + 2 * i) & 0xff) |
        ((bytes(dataOff + 2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    Some(RawAudio(rate, channels, out))
  }

  /** RIFF/WAVE PCM 16-bit encode (the spec-side twin of [[decodeWav]]). */
  def encodeWav(a: RawAudio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def put(o: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Long): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    put(0, "RIFF"); p32(4, 36L + dataLen); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16L); p16(20, 1); p16(22, a.channels)
    p32(24, a.sampleRate.toLong)
    p32(28, a.sampleRate.toLong * a.channels * 2) // byte rate
    p16(32, a.channels * 2); p16(34, 16)
    put(36, "data"); p32(40, dataLen.toLong)
    var i = 0
    while (i < a.samples.length) {
      p16(44 + 2 * i, a.samples(i) & 0xffff); i += 1
    }
    out
  }

  /** Channel fold to mono: per-frame integer mean (floor). */
  def monoSamples(a: RawAudio): Array[Int] = {
    val frames = a.samples.length / a.channels
    val out = new Array[Int](frames)
    var f = 0
    while (f < frames) {
      var s = 0L
      var c = 0
      while (c < a.channels) { s += a.samples(f * a.channels + c); c += 1 }
      out(f) = math.floorDiv(s, a.channels.toLong).toInt
      f += 1
    }
    out
  }

  /** Clip features, all exact integers: frame count, duration in exact
    * microseconds (n·1e6 / rate, floor), zero crossings of the mono
    * fold, mean |amplitude| in milli-units (Σ|s|·1000 / n, floor). */
  final case class AudioStats(nFrames: Long, durationUs: Long,
                              zeroCross: Long, meanAbsMilli: Long)

  def stats(a: RawAudio): AudioStats = {
    val mono = monoSamples(a)
    var zc = 0L
    var sumAbs = 0L
    var i = 0
    var prevSign = 0
    while (i < mono.length) {
      val v = mono(i)
      sumAbs += math.abs(v.toLong)
      val sign = if (v > 0) 1 else if (v < 0) -1 else 0
      if (sign != 0) {
        if (prevSign != 0 && sign != prevSign) zc += 1
        prevSign = sign
      }
      i += 1
    }
    val n = mono.length.toLong
    AudioStats(n,
      if (n == 0) 0L else n * 1000000L / a.sampleRate,
      zc,
      if (n == 0) 0L else sumAbs * 1000L / n)
  }

  /** 64-bit energy-contour fingerprint: the mono fold splits into 65
    * equal-as-possible frames; bit k is set when frame k's mean
    * |amplitude| exceeds frame k+1's — compared via the integer cross
    * product (energy_k · len_{k+1} > energy_{k+1} · len_k), so the
    * fingerprint is division-free, JVM-exact, and invariant to uniform
    * volume scaling. Clips shorter than 65 frames return None (no
    * meaningful contour). */
  def energyFingerprint(a: RawAudio): Option[Long] = {
    val mono = monoSamples(a)
    val bands = 65
    if (mono.length < bands) return None
    val energy = new Array[Long](bands)
    val len = new Array[Long](bands)
    var k = 0
    while (k < bands) {
      val lo = (mono.length.toLong * k / bands).toInt
      val hi = (mono.length.toLong * (k + 1) / bands).toInt
      var s = 0L
      var i = lo
      while (i < hi) { s += math.abs(mono(i).toLong); i += 1 }
      energy(k) = s
      len(k) = (hi - lo).toLong
      k += 1
    }
    var fp = 0L
    k = 0
    while (k < bands - 1) {
      // energies <= 32768 * len <= 2^15 * 2^26 = 2^41; cross products
      // stay far inside int64
      if (energy(k) * len(k + 1) > energy(k + 1) * len(k)) fp |= (1L << k)
      k += 1
    }
    Some(fp)
  }
}
