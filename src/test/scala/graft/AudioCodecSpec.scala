package graft

import graft.operators.{AudioCodec, Multimodal}
import graft.operators.AudioCodec.RawAudio

/** The audio half of the multimodal seam: real RIFF/WAVE PCM parse,
  * integer stats, and the volume-invariant energy-contour fingerprint —
  * codec-level closed forms plus the Dataset plumbing end-to-end. */
class AudioCodecSpec extends SparkSpec {

  private def tone(n: Int, period: Int, amp: Int): Array[Short] =
    Array.tabulate(n)(i => (if ((i / period) % 2 == 0) amp else -amp).toShort)

  test("wav round-trip: encode then decode is the identity") {
    val a = RawAudio(16000, 2, tone(2000, 10, 1200))
    val back = AudioCodec.decodeWav(AudioCodec.encodeWav(a))
    assert(back.isDefined)
    assert(back.get.sampleRate === 16000 && back.get.channels === 2)
    assert(back.get.samples.toSeq === a.samples.toSeq)
  }

  test("wav decode returns None on corrupt containers, never throws") {
    val good = AudioCodec.encodeWav(RawAudio(8000, 1, tone(500, 7, 900)))
    assert(AudioCodec.decodeWav(good).isDefined)
    assert(AudioCodec.decodeWav(Array.emptyByteArray).isEmpty)
    assert(AudioCodec.decodeWav(good.take(30)).isEmpty) // truncated header
    val notPcm = good.clone(); notPcm(20) = 3 // fmt = IEEE float
    assert(AudioCodec.decodeWav(notPcm).isEmpty)
    val badRate = good.clone(); badRate(27) = 0x7f // absurd sample rate
    assert(AudioCodec.decodeWav(badRate).isEmpty)
    // data-chunk length field pointing past the buffer must not OOM/throw
    val badLen = good.clone(); badLen(43) = 0x7f
    assert(AudioCodec.decodeWav(badLen).isEmpty)
  }

  test("stats: hand-computed duration, zero crossings, mean amplitude") {
    // mono square wave, period 10 (5 up, 5 down), amp 1000, 100 samples
    val a = RawAudio(10000, 1, tone(100, 5, 1000))
    val st = AudioCodec.stats(a)
    assert(st.nFrames === 100L)
    assert(st.durationUs === 10000L) // 100 / 10000 Hz = 10 ms
    assert(st.zeroCross === 19L)     // a sign flip every 5 samples
    assert(st.meanAbsMilli === 1000L * 1000L / 1L / 1000L * 1000L
      || st.meanAbsMilli === 1000000L) // |s| constant 1000 -> 1000*1000
  }

  test("energy fingerprint is volume-invariant and length-gated") {
    val quiet = RawAudio(8000, 1,
      Array.tabulate(650)(i => ((i % 37) * ((i % 5) + 1)).toShort))
    val loud = RawAudio(8000, 1, quiet.samples.map(s => (s * 4).toShort))
    val fq = AudioCodec.energyFingerprint(quiet)
    val fl = AudioCodec.energyFingerprint(loud)
    assert(fq.isDefined && fq === fl) // x4 volume: same contour
    // a genuinely different clip must not collide
    val other = RawAudio(8000, 1,
      Array.tabulate(650)(i => (((i * 31) % 97) * 3).toShort))
    assert(AudioCodec.energyFingerprint(other) !== fq)
    // < 65 mono frames: no meaningful contour
    assert(AudioCodec.energyFingerprint(RawAudio(8000, 1, tone(64, 3, 5))).isEmpty)
  }

  test("audioFeatures + audioHammingDup: scaled re-encode collides, corrupt drops") {
    import spark.implicits._
    val base = Array.tabulate(1300)(i =>
      (math.sin(i / 7.0) * 3000 + (i % 11) * 40).toShort)
    def wav(samples: Array[Short]) =
      AudioCodec.encodeWav(RawAudio(16000, 1, samples))
    val records = Seq(
      Multimodal.MediaRecord(1L, "audio/wav", wav(base)),
      Multimodal.MediaRecord(2L, "audio/wav",
        wav(base.map(s => (s / 2).toShort))), // half volume (floor-div
      // quantization can nudge a contour bit or two — Hamming, not 0)
      Multimodal.MediaRecord(3L, "audio/wav",
        wav(Array.tabulate(1300)(i => (((i * 17) % 251) * 23 - 2800).toShort))),
      Multimodal.MediaRecord(4L, "audio/wav", Array[Byte](1, 2, 3)), // corrupt
      Multimodal.MediaRecord(5L, "text", "not audio".getBytes))
    val feats = Multimodal.audioFeatures(spark.createDataset(records))
    val rows = feats.collect().map(f => f.media_id -> f).toMap
    assert(rows.keySet === Set(1L, 2L, 3L)) // corrupt + non-audio dropped
    assert(rows(1L).duration_us === 1300L * 1000000L / 16000L)
    assert(rows(1L).fingerprint.isDefined)
    val pairs = Multimodal.audioHammingDup(feats, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"scaled copy must collide: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }
}
