package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.3): image/audio/video payloads are
  * opaque `binary` columns with typed metadata, processed per-partition so
  * a real codec would amortize its init cost across a partition's records.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the
  * bytes. Everything around it — the typed schema, the Dataset encoders,
  * the mapPartitions batch shape, the partition-level codec lifecycle — is
  * the real plumbing a production decode would drop into.
  */
object Multimodal {

  /** One media payload: opaque bytes + typed metadata. */
  final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

  /** Extracted features (stub: width/height are deterministic fakes). */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 checksum: Long, width: Long, height: Long)

  private val P = graft.functions.TextFunctions.P

  /** STUB decoder — stands in for image decode / audio resample. The
    * checksum is the same polynomial byte fold as TextFunctions.charHash,
    * so ASCII payloads are oracle-checkable; width/height are fakes. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    var acc = 0L
    var i = 0
    while (i < r.content.length) {
      acc = (acc * 31L + (r.content(i) & 0xffL)) % P
      i += 1
    }
    MediaFeatures(r.media_id, r.kind, r.content.length.toLong, acc,
      width = acc % 640L, height = acc % 480L)
  }

  /** Media frame from the documents table: text bytes as the opaque
    * payload (the stand-in for real image/audio columns). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** Per-partition feature extraction. A real pipeline initializes the
    * codec once per partition (the `it =>` scope) and streams records
    * through it — the shape that keeps GPU/native codec init off the
    * per-record path at 100 TB. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // codec init would happen here, once per partition
      it.map(decodeStub)
    }
  }

  /** STUB resize — stands in for image downscale: a real implementation
    * decodes, scales to `maxBytes`-bounded dimensions and re-encodes; the
    * stub truncates the payload deterministically. Shape (binary in,
    * binary out, per-partition) is the real contract. */
  def resizeStub(media: Dataset[MediaRecord], maxBytes: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(r => r.copy(content = r.content.take(maxBytes)))
    }
  }

  /** Per-frame fingerprint: the polynomial byte fold over the frame
    * payload (same P as the text hash — oracle-checkable for ASCII
    * payloads). The real-codec analogue is a perceptual hash (pHash) per
    * decoded frame; the fold slots into the same typed seam. */
  def frameFingerprints(frames: Dataset[MediaFrame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        var acc = 0L
        var i = 0
        while (i < f.frame.length) {
          acc = (acc * 31L + (f.frame(i) & 0xffL)) % P
          i += 1
        }
        (f.media_id, f.frame_idx, acc)
      }
    }.toDF("media_id", "frame_idx", "fh")
  }

  /** Media near-duplicate pairs by shared frame fingerprints — the
    * video-dedup shape (two clips sharing ≥ `minShared` sampled-frame
    * signatures are the same footage): [[frameSample]] →
    * [[frameFingerprints]] → distinct (media, fh) → fingerprint-keyed
    * self-join → per-pair shared count + overlap = shared/min(|A|,|B|).
    * This is the end-to-end multimodal pipeline: typed Dataset seam in,
    * relational dedup out.
    *
    * Scale shape: media never compares all-pairs — only records sharing
    * a frame hash meet, via one 8-byte-key join (the substr_dedup
    * shingle shape). A frame shared by K media costs K² pair rows: cap
    * hot fingerprints first at web scale (the q_minhash_pairs maxBucket
    * convention — boilerplate intros/black frames are the celebrity
    * keys here). */
  def mediaNearDup(media: Dataset[MediaRecord], frameBytes: Int,
                   stride: Int, minShared: Long): DataFrame = {
    val fh = frameFingerprints(frameSample(media, frameBytes, stride))
      .select(col("media_id"), col("fh")).distinct()
      .localCheckpoint()
    val cnt = fh.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    val pairs = fh.as("x")
      .join(fh.as("y"), col("x.fh") === col("y.fh") &&
        col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id").as("a"), col("y.media_id").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(cnt.withColumnRenamed("media_id", "a").withColumnRenamed("nf", "nfa"), Seq("a"))
      .join(cnt.withColumnRenamed("media_id", "b").withColumnRenamed("nf", "nfb"), Seq("b"))
      .select(col("a"), col("b"), col("shared"),
        round(col("shared").cast("double") /
          least(col("nfa"), col("nfb")).cast("double"), 6).as("overlap"))
  }

  /** DuckDB oracle for [[mediaNearDup]] over [[mediaFromDocuments]]
    * payloads (ASCII text bytes ≡ chars, like the q_media_features
    * oracle): identical frame slicing, byte fold, and pair tree. */
  def mediaNearDupSql(docsTable: String, frameBytes: Int, stride: Int,
                      minShared: Long): String = {
    val hash = graft.functions.TextFunctions.charHashSql(
      s"substr(text, CAST(fi * $frameBytes + 1 AS BIGINT), $frameBytes)")
    s"WITH m AS (SELECT doc_id AS media_id, text FROM $docsTable), " +
      s"fr AS (SELECT media_id, unnest(range(0, " +
      s"(length(text) + ${frameBytes - 1}) // $frameBytes, $stride)) AS fi, " +
      "text FROM m), " +
      s"fh AS (SELECT DISTINCT media_id, $hash AS h FROM fr), " +
      "cnt AS (SELECT media_id, CAST(count(*) AS BIGINT) AS nf FROM fh GROUP BY media_id), " +
      "p AS (SELECT x.media_id AS a, y.media_id AS b, " +
      "CAST(count(*) AS BIGINT) AS shared FROM fh x " +
      "JOIN fh y ON x.h = y.h AND x.media_id < y.media_id GROUP BY a, b) " +
      "SELECT a, b, shared, round(CAST(shared AS DOUBLE) / " +
      "CAST(least(ca.nf, cb.nf) AS DOUBLE), 6) AS overlap " +
      "FROM p JOIN cnt ca ON p.a = ca.media_id " +
      "JOIN cnt cb ON p.b = cb.media_id " +
      s"WHERE shared >= $minShared"
  }

  /** One sampled frame (offset + payload slice) from a media record. */
  final case class MediaFrame(media_id: Long, frame_idx: Long, offset: Long,
                              frame: Array[Byte])

  /** STUB frame sampling — stands in for video frame extraction: emits
    * every record's payload cut into `frameBytes` slices, keeping one
    * slice per `stride`. One input record explodes to many typed frame
    * rows — the 1:N batch shape a real demuxer produces. */
  def frameSample(media: Dataset[MediaRecord], frameBytes: Int,
                  stride: Int): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0)
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = (r.content.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          val off = i * frameBytes
          MediaFrame(r.media_id, i.toLong, off.toLong,
            r.content.slice(off, math.min(off + frameBytes, r.content.length)))
        }
      }
    }
  }
}
