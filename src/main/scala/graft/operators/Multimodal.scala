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
