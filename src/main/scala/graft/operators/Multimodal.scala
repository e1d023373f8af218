package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A multimodal record: opaque payload bytes + typed metadata — the
  * image/audio/video column model (SURVEY.md §7.5). Payloads are `binary`
  * columns in Parquet; metadata travels as typed fields next to them.
  */
case class MediaRecord(
    media_id: Long,
    modality: String,        // "image" | "audio" | "video" | "text"
    payload: Array[Byte],
    byte_len: Int,
    content_hash: String)

/** Decoded features produced by the (stubbed) decoder. */
case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_frames: Int,
    feature: Array[Float])

/** Multimodal column plumbing. The decode step itself (image/audio codecs)
  * is STUBBED — the container has no media libraries — behind the
  * [[MediaDecoder]] trait with a deterministic fake; everything Spark-side
  * (schema, binary columns, partition-wise batch decode via mapPartitions,
  * feature schema) is real and tested.
  *
  * Scale notes: decode runs inside `mapPartitions`, so a real decoder
  * amortizes per-partition init (model load, codec context) exactly like a
  * Pandas-UDF batch would, and payload bytes never leave their partition
  * until an explicit shuffle is requested downstream.
  */
object Multimodal {

  /** Pluggable decoder boundary. A production impl wraps a codec here. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], modality: String): MediaFeatures
  }

  /** Deterministic fake: "frames" = payload sliced into 1 KiB chunks;
    * feature = 8 bytes-to-float moments of the payload. Stands in for a real
    * codec with identical Spark-side plumbing.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], modality: String): MediaFeatures = {
      val nFrames = math.max(1, payload.length / 1024)
      val feat = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        feat(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      MediaFeatures(-1L, modality, nFrames, feat)
    }
  }

  /** Build a media table from documents: payload = UTF-8 bytes of the text
    * (the stand-in corpus), modality assigned round-robin. Binary column +
    * metadata struct, Parquet-native.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video"), lit("text")),
          (col("doc_id") % 4 + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        octet_length(encode(col("text"), "UTF-8")).as("byte_len"),
        sha2(encode(col("text"), "UTF-8"), 256).as("content_hash"))

  /** Metadata projection (oracle-checkable: hashes and lengths, no decode). */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("media_id"), col("modality"), col("byte_len"), col("content_hash"))
      .orderBy(col("media_id"))

  /** Partition-wise batch decode through the stub decoder — the
    * mapPartitions shape a real codec would use. Returns the typed feature
    * Dataset.
    */
  def decodeFeatures(s: SparkSession, d: String,
                     decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, d).as[MediaRecord].mapPartitions { it =>
      // per-partition init happens here (codec context, model weights, …)
      it.map { r =>
        decoder.decode(r.payload, r.modality).copy(media_id = r.media_id)
      }
    }
  }

  /** Resized media record: payload transformed to a bounded-size rendition
    * plus the original length, the thumbnail-pipeline output shape.
    */
  final case class ResizedMedia(media_id: Long, modality: String,
                                orig_len: Int, payload: Array[Byte])

  /** Payload resize through the stub boundary — a real impl decodes,
    * scales and re-encodes; the fake stride-samples the payload down to
    * ≤ targetBytes, preserving determinism and the binary-in/binary-out
    * partition-local shape (no shuffle; rendition rides the scan).
    */
  def resizePayloads(s: SparkSession, d: String, targetBytes: Int = 256): Dataset[ResizedMedia] = {
    import s.implicits._
    mediaTable(s, d).as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        val out =
          if (n <= targetBytes) r.payload
          else Array.tabulate(targetBytes)(i => r.payload((i.toLong * n / targetBytes).toInt))
        ResizedMedia(r.media_id, r.modality, n, out)
      }
    }
  }

  /** Frame sampling: every k-th "frame" (1 KiB chunk) of the payload —
    * byte-slicing plumbing identical to real video frame extraction.
    */
  def frameSample(s: SparkSession, d: String, every: Int = 2): DataFrame =
    mediaTable(s, d)
      .select(col("media_id"), col("modality"),
        expr(s"transform(sequence(0, greatest(byte_len - 1, 0) div 1024), i -> i)")
          .as("frame_ids"))
      .select(col("media_id"), col("modality"),
        expr(s"filter(frame_ids, i -> i % $every = 0)").as("sampled_frames"))
      .select(col("media_id"), col("modality"),
        size(col("sampled_frames")).cast("int").as("n_sampled"))
      .orderBy(col("media_id"))
}
