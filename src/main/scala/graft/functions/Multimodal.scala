package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed by typed `mapPartitions` stages (the Scala analogue
  * of arrow-batched Pandas UDFs: per-partition iterator, Encoder-managed
  * (de)serialization at the codegen boundary).
  *
  * The actual codec step is STUBBED — image/audio libraries are not in this
  * container — with a deterministic fake that reads real bytes, so the
  * Spark-side contract (schema, partitioning, batch iteration, binary
  * payload flow) is real and tested. Swap `decodeStub` for a JNI/library
  * call in production; nothing else changes.
  */
object Multimodal {

  /** One media payload: id + opaque bytes + declared format. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String)

  /** Extracted metadata (what a real decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, magic: Int, n_frames: Long, format: String)

  /** One sampled frame. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Pack a text column as a binary media payload (stand-in for real image/
    * audio bytes; deterministic). */
  def encodeAsBinary(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(textCol).cast("binary").as("media"),
      lit("txt").as("format"))

  /** STUB decode: byte-level "header parse". A real implementation would
    * call the codec here (per-partition, so native handles are reused
    * across the batch); the deterministic fake keeps the pipeline testable
    * without media libraries. */
  private def decodeStub(bytes: Array[Byte]): (Int, Long) = {
    val magic = if (bytes.nonEmpty) bytes(0) & 0xff else -1
    val nFrames = bytes.length / 100L // fake: 100 bytes per "frame"
    (magic, nFrames)
  }

  /** Feature-extraction stage: one iterator pass per partition. */
  def extractMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { r =>
      val (magic, nFrames) = decodeStub(r.media)
      MediaMeta(r.doc_id, r.media.length.toLong, magic, nFrames, r.format)
    })
  }

  /** Resize stage: normalize every frame to exactly `size` bytes
    * (truncate or zero-pad) — the shape of image resizing, where a real
    * implementation would call the codec's scaler on each batch element. */
  def resizeFrames(ds: Dataset[Frame], size: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { f =>
      val out = java.util.Arrays.copyOf(f.frame, size) // truncates or zero-pads
      Frame(f.doc_id, f.frame_idx, out)
    })
  }

  /** Frame-sampling stage: split the payload into fixed-size "frames" and
    * keep every `stride`-th one (the shape of video frame sampling). */
  def sampleFrames(ds: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap { r =>
      r.media.grouped(frameSize).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(r.doc_id, i, bytes)
      }
    })
  }
}
