package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus per-partition batch decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The decode step itself is STUBBED (this container ships no image or
  * audio codecs) behind [[FakeCodec]] — a deterministic stand-in — but
  * the Spark-side plumbing is real and tested: schema, binary columns,
  * `mapPartitions` batch shape (the Scala analog of `mapInPandas`: one
  * iterator per partition, amortizing per-batch codec setup), and the
  * partitioning story (media rows are large — keep
  * `spark.sql.files.maxPartitionBytes` small enough that one partition
  * of blobs fits executor memory).
  */
object Multimodal {

  /** Typed media row: the schema a 100 TB media lake would use —
    * content-addressed blob + dimensions/format metadata.
    */
  case class MediaRow(media_id: Long, media: Array[Byte], format: String,
                      width: Int, height: Int)

  case class MediaFeatures(media_id: Long, format: String,
                           n_bytes: Long, histogram: Array[Long])

  case class Frame(media_id: Long, frame_index: Int, frame: Array[Byte])

  /** Deterministic stand-in for a real codec. A production build swaps
    * this object for JNI/FFI bindings — the operator signatures and the
    * Spark plumbing do not change.
    */
  object FakeCodec {
    /** "Decode" = byte-value histogram over 16 buckets (deterministic,
      * content-sensitive — a real decoder would emit pixels).
      */
    def decodeFeatures(bytes: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xff) >> 4) += 1
        i += 1
      }
      hist
    }

    /** "Resize" = truncate/pad the blob to `targetBytes` (stands in for
      * pixel resampling; preserves determinism).
      */
    def resize(bytes: Array[Byte], targetBytes: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, targetBytes)

    /** "Frame-sample" = split the blob into fixed-size chunks and keep
      * every `stride`-th chunk (stands in for video frame extraction).
      */
    def sampleFrames(bytes: Array[Byte], frameBytes: Int,
                     stride: Int): Seq[Array[Byte]] =
      bytes.grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % stride == 0 => f }
        .toSeq
  }

  /** Synthesize a media table from the documents testdata (UTF-8 bytes
    * as the blob) — exercises the binary-column plumbing end to end
    * without shipping real media.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("fake/utf8").as("format"),
      (length(col("text")) % 640).cast("int").as("width"),
      (length(col("text")) % 480).cast("int").as("height"))

  /** The media table PLUS a deterministic re-upload population: every
    * `every`-th document's blob appears a second time under a shifted
    * media_id — the "same asset ingested twice" scenario that
    * content-addressed dedup ([[graft.queries.TrainingQueries.mediaDedup]])
    * exists to catch. The shift is `max(doc_id) + 1` (a one-row
    * aggregate both engines compute identically), NOT a fixed
    * constant: a constant offset collides shifted ids with genuine
    * doc_ids the moment the corpus outgrows it, breaking media_id
    * uniqueness and the total ORDER BY the oracle hash relies on.
    * Pure relational construction, so the oracle replays it exactly.
    */
  def mediaWithReuploads(docs: DataFrame, every: Long = 10): DataFrame = {
    val off = docs.agg((max("doc_id") + 1).as("__off"))
    mediaFromDocuments(docs).unionByName(
      mediaFromDocuments(
        docs.filter(pmod(col("doc_id"), lit(every)) === 0)
          .crossJoin(broadcast(off))
          .withColumn("doc_id", col("doc_id") + col("__off"))
          .drop("__off")))
  }

  /** Batch feature extraction: `mapPartitions` so codec setup happens
    * once per partition (the `mapInPandas` batch shape), not per row.
    */
  def extractFeatures(media: Dataset[MediaRow])
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (JNI handle, etc.)
      rows.map { r =>
        MediaFeatures(r.media_id, r.format, r.media.length.toLong,
          FakeCodec.decodeFeatures(r.media))
      }
    }
  }

  /** Batch resize: same `mapPartitions` batch shape as
    * [[extractFeatures]] (per-partition codec init amortized), blob
    * replaced by its byte-resized form — the normalize-before-training
    * step of an image pipeline. `width`/`height` are deliberately
    * UNTOUCHED: the stub codec resizes bytes, not pixels, so
    * rewriting pixel metadata here would fabricate dimensions; a real
    * codec swap updates them from its actual output frame.
    */
  def resizeMedia(media: Dataset[MediaRow], targetBytes: Int)
                 (implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(media = FakeCodec.resize(r.media, targetBytes)))
    }
  }

  /** Frame sampling as a flatMap (one media row → many frame rows). */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int, stride: Int)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { r =>
      FakeCodec.sampleFrames(r.media, frameBytes, stride).zipWithIndex
        .map { case (f, i) => Frame(r.media_id, i, f) }
    }
  }
}
