package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRow

/** Multimodal plumbing: binary columns, typed metadata, mapPartitions
  * batch shape, frame sampling. The codec is the deterministic stub —
  * the Spark plumbing is what's under test.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mediaFromDocuments produces binary media with typed metadata") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs)
    val schema = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(schema("media") === "binary")
    assert(schema("format") === "string")
    assert(media.count() === docs.count())
  }

  test("extractFeatures: histogram sums to byte length, deterministic") {
    implicit val s = spark
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val media = Multimodal.mediaFromDocuments(docs).as[MediaRow]
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 50)
    feats.foreach { f =>
      assert(f.histogram.sum === f.n_bytes)
      assert(f.histogram.length === 16)
    }
  }

  test("sampleFrames: stride-2 keeps every other fixed-size chunk") {
    implicit val s = spark
    val media = Seq(MediaRow(1L, Array.tabulate[Byte](100)(_.toByte),
      "fake/utf8", 10, 10)).toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 10, stride = 2)
      .collect().sortBy(_.frame_index)
    assert(frames.length === 5) // chunks 0,2,4,6,8
    assert(frames.head.frame.toSeq === (0 until 10).map(_.toByte).toSeq)
  }
}
