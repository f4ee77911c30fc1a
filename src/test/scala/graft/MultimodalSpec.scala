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

  test("resizeMedia: every blob lands at the target size, ids kept") {
    implicit val s = spark
    val media = Seq(
      MediaRow(1L, Array.tabulate[Byte](100)(_.toByte), "fake/utf8", 10, 10),
      MediaRow(2L, Array.tabulate[Byte](7)(_.toByte), "fake/utf8", 7, 1))
      .toDS()
    val out = Multimodal.resizeMedia(media, targetBytes = 32)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(out.forall(_.media.length === 32))
    // truncation keeps the prefix; padding zero-fills past the source
    assert(out(0).media.toSeq === (0 until 32).map(_.toByte).toSeq)
    assert(out(1).media.slice(0, 7).toSeq === (0 until 7).map(_.toByte).toSeq)
    assert(out(1).media.drop(7).forall(_ === 0.toByte))
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

  test("mediaDedup: one keeper per digest, re-uploads never win") {
    import org.apache.spark.sql.functions.max
    val out = graft.queries.TrainingQueries.mediaDedup(spark, sfDir)
      .collect()
    // re-uploads are shifted past max(doc_id) — derive the threshold
    // from the data (the offset is max+1, not a constant)
    val cut = graft.io.Tables.documents(spark, sfDir)
      .agg(max("doc_id")).head().getLong(0)
    val byDigest = out.groupBy(_.getString(1))
    // exactly one kept row per content digest
    assert(byDigest.values.forall(_.count(_.getBoolean(2)) === 1))
    // a re-upload (shifted id) can never be the keeper of its group:
    // the original carries the smaller media_id
    val reupKept = out.filter(r => r.getLong(0) > cut && r.getBoolean(2))
    assert(reupKept.isEmpty,
      s"re-uploads marked kept: ${reupKept.map(_.getLong(0)).toSeq}")
    // every re-upload's group has >= 2 members (its original is present)
    val reups = out.filter(_.getLong(0) > cut)
    assert(reups.nonEmpty)
    assert(reups.forall(r => byDigest(r.getString(1)).length >= 2))
    // no id collisions between originals and re-uploads
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("mediaNearDup: signature clusters partition the corpus with " +
      "one min-id keeper each") {
    val out = graft.queries.TrainingQueries.mediaNearDup(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val bySig = out.groupBy(_.getLong(1))
    // one kept row per signature, and it carries the cluster's min id
    bySig.values.foreach { rows =>
      assert(rows.count(_.getBoolean(3)) === 1)
      val keeper = rows.filter(_.getBoolean(3)).head.getLong(0)
      assert(keeper === rows.map(_.getLong(0)).min)
      // n_members agrees with the actual cluster size on every row
      assert(rows.forall(_.getLong(2) === rows.length.toLong))
    }
    // every media row appears exactly once (clustering partitions)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }
}
