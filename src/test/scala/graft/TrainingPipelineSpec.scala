package graft

import org.apache.spark.sql.functions._

import graft.queries.TrainingPipeline
import graft.text.TextAnalysis

/** End-to-end curation properties on the documents fixture: the
  * composed pipeline must preserve each stage's guarantee.
  */
class TrainingPipelineSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val curated = TrainingPipeline.curate(docs,
    minQuality = 0.2, chunkSize = 32, stride = 24).cache()

  test("pipeline yields chunks and drops something (filters are live)") {
    val nDocs = curated.select("doc_id").distinct().count()
    assert(curated.count() > 0)
    assert(nDocs > 0 && nDocs < docs.count(),
      s"expected quality/near-dup filters to drop documents: $nDocs")
  }

  test("no two surviving documents share a fingerprint") {
    val survivors = curated.select("doc_id").distinct()
    val fps = docs.join(survivors, Seq("doc_id"))
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(fps.count() === fps.distinct().count())
  }

  test("every chunk respects the window size and quality floor") {
    assert(curated.filter(col("chunk_tokens") > 32 ||
      col("chunk_tokens") < 1).count() === 0)
    assert(curated.filter(col("quality_score") < 0.2).count() === 0)
    assert(curated.filter(!col("split").isin("train", "test")).count() === 0)
  }

  test("splitBucket matches the Knuth hash and survives huge ids") {
    import spark.implicits._
    import graft.queries.TrainingQueries.splitBucket
    // includes ids past 2^31 and past the ANSI-overflow boundary of the
    // naive `id * 2654435761L` spelling (~3.47e9)
    val ids = Seq(0L, 1L, 17L, 499L, 2147483648L, 5000000000L, 1L << 40)
    val got = ids.toDF("id").select(splitBucket(col("id")).as("b"))
      .collect().map(_.getLong(0))
    val want = ids.map { id =>
      ((BigInt(id).mod(BigInt(2).pow(32)) * BigInt(2654435761L))
        .mod(BigInt(2).pow(32)).mod(100)).toLong
    }
    assert(got.toSeq === want)
  }

  test("observed curation: audit counts match recomputed stage counts") {
    val (out, obs) = TrainingPipeline.curateObserved(docs,
      minQuality = 0.2, chunkSize = 32, stride = 24)
    out.write.mode("overwrite").format("noop").save() // one action
    val kept = obs.view.mapValues(_.get("n").asInstanceOf[Long]).toMap
    // attrition is monotone through the stages
    assert(kept("kept_quality") >= kept("kept_exact"))
    assert(kept("kept_exact") >= kept("kept_neardup"))
    // the final stage count equals the surviving distinct documents
    val survivors = curated.select("doc_id").distinct().count()
    assert(kept("kept_neardup") === survivors,
      s"observed ${kept("kept_neardup")} vs recomputed $survivors")
    // and the quality stage matches an independent recount
    val q = TextAnalysis.languageId(TextAnalysis.qualityMetrics(docs))
      .filter(col("quality_score") >= 0.2).count()
    assert(kept("kept_quality") === q)
  }

  test("split is deterministic and ~90/10 by document") {
    val again = TrainingPipeline.curate(docs,
      minQuality = 0.2, chunkSize = 32, stride = 24)
    assert(curated.orderBy("doc_id", "chunk_id").collect().toSeq ===
      again.orderBy("doc_id", "chunk_id").collect().toSeq)
    val perDoc = curated.select("doc_id", "split").distinct()
    val train = perDoc.filter(col("split") === "train").count().toDouble
    val ratio = train / perDoc.count()
    assert(ratio > 0.75 && ratio < 1.0, s"train ratio $ratio")
  }

  test("target encode: OOF means exclude the own fold, bounded by [0,1]") {
    import graft.queries.TrainingQueries
    val rows = TrainingQueries.targetEncode(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // |cats| x |folds| rows, every encoding a smoothed probability
    rows.foreach { r =>
      assert(r.getDouble(3) > 0 && r.getDouble(3) < 1, r)
      assert(r.getLong(2) > 0, r)
    }
    // within a category the five OOF encodings are not all identical
    // (each fold's exclusion shifts the mean) unless folds are empty
    val anyVariation = rows.groupBy(_.getString(0)).exists {
      case (_, rs) => rs.map(_.getDouble(3)).distinct.length > 1
    }
    assert(anyVariation, "OOF exclusion had no effect on any category")
  }

  test("woe bins: 10 bins, IV components finite, counts add up") {
    import graft.queries.TrainingQueries
    val rows = TrainingQueries.woeBins(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), r)        // n_bad <= n
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite, r)
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(rows.map(_.getLong(1)).sum === li, "bins must partition rows")
  }

  test("feature hash: buckets in [0,256), per-doc counts match tokens") {
    import graft.queries.TrainingQueries
    val rows = TrainingQueries.featureHash(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    // bucket counts per doc must sum to the doc's token count
    val got = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val want = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+"))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (doc, n) => assert(n === want(doc), s"doc $doc") }
  }

  test("curateV2: classifier gate, removal accounting, chunk coverage") {
    import graft.queries.TrainingPipeline
    import graft.text.QualityModel
    val docs = graft.io.Tables.documents(spark, sfDir)
    val out = TrainingPipeline.curateV2(docs).collect()
    assert(out.nonEmpty, "v2 pipeline must yield chunks")
    // every surviving doc passed the classifier (scores are carried
    // through unchanged — cross-check against direct scoring)
    val scores = QualityModel.scoreDocs(docs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("score_micro")).toMap
    out.foreach { r =>
      val (doc, s) = (r.getLong(0), r.getAs[Long]("score_micro"))
      assert(s > 0 && s === scores(doc), s"doc $doc score")
    }
    // chunk accounting per doc: windows tile the cleaned token count
    // (last chunk truncated, stride 24 / size 32)
    out.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      val byId = rows.sortBy(_.getAs[Long]("chunk_id"))
      val last = byId.last
      val nClean = last.getAs[Long]("chunk_id") * 24 +
        last.getAs[Long]("chunk_tokens")
      byId.init.foreach(r =>
        assert(r.getAs[Long]("chunk_tokens") === 32L,
          s"doc $doc non-final chunk must be full"))
      assert(nClean >= 8, s"doc $doc below the min-clean-tokens floor")
    }
    // the pipeline actually attrites (filters + dedup are live)
    assert(out.map(_.getLong(0)).distinct.length < docs.count())
  }
}
