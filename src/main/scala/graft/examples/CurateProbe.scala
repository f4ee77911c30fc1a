package graft.examples

import org.apache.spark.sql.SparkSession

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Dev-only stage-cost probe for the curation pipeline: times each
  * stage of [[graft.queries.TrainingPipeline.curate]] in isolation to
  * attribute wall time before optimizing. Not part of the library
  * surface.
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm scan

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    for (_ <- 1 to 2) {
      time("quality_metrics")(TextAnalysis.qualityMetrics(docs).count())
      time("quality+lang")(
        TextAnalysis.languageId(TextAnalysis.qualityMetrics(docs)).count())
      time("exact_dedup")(Dedup.exact(docs).count())
      time("shingles")(Dedup.shingles(docs).count())
      time("ngram_jaccard")(Dedup.ngramJaccard(docs, threshold = 0.8).count())
      time("ngram_jaccard_capped")(
        Dedup.ngramJaccard(docs, threshold = 0.8, maxDf = Some(1000)).count())
      time("chunk")(TextAnalysis.chunkTokens(docs, 64, 48).count())
      time("full_curate")(
        graft.queries.TrainingPipeline.curate(docs).count())
    }
    spark.stop()
  }
}
