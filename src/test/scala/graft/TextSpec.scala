package graft

import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "The quick brown fox, it jumps!"),
    (1L, "de la que el en los del las por un texto"),
    (2L, "a b c"),
    (3L, "der die und das von den des im ein mit")
  ).toDF("doc_id", "text")

  test("token counts: whitespace vs regex pieces") {
    val r = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.regexTokenCount(col("text")).as("re"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(r(0L) === ((6, 8)))  // 6 ws tokens; 6 words + ',' + '!'
    assert(r(2L) === ((3, 3)))
  }

  test("quality metrics: ratios bounded, stopword ratio counts tokens") {
    val r = TextAnalysis.qualityMetrics(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val d0 = r(0L)
    assert(d0.getAs[Long]("n_tokens") === 6L)
    // "The"(cased) not matched; "it" matched -> 1/6
    assert(math.abs(d0.getAs[Double]("stopword_ratio") - 1.0 / 6) < 1e-6)
    assert(d0.getAs[Double]("punct_ratio") > 0.0)
    assert(d0.getAs[Double]("punct_ratio") < 0.2)
  }

  test("language id: stopword profiles pick the right language") {
    val r = TextAnalysis.languageId(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("lang_pred")).toMap
    assert(r(1L) === "es")
    assert(r(3L) === "de")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq((0L, "Hello  World"), (1L, "hello world"), (2L, "other"))
      .toDF("doc_id", "text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }
}
