package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (BASELINE.json north star): tokenization, quality scoring,
  * language-ID, fingerprinting. All built-in Catalyst expressions — no
  * UDFs — so they stay inside whole-stage codegen and scale linearly
  * with input splits (no shuffle except where aggregation demands it).
  */
object TextAnalysis {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: word pieces + punctuation marks counted
    * separately (`\w+` runs and single non-space-non-word chars), the
    * standard pre-tokenizer regex shape.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\w]+|[^\\w\\s]"), lit(0)))

  /** Document fingerprint: md5 of case-folded, whitespace-collapsed
    * text — the normalization the reference applies to strings (trim)
    * extended to content hashing (reference MD5 CDC,
    * `Task_1_sync_bls_files.py:99-107`).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** English stopwords used by the quality heuristics (tiny built-in
    * list; deterministic).
    */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Public knowledge (the usual top function words).
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "es" -> Seq("de", "la", "que", "el", "en", "los", "del", "las", "por", "un"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "du", "que", "une"),
    "de" -> Seq("der", "die", "und", "das", "von", "den", "des", "im", "ein", "mit"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人")
  )

  /** Quality metrics per document: char length, token count, mean token
    * length, punctuation ratio, stopword ratio, and a composite score.
    * Division guards (`nullif`) keep ANSI mode safe on empty text.
    */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    val stopArr = array(stopwords.map(lit): _*)
    df
      .withColumn("n_chars_q", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("mean_token_len",
        round(length(regexp_replace(trim(t), "\\s+", "")) /
          nullif(nTok, lit(0.0)), 6))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(t, lit("[^\\w\\s]"), lit(0))) /
          nullif(length(t).cast("double"), lit(0.0)), 6))
      .withColumn("stopword_ratio",
        round(size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
          nullif(nTok, lit(0.0)), 6))
      .withColumn("quality_score", qualityScore(
        col("n_tokens"), col("mean_token_len"), col("punct_ratio")))
  }

  /** Composite quality score in [0, 1] (the filter threshold a data
    * pipeline gates on): length credit (saturating at 64 tokens),
    * penalized by punctuation excess and degenerate token lengths.
    * Fixed weights; pure arithmetic so any engine reproduces it.
    */
  def qualityScore(nTokens: Column, meanTokenLen: Column,
                   punctRatio: Column): Column = {
    val lengthCredit = least(nTokens.cast("double") / 64.0, lit(1.0))
    val punctPenalty = least(punctRatio * 5.0, lit(1.0))
    val lenPenalty = when(meanTokenLen.isNull, 1.0)
      .when(meanTokenLen < 2.0 || meanTokenLen > 12.0, 0.5)
      .otherwise(0.0)
    round(greatest(
      lengthCredit * (lit(1.0) - punctPenalty) * (lit(1.0) - lenPenalty * 0.5),
      lit(0.0)), 6)
  }

  /** Language-ID: score each candidate language by the fraction of its
    * stopword profile present in the token set, pick the argmax
    * (deterministic tie-break: language code ascending). Pure expression
    * tree — the per-language scores are literal array intersections, so
    * the whole operator is a narrow map over the scan.
    */
  def languageId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    // langs sorted so ties resolve to the lexicographically first code
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*)))
          .cast("double").as("score"),
        lit(lang).as("lang"))
    }
    // array_max on structs orders by (score, lang) lexicographically;
    // to make ties pick the SMALLEST lang we invert: take max score,
    // then the first lang achieving it.
    val arr = array(scored: _*)
    val maxScore = array_max(expr(
      "transform(__lang_scores, s -> s.score)"))
    df.withColumn("__lang_scores", arr)
      .withColumn("__max_score", maxScore)
      .withColumn("lang_pred",
        expr("filter(__lang_scores, s -> s.score = __max_score)[0].lang"))
      .withColumn("lang_score", col("__max_score"))
      .drop("__lang_scores", "__max_score")
  }
}
