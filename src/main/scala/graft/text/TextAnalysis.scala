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

  /** Lowercased whitespace tokens with empty strings removed — the
    * vocabulary-grade tokenizer (blank text contributes NO tokens,
    * where bare [[tokens]] yields [""]). One definition so every
    * vocabulary-level diagnostic (KL, feature hashing, co-occurrence)
    * tokenizes identically.
    */
  def tokensLower(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= "")

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

  /** Model-based quality scoring — the batch-inference shape a
    * classifier-filtered pipeline (fastText/DCLM-style) runs: sigmoid
    * of a weight·feature dot product. The weights here are fixed
    * literals; a real model's coefficients reach executors exactly the
    * same way (driver-side constants folded into codegen — broadcast
    * in spirit, no lookup join, no UDF). Input must already carry the
    * [[qualityMetrics]] columns. Purely arithmetic → engine-portable.
    */
  def modelQualityScore(df: DataFrame): DataFrame = {
    val z = lit(-1.0) +
      least(col("n_tokens").cast("double") / 64.0, lit(1.0)) * 2.5 -
      col("punct_ratio") * 3.0 +
      col("stopword_ratio") * 1.5
    df.withColumn("model_score", round(lit(1.0) / (lit(1.0) + exp(-z)), 6))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A1.1 — the MassiveText filter),
    * re-grained for token-structured corpora (this testdata has no
    * line structure, so the line-grain rules are represented by their
    * token/n-gram analogues — the same signals the paper's
    * repetition table drives):
    *
    *  - `n_words` — word count (Gopher: 50 ≤ words ≤ 100 000);
    *  - `mean_word_len` — mean word length (Gopher: in [3, 10]);
    *  - `top_bigram_frac` — fraction of 2-gram instances taken by the
    *    single most frequent 2-gram (Gopher: "fraction of characters
    *    in most common n-gram" family);
    *  - `dup_trigram_frac` — fraction of 3-gram instances that are
    *    repeats of an earlier 3-gram (Gopher's duplicate-n-gram
    *    family), `1 − distinct/total`;
    *  - `n_stop_distinct` — distinct stopwords present (Gopher's
    *    "contains ≥ 2 stop words" rule);
    *  - `keep` — the composite gate.
    *
    * EXACTNESS: `keep` compares CROSS-MULTIPLIED INTEGERS
    * (`100·max ≤ thr·total` instead of `max/total ≤ thr/100`), so the
    * gate has no float anywhere and replays bit-exactly on any
    * engine; only the DISPLAY ratios carry the standing 6-dp rounding
    * caveat. Thresholds are calibrated to this corpus's measured
    * quantiles (BASELINE.md §13) so the gate actually separates:
    * words ≥ 30, 3 ≤ mean len ≤ 10, top-bigram ≤ 6 %,
    * dup-trigram ≤ 2 %, ≥ 2 distinct stopwords.
    *
    * Scale shape: one narrow map for the per-doc scalars plus two
    * generator→two-level-aggregate legs (bigram, trigram) keyed on
    * the doc id — partial aggregation collapses per-doc counts
    * map-side, so the shuffle carries distinct (doc, gram) rows,
    * bounded by document length, never corpus-quadratic. The gram
    * fan-out is the NATIVE [[graft.functions.TokenShingles]]
    * generator (tokenizes once per row, emits k-grams directly):
    * the first cut built the gram arrays with `transform(sequence,
    * i -> concat(element_at(toks, i)…))`, and Catalyst's
    * CollapseProject inlined the whole tokenize expression into
    * EVERY captured `element_at` — O(tokens²) re-tokenization per
    * doc, measured 37 s cpu over sf0.1 vs 1.5 s for this form (the
    * same interpreted-HOF trap the SimHash scaladoc documents).
    *
    * Output: `(idCol, n_words, mean_word_len, top_bigram_frac,
    * dup_trigram_frac, n_stop_distinct, keep)`; docs with NULL/blank
    * text keep n_words = 0, NULL metrics, keep = false.
    */
  def gopherRules(df: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    // coalesce the ARRAY, not the size: size(NULL) is -1 under the
    // legacy sizeOfNull conf, so a NULL-text doc would read -1 words
    val toks = coalesce(tokensLower(col(textCol)),
      array().cast("array<string>"))
    // byte-level gram HASHES (VERDICT r10 #7): the gram legs only use
    // the gram as a grouping key (max/sum/count per (doc, gram)), so
    // the xxhash64 of the gram keys the same groups as the string —
    // barring 64-bit collisions, the family's documented posture —
    // with zero gram-string materialization. GramHashes' lower/
    // dropEmpty mode tokenizes exactly like tokensLower (trim, lower,
    // \s+ split, drop empties), so group counts match the oracle's
    def gramLeg(k: Int): DataFrame = df
      .select(col(idCol),
        graft.functions.GramHashes.gramHashesLowerAll(col(textCol), k))
      .select(col(idCol), col("h").as("__g"))
    val base = df.select(
      col(idCol),
      coalesce(size(toks), lit(0)).cast("long").as("n_words"),
      coalesce(length(array_join(toks, "")), lit(0)).cast("long")
        .as("__sum_len"),
      coalesce(size(array_intersect(toks,
        array(stopwords.map(lit): _*))), lit(0)).cast("long")
        .as("n_stop_distinct"))
    val bg = gramLeg(2)
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(idCol)
      .agg(max("__c").as("__bg_max"), sum("__c").as("__bg_tot"))
    val tg = gramLeg(3)
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("__tg_dis"), sum("__c").as("__tg_tot"))
    base
      .join(bg, Seq(idCol), "left")
      .join(tg, Seq(idCol), "left")
      .withColumn("mean_word_len",
        round(col("__sum_len") /
          nullif(col("n_words").cast("double"), lit(0.0)), 6))
      .withColumn("top_bigram_frac",
        round(col("__bg_max") / col("__bg_tot").cast("double"), 6))
      .withColumn("dup_trigram_frac",
        round((col("__tg_tot") - col("__tg_dis")) /
          col("__tg_tot").cast("double"), 6))
      .withColumn("keep",
        col("n_words") >= 30 &&
          col("__sum_len") >= col("n_words") * 3 &&
          col("__sum_len") <= col("n_words") * 10 &&
          coalesce(col("__bg_max") * 100 <= col("__bg_tot") * 6,
            lit(false)) &&
          coalesce((col("__tg_tot") - col("__tg_dis")) * 100 <=
            col("__tg_tot") * 2, lit(false)) &&
          col("n_stop_distinct") >= 2)
      .select(col(idCol), col("n_words"), col("mean_word_len"),
        col("top_bigram_frac"), col("dup_trigram_frac"),
        col("n_stop_distinct"), col("keep"))
  }

  /** Token-repetition ratio (Gopher-style repetition quality signal):
    * fraction of tokens that are repeats of an earlier token,
    * `1 − |distinct tokens| / |tokens|`. Narrow map — array ops only.
    */
  def repetitionRatio(text: Column): Column = {
    val toks = tokens(text)
    round(lit(1.0) - size(array_distinct(toks)) /
      nullif(size(toks).cast("double"), lit(0.0)), 6)
  }

  /** Fixed-size sliding token chunks (the training-sample windowing
    * step): chunk i covers tokens [i·stride+1, i·stride+chunkSize],
    * 1-based, last chunk truncated. Emits one row per (doc, chunk) via
    * posexplode of a per-row index sequence — a narrow `chunks`× fan-out
    * with no shuffle; at 100 TB this is the map stage before a
    * repartition-by-chunk-hash write.
    *
    * Output: input columns + `(chunk_id, chunk_text, chunk_tokens)`.
    */
  def chunkTokens(df: DataFrame, chunkSize: Int = 32, stride: Int = 24,
                  textCol: String = "text"): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"need 1 <= stride <= chunkSize: $stride/$chunkSize")
    val toks = tokens(col(textCol))
    val n = size(toks)
    // chunk count: 1 if n<=chunkSize else ceil((n-chunkSize)/stride)+1
    val nChunks = when(n <= chunkSize, lit(1)).otherwise(
      floor(((n - chunkSize + stride - 1) / stride)).cast("int") + 1)
    df.withColumn("__toks", toks)
      .withColumn("__nc", nChunks)
      .select(col("*"),
        posexplode(expr("sequence(0, __nc - 1)")).as(Seq("chunk_id", "__i")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1,
          lit(chunkSize)), " "))
      .withColumn("chunk_tokens",
        least(lit(chunkSize),
          size(col("__toks")) - col("chunk_id") * stride).cast("long"))
      .withColumn("chunk_id", col("chunk_id").cast("long"))
      .drop("__toks", "__nc", "__i")
  }

  /** PII-shaped redaction (training-data scrubbing): emails →
    * `<EMAIL>`, then 4+-digit runs → `<NUM>`; counts of each kept for
    * audit. `n_long_nums` is counted on the EMAIL-REDACTED text so the
    * counts reconcile exactly with the `<NUM>` tokens in the output
    * (digits inside an email are part of its `<EMAIL>` redaction, not a
    * separate number). Pure regexp expressions — codegen'd, narrow.
    */
  def redact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val numRe = "\\d{4,}"
    val emailFree = regexp_replace(col(textCol), emailRe, "<EMAIL>")
    df.withColumn("n_emails",
        size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_long_nums",
        size(regexp_extract_all(emailFree, lit(numRe), lit(0))).cast("long"))
      .withColumn("redacted", regexp_replace(emailFree, numRe, "<NUM>"))
  }

  /** Character-level Shannon entropy (gibberish / binary-junk quality
    * signal): −Σ p(c)·log₂p(c) over the characters of the first
    * `prefixLen` chars of the document. The prefix cap bounds the
    * explode fan-out to `prefixLen` rows per document — at 100 TB the
    * per-doc cost is a constant, and a quality heuristic on a 1000-char
    * prefix separates text from junk as well as the full scan. Two
    * keyed aggregations (doc×char counts, then per-doc entropy), no
    * interpreted higher-order functions.
    *
    * Output: `(idCol, char_entropy, n_chars_sampled)`, one row per doc
    * with non-empty text.
    */
  def charEntropy(df: DataFrame, prefixLen: Int = 1000,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val chars = df
      .select(col(idCol),
        explode(split(substring(col(textCol), 1, prefixLen), ""))
          .as("ch"))
      .filter(col("ch") =!= "") // Java split keeps a trailing empty
    val freq = chars.groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).cast("double").as("c"))
    val tot = freq.groupBy(col(idCol)).agg(sum("c").as("n"))
    freq.join(tot, Seq(idCol))
      .groupBy(col(idCol), col("n"))
      .agg(round(-sum((col("c") / col("n")) * log2(col("c") / col("n"))), 6)
        .as("char_entropy"))
      .select(col(idCol), col("char_entropy"),
        col("n").cast("long").as("n_chars_sampled"))
  }

  /** Markup/boilerplate strip (web-extraction cleanup before dedup and
    * quality scoring): removes HTML-ish tags and character entities,
    * collapses the leftover whitespace, and keeps audit counts of what
    * was removed — the trafilatura-shaped step of a web-crawl pipeline
    * reduced to its deterministic regex core. Pure `regexp_*`
    * expressions: codegen'd, narrow, linear in input bytes at any
    * scale.
    *
    * Output: input columns + `(n_tags, n_entities, clean_text)`.
    */
  def stripMarkup(df: DataFrame, textCol: String = "text"): DataFrame = {
    val tagRe = "<[^>]*>"
    val entRe = "&[a-zA-Z]+;|&#[0-9]+;"
    val noTags = regexp_replace(col(textCol), tagRe, " ")
    // entities counted AFTER tag removal so an entity inside a tag
    // attribute is part of the tag's removal, not double-counted
    df.withColumn("n_tags",
        size(regexp_extract_all(col(textCol), lit(tagRe), lit(0))).cast("long"))
      .withColumn("n_entities",
        size(regexp_extract_all(noTags, lit(entRe), lit(0))).cast("long"))
      .withColumn("clean_text",
        trim(regexp_replace(regexp_replace(noTags, entRe, " "), "\\s+", " ")))
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
