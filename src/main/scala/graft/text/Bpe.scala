package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch, "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 §3.2)
  * — tokenizer TRAINING, the step upstream of the token-counting
  * proxies in [[TextAnalysis]].
  *
  * Spark-shaped split (same pattern as [[graft.sim.Pca]] and
  * [[graft.sim.ProductQuantizer]]: the data-sized pass is distributed,
  * the model fit runs on the aggregated sufficient statistic):
  *  - the corpus scan reduces to a WORD-FREQUENCY table (one
  *    groupBy/count — this is the only step that sees all the data, and
  *    it's the same aggregate every production BPE trainer starts from);
  *  - the merge loop runs driver-side over that vocab-bounded table
  *    (per-language word vocabularies are ~10⁵–10⁶ entries — model
  *    state, not data; were the vocab ever too big, each pair-count
  *    round is itself one more groupBy/sum, but none of the classic
  *    trainers bother and neither do we).
  *
  * Determinism: merge choice ties break lexicographically on the pair,
  * so the same corpus always learns the same merges — required for the
  * rows-only correctness check on q_bpe.
  */
object Bpe {

  /** One learned merge: rank (0-based), the two adjacent symbols
    * merged, and the weighted pair frequency at merge time.
    */
  final case class Merge(rank: Int, left: String, right: String,
                         freq: Long)

  /** End-of-word sentinel (the paper's `</w>`): keeps "low" in "lowest"
    * distinct from word-final "low", so merges learn word-boundary
    * structure.
    */
  val Eow = "</w>"

  /** Learn `nMerges` merges from a text column. The DataFrame leg is
    * the word-frequency aggregate; the loop is classic BPE on the
    * driver.
    */
  def learnMerges(docs: DataFrame, textCol: String,
                  nMerges: Int, minFreq: Long = 2): Seq[Merge] = {
    val wordFreq = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect()                     // vocab-bounded model statistic
      .map(r => r.getString(0) -> r.getLong(1))
    learnFromWordFreq(wordFreq, nMerges, minFreq)
  }

  /** The merge loop itself, exposed for spec-level golden tests. */
  def learnFromWordFreq(wordFreq: Seq[(String, Long)], nMerges: Int,
                        minFreq: Long = 2): Seq[Merge] = {
    // each word as its symbol sequence: chars + the end-of-word mark
    var words: Seq[(Vector[String], Long)] = wordFreq.map { case (w, c) =>
      (w.map(_.toString).toVector :+ Eow, c)
    }
    val out = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      // max by count; ties → lexicographically smallest pair
      val best = pairCounts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption.filter(_._2 >= minFreq)
      best match {
        case None => done = true
        case Some(((a, b), c)) =>
          out += Merge(rank, a, b, c)
          val merged = a + b
          words = words.map { case (syms, wc) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                nb += merged; i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), wc)
          }
          rank += 1
      }
    }
    out.result()
  }

  /** Distributed tokenization with a learned merge list: `(doc_id,
    * bpe_tokens)` per document. `mapPartitions` is the right tool here
    * (same judgment as the multimodal codec plumbing): the merge table
    * is a broadcast read-only model, and per-partition we memoize
    * word → segmentation — under a Zipfian vocabulary most words repeat
    * within a partition, so the merge loop runs roughly once per
    * DISTINCT word per partition, not once per token. Narrow map, no
    * shuffle; at 100 TB this is embarrassingly parallel.
    */
  def tokenize(docs: DataFrame, textCol: String, merges: Seq[Merge],
               idCol: String = "doc_id",
               outCol: String = "bpe_tokens"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.sortBy(_.rank).map(m => (m.left, m.right)).toVector)
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Vector[String]]
        def seg(word: String): Vector[String] =
          memo.getOrElseUpdate(word, {
            var syms = word.map(_.toString).toVector :+ Eow
            for ((a, b) <- ms) {
              val nb = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  nb += a + b; i += 2
                } else { nb += syms(i); i += 1 }
              }
              syms = nb.result()
            }
            syms
          })
        it.map { case (id, text) =>
          val words =
            if (text == null) Array.empty[String]
            else text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          (id, words.flatMap(seg).toSeq)
        }
      }
      .toDF(idCol, outCol)
  }

  /** DuckDB SQL replay of [[tokenize]] under a FIXED merge table — the
    * seed-model trick (same discipline as the seed-codebook PQ oracle,
    * [[graft.sim.ProductQuantizer]]): training is data-dependent and
    * iterative (rows-only checkable), but tokenization under a frozen
    * merge list is a deterministic string rewrite BOTH engines can
    * express exactly, so the tokenizer itself gets a hash oracle.
    *
    * Encoding: the symbol sequence of a whole document is one string
    * where every symbol is wrapped in its own U+001F (unit separator) boundary
    * pair (`<US>sym<US>`), so an adjacent pair (a,b) appears as the
    * unambiguous substring `<US>a<US><US>b<US>` and SQL
    * `replace` — which substitutes non-overlapping occurrences left to
    * right, exactly the single-pass BPE merge sweep in [[tokenize]] —
    * applies one merge per call. Chaining the replaces in rank order
    * replays the greedy inference rule. Merging at the DOC level (all
    * words in one string) is sound because a word's last symbol always
    * carries the `</w>` suffix and no BPE merge can have a left side
    * containing `</w>` (such a symbol is word-final by construction),
    * so a cross-word boundary pair never matches any merge pattern.
    * U+001F itself can never appear inside a symbol:
    * symbols are built from whitespace-split word characters.
    */
  def tokenizeOracleSql(merges: Seq[Merge],
                        table: String = "documents",
                        textCol: String = "text",
                        idCol: String = "doc_id"): String = {
    val S = "\u001f"
    val seq0 =
      s"'$S' || array_to_string(flatten(list_transform(ws, " +
        s"w -> list_append(string_split(w, ''), '$Eow'))), '$S$S') || '$S'"
    val chained = merges.sortBy(_.rank).foldLeft(seq0) { (acc, m) =>
      s"replace($acc, '$S${m.left}$S$S${m.right}$S', '$S${m.left}${m.right}$S')"
    }
    s"""WITH w AS (
       |  SELECT $idCol,
       |    list_filter(string_split_regex(lower(trim(coalesce($textCol, ''))), '\\s+'),
       |                x -> x <> '') AS ws
       |  FROM $table),
       |t AS (
       |  SELECT $idCol, replace(trim($chained, '$S'), '$S$S', ' ') AS bpe_text
       |  FROM w)
       |SELECT $idCol,
       |  CAST(CASE WHEN bpe_text = '' THEN 0
       |       ELSE length(string_split(bpe_text, ' ')) END AS BIGINT) AS n_bpe,
       |  bpe_text
       |FROM t
       |ORDER BY $idCol""".stripMargin
  }

  /** Segment one word with a learned merge list (greedy by merge rank —
    * the standard inference rule). Driver-side helper for specs and
    * vocabulary inspection.
    */
  def segment(word: String, merges: Seq[Merge]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    for (m <- merges.sortBy(_.rank)) {
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
          nb += m.left + m.right; i += 2
        } else { nb += syms(i); i += 1 }
      }
      syms = nb.result()
    }
    syms
  }
}
