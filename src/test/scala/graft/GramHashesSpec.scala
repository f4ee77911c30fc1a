package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GramHashes, XxHash64FoldInt}
import graft.text.TextAnalysis

/** The byte-level gram-hash generator must be VALUE-IDENTICAL to the
  * expression pipeline it replaced (VERDICT r10 #7) — every dedup
  * oracle's exactness rides on `xxhash64(array_join(slice(split(trim
  * (text), "\\s+"), i, k), ' '))` semantics, including the Java-regex
  * split's empty-token edges. These tests pin equality against the
  * ORIGINAL expression forms on hostile inputs (tabs, multi-space
  * runs, leading/trailing separators, non-ASCII, non-breaking space,
  * empty, null) and on the real sf0.001 corpus.
  */
class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  private val hostile = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "  leading and trailing spaces  "),
    (2L, "tab\tseparated\ttokens here"),
    (3L, "multi   space    runs   between tokens"),
    (4L, "newline\nand\rcarriage mixedvertical\ftab"),
    (5L, "trailing tab ends this\t"),
    (6L, "\tleading tab starts this one"),
    (7L, "unicode 北京 tokens naïve café привет ε"),
    (8L, "non breaking space is one token per Java regex"),
    (9L, ""),
    (10L, "   "),
    (11L, "one"),
    (12L, "exactly three tokens"),
    (13L, "dup gram dup gram dup gram dup gram"),
    (14L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  /** The shipped-through-r10 expression form: per-doc distinct gram
    * strings → xxhash64.
    */
  private def exprDistinct(df: DataFrame, k: Int): DataFrame = {
    val shingleArr = expr(
      s"""CASE WHEN size(__toks) >= $k THEN
         |  transform(
         |    sequence(0, size(__toks) - $k),
         |    i -> array_join(slice(__toks, i + 1, $k), ' '))
         |ELSE array() END""".stripMargin)
    df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("shingle", explode(array_distinct(shingleArr)))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
  }

  /** The shipped-through-r10 positional form. */
  private def exprPositional(df: DataFrame, k: Int): DataFrame = {
    val posGram = expr(
      s"""CASE WHEN size(__toks) >= $k THEN
         |  transform(sequence(1, size(__toks) - $k + 1),
         |    i -> struct(CAST(i AS BIGINT) AS pos,
         |      xxhash64(array_join(slice(__toks, i, $k), ' ')) AS h))
         |ELSE array() END""".stripMargin)
    df.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), explode(posGram).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.h").as("h"))
  }

  private def assertSameSet(a: DataFrame, b: DataFrame): Unit = {
    val extra = a.exceptAll(b)
    val missing = b.exceptAll(a)
    assert(extra.isEmpty && missing.isEmpty,
      s"generator-vs-expression mismatch: extra=${extra.take(5).toSeq} " +
        s"missing=${missing.take(5).toSeq}")
  }

  test("distinct mode equals expression form on hostile inputs, k=1..4") {
    for (k <- 1 to 4) {
      val gen = hostile.select(col("doc_id"),
        GramHashes.gramHashesDistinct(col("text"), k))
      assertSameSet(gen, exprDistinct(hostile, k))
    }
  }

  test("positional mode equals expression form on hostile inputs, k=1..5") {
    for (k <- Seq(1, 2, 3, 5)) {
      val gen = hostile.select(col("doc_id"),
        GramHashes.gramHashesPositional(col("text"), k))
      assertSameSet(gen, exprPositional(hostile, k))
    }
  }

  test("distinct + positional modes equal expression forms on sf0.001 documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    assertSameSet(
      docs.select(col("doc_id"), GramHashes.gramHashesDistinct(col("text"), 3)),
      exprDistinct(docs, 3))
    assertSameSet(
      docs.select(col("doc_id"), GramHashes.gramHashesPositional(col("text"), 5)),
      exprPositional(docs, 5))
  }

  test("xxhash64 fold factors the multi-column hash exactly") {
    // xxhash64(s, lit(i)) == hashInt(i, xxhash64(s)) for every seed the
    // MinHash pipeline uses — the identity the factored signatures ride on
    val toks = hostile.where(col("text").isNotNull)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
    val seeds = Seq(0, 1, 7, 31, 63)
    val direct = toks.select(
      seeds.map(i => xxhash64(col("t"), lit(i)).as(s"d$i")): _*)
    val folded = toks.select(
      seeds.map(i =>
        XxHash64FoldInt.fold(xxhash64(col("t")), i).as(s"d$i")): _*)
    assertSameSet(direct, folded)
  }

  test("lowerAll mode keys the same gram groups as the TokenShingles strings") {
    // the Gopher legs' contract: per-(doc, gram) count multisets are
    // identical whether the key is the lowered gram STRING or its
    // xxhash64 — max/sum/count-of-groups per doc must all agree
    def profile(counts: DataFrame): DataFrame = counts
      .groupBy("doc_id")
      .agg(max("__c").as("mx"), sum("__c").as("tot"),
        count(lit(1)).as("dis"))
    for (k <- Seq(2, 3)) {
      val byHash = profile(hostile.select(col("doc_id"),
          graft.functions.GramHashes.gramHashesLowerAll(col("text"), k))
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("__c")))
      val byString = profile(hostile.select(col("doc_id"),
          graft.functions.TokenShingles.tokenShingles(col("text"), k))
        .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("__c")))
      assertSameSet(byHash, byString)
    }
    // and on real data with mixed case
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val bh = profile(docs.select(col("doc_id"),
        graft.functions.GramHashes.gramHashesLowerAll(col("text"), 2))
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("__c")))
    val bs = profile(docs.select(col("doc_id"),
        graft.functions.TokenShingles.tokenShingles(col("text"), 2))
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("__c")))
    assertSameSet(bh, bs)
  }

  test("minhashSignatures unchanged by the factored path (golden row)") {
    // one full signature on a fixed doc, against the r10 direct form
    val doc = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val sig = graft.dedup.Dedup.minhashSignatures(doc, numHashes = 8)
      .select("sig").as[Seq[Long]].head()
    val direct = {
      val sh = graft.dedup.Dedup.shingles(doc)
      val mins = (0 until 8).map(i =>
        min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
      sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
        .select(array((0 until 8).map(i => col(s"h$i")): _*).as("sig"))
        .as[Seq[Long]].head()
    }
    assert(sig === direct)
  }
}
