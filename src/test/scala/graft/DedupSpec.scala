package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dedup operator semantics on small fixtures + recall against
  * brute-force Jaccard on the sf0.001 documents.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "THE  QUICK   brown fox jumps over the lazy dog"), // exact after norm
    (3L, "completely different text with no overlap at all here"),
    (4L, "tiny")
  ).toDF("doc_id", "text")

  test("exact dedup: normalization collapses case/whitespace; keeps min id") {
    val kept = Dedup.exact(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 3L, 4L)) // 2 deduped into 0
  }

  test("exactIncremental: dedupes within batch and against the index; idempotent") {
    val index = Dedup.exact(docs)
      .select(col("fp"))  // fingerprints of the existing corpus
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 0
      (11L, "brand new content one"),
      (12L, "Brand  NEW content one"),                      // in-batch dup of 11
      (13L, "brand new content two")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactIncremental(batch, index)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(11L, 13L))
    // idempotence: replaying the batch against the UPDATED index keeps nothing
    val updated = index.unionByName(kept.select("fp"))
    assert(Dedup.exactIncremental(batch, updated).count() === 0L)
  }

  test("shingles: sliding trigrams, distinct, short docs yield none") {
    val sh = Dedup.shingles(docs, k = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(!sh.map(_._1).contains(4L)) // "tiny" has <3 tokens
    val doc0 = sh.filter(_._1 == 0L).map(_._2)
    assert(doc0.contains("the quick brown"))
    assert(doc0.contains("the lazy dog"))
    assert(doc0.length === 7) // 9 tokens -> 7 trigrams, all distinct
  }

  test("ngramJaccard finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containmentPairs: detects doc-in-doc that Jaccard misses") {
    val wrap = Seq(
      (20L, "alpha beta gamma delta epsilon zeta"),
      // 21 wraps 20 in a long boilerplate shell: containment(20→21)=1
      // but Jaccard(20,21) is far below any dedup threshold
      (21L, "header one two three four five six seven eight nine ten " +
        "alpha beta gamma delta epsilon zeta " +
        "footer eleven twelve thirteen fourteen fifteen sixteen"),
      (22L, "totally unrelated content about something else entirely ok")
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(wrap, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(cont.keySet === Set((20L, 21L))) // asymmetric: only A-in-B
    assert(cont((20L, 21L)) === 1.0)
    val jac = Dedup.ngramJaccard(wrap, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((20L, 21L)), "Jaccard should miss the wrap pair")
  }

  test("containmentPairs agrees with direct shingle-set containment") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Dedup.containmentPairs(real, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // brute-force truth: per-pair |A∩B|/|A| from the exploded shingles
    val sh = Dedup.shingles(real).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(_.getString(1)).toSet }
    val truth = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a != b && sa.nonEmpty
      c = sa.count(sb.contains).toDouble / sa.size
      if BigDecimal(c).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.9
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "fixture should contain contained docs")
    assert(got.keySet === truth)
  }

  test("minhash LSH recall: finds >=80% of true near-dup pairs at sf0.001") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val truth = Dedup.ngramJaccard(real, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = Dedup.minhashLshCandidates(real)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dups")
    val recall = truth.count(cands.contains).toDouble / truth.size
    assert(recall >= 0.8, s"LSH recall $recall over ${truth.size} pairs")
  }

  test("minhash similarity estimates true jaccard within 0.25") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = Dedup.minhashSignatures(real)
    val est = Dedup.minhashSimilarity(
      Dedup.minhashLshCandidates(real), sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val truth = Dedup.ngramJaccard(real, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = truth.keySet.intersect(est.keySet)
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(math.abs(truth(k) - est(k)) < 0.25,
        s"pair $k: true=${truth(k)} est=${est(k)}")
    }
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.simhashPairs(real, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.ngramJaccard(real, threshold = 0.9)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    // simhash with hamming<=3 should recover most >=0.9-jaccard pairs
    val recall = truth.count(pairs.contains).toDouble / truth.size
    assert(recall >= 0.5, s"simhash recall $recall over ${truth.size}")
  }

  test("minhashIncremental replayed in waves reconstructs the full relation") {
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val full = Dedup.minhashSimilarity(
        Dedup.minhashLshCandidates(real), Dedup.minhashSignatures(real))
      .filter(col("est_jaccard") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.nonEmpty, "fixture has no minhash near-dups - vacuous")
    // arrival as 3 waves: each wave probes the index accumulated from
    // the previous ones (wave 0 probes an empty index), then appends
    // itself — the steady-state discipline. The union of the waves'
    // emissions must equal the one-shot batch relation: increments
    // lose nothing.
    var sigsAcc: org.apache.spark.sql.DataFrame = null
    val got = scala.collection.mutable.Set[(Long, Long)]()
    for (w <- 0 until 3) {
      val wave = real.filter(pmod(col("doc_id"), lit(3L)) === w)
      val wSigs = Dedup.minhashSignatures(wave)
      val (ib, is) =
        if (sigsAcc == null) (Dedup.minhashBands(wSigs).limit(0),
          wSigs.limit(0))
        else (Dedup.minhashBands(sigsAcc), sigsAcc)
      got ++= Dedup.minhashIncremental(wave, ib, is)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      sigsAcc = if (sigsAcc == null) wSigs else sigsAcc.unionByName(wSigs)
    }
    assert(got.toSet === full)
  }

  test("simhashRow equals the batch simhash bit-for-bit (incl. edges)") {
    import spark.implicits._
    val real = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val edges = Seq((9000001L, null.asInstanceOf[String]),
      (9000002L, ""), (9000003L, "   "), (9000004L, "one"))
      .toDF("doc_id", "text")
    val df = real.unionByName(edges)
    val batch = Dedup.simhash(df).select(col("doc_id"), col("simhash"))
    val row = df.select(col("doc_id"),
      Dedup.simhashRow(col("text")).as("rowsig"))
    val diff = batch.join(row, "doc_id")
      .filter(col("simhash") =!= col("rowsig")).count()
    assert(diff === 0L, "row-local and batch SimHash disagree")
  }

  test("duplicatedSpans: cross-doc shares, self-repetition, clean docs") {
    import spark.implicits._
    val docs = Seq(
      // unique content — must contribute no spans
      (1L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      // docs 3 and 4 share the 7-token phrase p1..p7 at different
      // offsets: expected one maximal span each, length 7
      (3L, "aa p1 p2 p3 p4 p5 p6 p7 bb"),
      (4L, "cc dd p1 p2 p3 p4 p5 p6 p7"),
      // SELF-repetition is duplication too (Lee et al. semantics):
      // r1..r5 occurs twice inside one doc -> two 5-token spans
      (5L, "r1 r2 r3 r4 r5 z r1 r2 r3 r4 r5"),
      // degenerate inputs must not crash or emit
      (6L, ""),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, k = 5, minTokens = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans === Set(
      (3L, 2L, 7L), // covered windows 2..4 -> [2, 8] = 7 tokens
      (4L, 3L, 7L),
      (5L, 1L, 5L), (5L, 7L, 5L)))
  }

  test("duplicatedSpans: adjacent duplicated regions merge (cover semantics)") {
    import spark.implicits._
    // doc 10 concatenates TWO phrases that are each duplicated
    // elsewhere; the k-gram cover merges them into one island — the
    // documented superset-cover semantics of a winnowing pass
    val docs = Seq(
      (10L, "m1 m2 m3 m4 m5 n1 n2 n3 n4 n5"),
      (11L, "m1 m2 m3 m4 m5 xx yy"),
      (12L, "zz n1 n2 n3 n4 n5")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, k = 5, minTokens = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 10: windows 1 (m-run) and 6 (n-run) are covered; window
    // 2..5 straddle the seam and are NOT — islands {1} and {6},
    // spans [1,5] and [6,10]
    assert(spans === Set(
      (10L, 1L, 5L), (10L, 6L, 5L),
      (11L, 1L, 5L), (12L, 2L, 5L)))
  }

  test("removeDuplicatedSpans: drops ALL occurrences, rebuilds text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "u1 u2 u3 u4 u5 u6"),                  // unique — untouched
      (3L, "aa p1 p2 p3 p4 p5 p6 p7 bb"),          // shares p1..p7
      (4L, "cc dd p1 p2 p3 p4 p5 p6 p7"),
      (5L, "r1 r2 r3 r4 r5 z r1 r2 r3 r4 r5"),     // self-repetition
      (6L, ""),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, k = 5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) === ((0L, "u1 u2 u3 u4 u5 u6")))
    // doc 3: covered windows 2..4 remove tokens 2..8 (p1..p7)
    assert(out(3L) === ((7L, "aa bb")))
    assert(out(4L) === ((7L, "cc dd")))
    // doc 5: BOTH copies of r1..r5 go (drop-all semantics); z stays
    assert(out(5L) === ((10L, "z")))
    assert(out(6L) === ((0L, "")))
    assert(out(7L)._1 === 0L)
    assert(out(7L)._2 === null, "NULL text must stay NULL")
  }

  test("keepRepresentatives keeps the best-scoring doc per cluster") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L, 0.3), (2L, 10L, 0.9), (3L, 10L, 0.9), // cluster 10
      (4L, 40L, 0.5),                                 // singleton
      (5L, 50L, 0.1), (6L, 50L, 0.2)                  // cluster 50
    ).toDF("doc_id", "cluster_id", "quality_score")
    val kept = Dedup
      .keepRepresentatives(docs, "cluster_id", "quality_score")
      .collect().map(_.getLong(0)).sorted.toSeq
    // cluster 10: 2 beats 1 on score, beats 3 on id tie; 4 survives;
    // cluster 50: 6 wins on score
    assert(kept === Seq(2L, 4L, 6L))
  }
}
