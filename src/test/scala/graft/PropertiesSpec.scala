package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Ops

/** Generator-driven property tests (ScalaCheck `Gen` with a fixed seed
  * for reproducibility; one Spark job evaluates each whole generated
  * batch — per-case jobs would be prohibitively slow).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("morton interleave is a bijection on 16-bit pairs") {
    val pairs = sample(Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L))), 11L)
    def mortonRef(a: Long, b: Long): Long =
      (0 until 16).map(j => (((a >> j) & 1L) << (2 * j)) |
        (((b >> j) & 1L) << (2 * j + 1))).reduce(_ | _)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.io.Clustering.mortonInterleave(col("a"), col("b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z === mortonRef(a, b), s"morton($a, $b)")
    }
    // bijective on the sampled set: distinct inputs -> distinct codes
    assert(got.map(_._3).distinct.length === pairs.distinct.length)
  }

  test("splitBucket matches the direct Knuth formula, in [0, 100)") {
    // ids across the full non-negative range INCLUDING values where the
    // direct multiply would overflow a signed 64-bit (the split-multiply
    // spelling must still match the mathematical mod-2^32 result)
    val ids = sample(Gen.listOfN(200, Gen.oneOf(
      Gen.chooseNum(0L, 1000000L),
      Gen.chooseNum(0L, Long.MaxValue))), 22L)
    val got = ids.toDF("id")
      .select(col("id"),
        graft.queries.TrainingQueries.splitBucket(col("id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      val want = BigInt(id).mod(BigInt(2).pow(32)) * BigInt(2654435761L)
      val bucket = (want.mod(BigInt(2).pow(32)) % 100).toLong
      assert(got(id) === bucket, s"splitBucket($id)")
      assert(got(id) >= 0 && got(id) < 100)
    }
  }

  test("argMax returns the max row with min tiebreak for random groups") {
    val rows = sample(Gen.listOfN(400, Gen.zip(
      Gen.chooseNum(0, 10), Gen.chooseNum(0, 50), Gen.chooseNum(0, 5))), 33L)
      .map { case (k, t, v) => (s"k$k", t, v.toDouble) }
    val got = Ops.argMax(rows.toDF("k", "t", "v"), "k", "v", "t")
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    rows.groupBy(_._1).foreach { case (k, g) =>
      val maxV = g.map(_._3).max
      val wantT = g.filter(_._3 == maxV).map(_._2).min
      assert(got(k) === ((wantT, maxV)), s"group $k")
    }
  }

  test("saltedGroupedSum == groupedSum under generated skew") {
    // hot-key-heavy distribution: ~80% of rows share one key
    val rows = sample(Gen.listOfN(500, Gen.frequency(
      4 -> Gen.const("hot"), 1 -> Gen.oneOf("a", "b", "c"))
      .flatMap(k => Gen.chooseNum(0, 1000).map(v => (k, v.toDouble)))), 44L)
    for (buckets <- Seq(1, 4, 32)) {
      val plain = Ops.groupedSum(rows.toDF("k", "v"), Seq("k"), "v", "s")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val salted = Ops.saltedGroupedSum(rows.toDF("k", "v"), Seq("k"), "v",
        "s", saltBuckets = buckets)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(plain === salted, s"saltBuckets=$buckets")
    }
  }

  test("fingerprint is invariant under case and whitespace mutations") {
    val texts = sample(Gen.listOfN(80, Gen.nonEmptyListOf(
      Gen.oneOf("alpha", "Beta", "GAMMA", "delta4"))
      .map(_.mkString(" "))), 55L)
    // mutate: random case flips + whitespace padding/runs
    val mutated = texts.zipWithIndex.map { case (t, i) =>
      val spaced = t.replace(" ", if (i % 2 == 0) "   " else "\t ")
      val cased = if (i % 3 == 0) spaced.toUpperCase else spaced.toLowerCase
      (t, s"  $cased ")
    }
    val got = mutated.toDF("orig", "mut")
      .select(
        graft.text.TextAnalysis.fingerprint(col("orig")).as("f1"),
        graft.text.TextAnalysis.fingerprint(col("mut")).as("f2"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("token_shingles: count/order/content law on generated texts") {
    // texts with 0..12 tokens, messy whitespace and mixed case; for
    // every (text, k): exactly max(0, tokens-k+1) shingles, positions
    // 0..m-1 in order, each shingle = the k case-folded tokens at pos
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val texts = sample(Gen.listOfN(80, for {
      n <- Gen.chooseNum(0, 12)
      ws <- Gen.listOfN(n, word)
      sep <- Gen.oneOf(" ", "  ", "\t", " \t")
    } yield ws.mkString(sep)), 31L)
    for (k <- Seq(1, 2, 3, 5)) {
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
        .select(col("id"),
          graft.functions.TokenShingles.tokenShingles(col("t"), k))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val want = (0 to toks.length - k)
          .map(p => (i.toLong, p, toks.slice(p, p + k).mkString(" ")))
        assert(rows.getOrElse(i.toLong, Array.empty).toSeq === want,
          s"text ${i}, k=$k")
      }
    }
  }

  test("simhash64: permutation-invariant, JVM-reference-exact on random tokens") {
    import graft.functions.SimHash64
    val word = Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)
    val arrays = sample(Gen.listOfN(150,
      Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, word))), 44L)
    // shuffle each array deterministically: the per-bit counts are a
    // multiset property, so the signature must not see order
    val shuffled = arrays.map(a => new scala.util.Random(7).shuffle(a))
    val got = arrays.zip(shuffled).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), SimHash64.asColumn(col("a")).as("sa"),
        SimHash64.asColumn(col("b")).as("sb"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // JVM reference: XXH64 over utf8 bytes + per-bit majority
    def ref(toks: Seq[String]): Long = {
      val hs = toks.map(t =>
        org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.fromString(t), 42L))
      (0 until 64).map { j =>
        if (2L * hs.count(h => ((h >>> j) & 1L) == 1L) > hs.length)
          1L << j else 0L
      }.foldLeft(0L)(_ | _)
    }
    got.foreach { case (i, sa, sb) =>
      assert(sa === sb, s"array $i: signature saw token order")
      assert(sa === ref(arrays(i.toInt)), s"array $i: != JVM reference")
    }
  }
}
