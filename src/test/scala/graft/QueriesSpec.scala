package graft

import org.apache.spark.sql.functions._

import graft.queries.{FuncQueries, TrainingQueries}

/** Accuracy and invariant tests for query entries whose contract is not
  * SQL-oracle-expressible: approximate sketches (engine-specific
  * algorithms) and the packing/clustering invariants.
  */
class QueriesSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val exact = FuncQueries.countDistinctAgg(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = FuncQueries.approxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"group $k: approx ${approx(k)} vs exact $n")
    }
  }

  test("approx percentiles within 10% of exact percentiles per group") {
    val exact = FuncQueries.percentiles(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approx = FuncQueries.approxPercentile(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx.keySet === exact.keySet)
    def close(a: Double, e: Double): Boolean =
      math.abs(a - e) <= math.max(1.0, math.abs(e) * 0.10)
    exact.foreach { case (k, (p50q, p90q, p50p)) =>
      val (a50q, a90q, a50p) = approx(k)
      assert(close(a50q, p50q) && close(a90q, p90q) && close(a50p, p50p),
        s"group $k: approx ($a50q,$a90q,$a50p) vs exact ($p50q,$p90q,$p50p)")
    }
  }

  test("hll sketch-union estimate within 5% of exact per flag") {
    val exact = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = FuncQueries.hllSketchUnion(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"flag $k: sketch ${approx(k)} vs exact $n")
    }
  }

  test("pack: bins are contiguous per source and respect the budget rule") {
    val got = TrainingQueries.pack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(got.length.toLong === docs) // every doc packed exactly once
    got.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      // bin ids are non-decreasing in doc order and start at bin of first
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq)
      // recompute the cumulative rule
      var cum = 0L
      sorted.foreach { case (_, _, n, bin) =>
        cum += n
        assert(bin === math.floor((cum - 1).toDouble / 256).toLong)
      }
    }
  }

  test("dedup clusters: pairs co-cluster, non-pairs of kept docs differ") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.dedup.Dedup.ngramJaccard(docs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = TrainingQueries.dedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every near-dup pair lands in the same cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    // cluster label is a member of the cluster and is its minimum
    clusters.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keys.min === label)
    }
  }

  test("DSIR weights: target-slice docs outscore the rest on average") {
    val w = TrainingQueries.dsirWeights(spark, sfDir)
      .select(col("doc_id"), col("log_ratio"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(w.nonEmpty)
    val (tgt, rest) = w.partition(_._1 % 10 == 0)
    val mt = tgt.map(_._2).sum / tgt.length
    val mr = rest.map(_._2).sum / rest.length
    // the importance weight estimates log p_target/p_raw — documents
    // actually drawn from the target slice must score higher on average
    assert(mt > mr, s"target mean $mt not above non-target mean $mr")
  }

  test("shuffle shard: seeded permutation is total, deterministic, seed-sensitive") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    val a = TrainingQueries.shuffleShard(spark, sfDir, "seed42")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc appears exactly once — it is a permutation, not a sample
    assert(a.map(_._1).distinct.length.toLong === n)
    // positions within each shard are contiguous from 0
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // same seed reproduces the exact placement; a different seed moves
    // at least one document (resumability vs actually-shuffling)
    val b = TrainingQueries.shuffleShard(spark, sfDir, "seed42")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
    val c = TrainingQueries.shuffleShard(spark, sfDir, "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a.exists(t => !c.contains(t)))
  }

  test("recall@k: recounts the two component top-k sets exactly") {
    import graft.sim.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id").between(10, 19))
    val exact = Similarity.bruteForceTopK(emb, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, qs, centroidIds = (0L until 20L),
        k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TrainingQueries.recallAtK(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet === qs.collect()
      .map(_.getAs[Long]("vec_id")).toSet) // every query row present
    got.foreach { r =>
      val q = r.getLong(0)
      val expHits = ivf.filter(_._1 == q).count(exact.contains)
      assert(r.getLong(1) === expHits.toLong, s"n_hits off for query $q")
      assert(math.abs(r.getDouble(2) - expHits / 5.0) < 1e-9)
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // the index is USEFUL on this corpus: nonzero aggregate recall
    assert(got.map(_.getLong(1)).sum > 0)
  }

  test("epoch plan: integer identities and a covering-minimal partial cut") {
    val rows = TrainingQueries.epochPlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val budget = 100000L
    // fixed-point weights sum to z; per-source targets floor-sum to
    // at most the budget (integer division loses < n_sources tokens)
    val targets = rows.map(_.getAs[Long]("target_tokens"))
    assert(targets.sum <= budget &&
      targets.sum > budget - rows.length)
    rows.foreach { r =>
      val src = r.getAs[Long]("src_tokens")
      val tgt = r.getAs[Long]("target_tokens")
      val full = r.getAs[Long]("full_epochs")
      val rem = r.getAs[Long]("rem_tokens")
      val nPart = r.getAs[Long]("n_partial_docs")
      val pTok = r.getAs[Long]("partial_tokens")
      // division identity: the plan decomposes the target exactly
      assert(full * src + rem === tgt, s"identity broke for $r")
      assert(rem >= 0 && rem < src)
      // the partial pass COVERS the remainder (the doc that crosses
      // the cut is included whole) and is empty iff rem is zero
      assert(pTok >= rem, s"partial under-covers: $r")
      if (rem === 0L) assert(nPart === 0L && pTok === 0L)
      else assert(nPart > 0L)
    }
    // deterministic: the plan is bit-identical across runs
    val again = TrainingQueries.epochPlan(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("epoch plan: trillion-token budget does not wrap (r13 overflow audit)") {
    // budget × w_fp would reach ~10³⁰ in Long arithmetic and wrap
    // silently under ansi=false; the DECIMAL(38,0) multiply must keep
    // every target non-negative and the floor-sum identity intact
    val budget = 1_500_000_000_000_0L // 1.5·10¹³ tokens
    val rows = TrainingQueries.epochPlan(spark, sfDir, budget).collect()
    assert(rows.nonEmpty)
    val targets = rows.map(_.getAs[Long]("target_tokens"))
    assert(targets.forall(_ >= 0L),
      s"wrapped target: ${targets.filter(_ < 0).mkString(",")}")
    assert(targets.sum <= budget && targets.sum > budget - rows.length)
    rows.foreach { r =>
      val src = r.getAs[Long]("src_tokens")
      val tgt = r.getAs[Long]("target_tokens")
      val full = r.getAs[Long]("full_epochs")
      val rem = r.getAs[Long]("rem_tokens")
      assert(full >= 0 && rem >= 0 && full * src + rem === tgt,
        s"identity broke at big budget: $r")
    }
  }

  test("sparse retrieval: cosines in (0,1], k-bounded, no self-matches") {
    val rows = TrainingQueries.sparseRetrieval(spark, sfDir, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, rank, doc, cos) =>
      assert(q !== doc)
      assert(rank >= 1 && rank <= 3)
      assert(cos > 0.0 && cos <= 1.0 + 1e-9, s"cosine $cos out of range")
    }
    // ranks decrease in score within a query
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
    }
  }

  test("nucleus cut: kept docs cover >= 90% of chars per language, minimally") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val kept = TrainingQueries.nucleus(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val total = ds.map(_._3).sum
      val keptHere = ds.filter(d => kept.contains((d._1, lang)))
      val coverage = keptHere.map(_._3).sum
      assert(coverage * 10 >= total * 9, s"$lang covers < 90%")
      // minimality: dropping the smallest kept doc must fall below 90%
      val smallest = keptHere.minBy(d => (d._3, -d._1))
      assert((coverage - smallest._3) * 10 < total * 9,
        s"$lang cut is not minimal")
      // prefix property: kept = the largest docs, no gaps in size order
      val ord = Ordering[(Long, Long)]
      val minKept = keptHere.map(d => (d._3, -d._1)).min(ord)
      ds.filter(d => ord.gt((d._3, -d._1), minKept)).foreach { d =>
        assert(kept.contains((d._1, lang)),
          s"doc ${d._1} larger than a kept doc but dropped")
      }
    }
  }

  test("zipf fit: negative slope over a frequency-ranked vocabulary") {
    val r = TrainingQueries.zipfFit(spark, sfDir).head()
    val slope = r.getDouble(0)
    val nTerms = r.getLong(2)
    val nTokens = r.getLong(3)
    assert(slope < 0.0, s"rank-frequency slope must be negative: $slope")
    assert(nTerms > 0 && nTokens > nTerms)
  }

  test("unpivot: pre-sorted Expand ≡ post-Expand orderBy (bag + key order)") {
    // r13 restructure: sort-the-base-then-unpivot (ascending-measure
    // values order) must emit (a) the identical row BAG as the former
    // post-Expand orderBy(key, key, measure) and (b) rows
    // nondecreasing on (l_orderkey, l_linenumber, measure). Exact
    // SEQUENCE equality is not a contract either form offers: the
    // synthetic lineitem holds duplicate (l_orderkey, l_linenumber)
    // keys, so the old orderBy's within-tie order was already
    // nondeterministic; the oracle compares rows sorted on all columns.
    val base = graft.io.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
    val old = base.unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice")),
        variableColumnName = "measure", valueColumnName = "value")
      .orderBy("l_orderkey", "l_linenumber", "measure")
    val neuDf = FuncQueries.unpivotMeasures(spark, sfDir)
    assert(neuDf.exceptAll(old).isEmpty && old.exceptAll(neuDf).isEmpty,
      "unpivot row bags diverged")
    // within a duplicate-key tie group the two forms interleave
    // measures differently (both orders are within-tie arbitrary), so
    // the order pin is on the sort KEYS only
    val keys = neuDf.collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(keys === keys.sorted,
      "pre-sorted unpivot is not (l_orderkey, l_linenumber)-ordered")
  }

  test("lm score: array-bigram spelling ≡ posexplode+lead window spelling") {
    import org.apache.spark.sql.expressions.Window
    // r13 restructure pin: the windowless bigram build must yield the
    // identical (doc_id, w, w2) BAG, hence identical scores.
    val toks = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(graft.text.TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "w")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val oldBg = toks.withColumn("w2", lead("w", 1).over(w))
      .filter(col("w2").isNotNull)
      .select("doc_id", "w", "w2")
    val pairArr = expr(
      """CASE WHEN size(__toks) >= 2 THEN
        |  transform(sequence(0, size(__toks) - 2),
        |    i -> struct(__toks[i] AS w, __toks[i + 1] AS w2))
        |ELSE array() END""".stripMargin)
    val newBg = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokens(col("text")).as("__toks"))
      .withColumn("e", explode(pairArr))
      .select(col("doc_id"), col("e.w").as("w"), col("e.w2").as("w2"))
    assert(newBg.exceptAll(oldBg).isEmpty && oldBg.exceptAll(newBg).isEmpty,
      "bigram bags diverged between the window and array spellings")
  }
}
