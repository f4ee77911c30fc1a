package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** ANN operator semantics: brute-force exactness on a hand-checkable
  * fixture, IVF recall vs brute force on real embeddings.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),   // closest to 0
    (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f)),  // opposite to 0
    (4L, Array(0.7f, 0.7f))    // diagonal
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine, excludes self, tie-break by id") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 4)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === Seq(1L, 4L, 2L, 3L))
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("cosine values are correct") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), k = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(math.abs(got(1L) - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6)
    assert(math.abs(got(2L) - 0.0) < 1e-6)
    assert(math.abs(got(3L) - (-1.0)) < 1e-6)
  }

  test("mmrSelect trades relevance for diversity; deterministic ties") {
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(1.0f, 0.001f)),  // ~dup of 2, max relevance
      (2L, Array(1.0f, -0.001f)), // ~dup of 1
      (3L, Array(0.7f, 0.7f))     // diverse, lower relevance
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(corpus, q, k = 3, poolSize = 3,
        lambda = 0.4)
      .orderBy("mmr_rank").collect().map(_.getLong(1)).toSeq
    // rank1: cosine ties at 1.0 after rounding -> smaller id (1);
    // rank2: the near-dup 2 is penalized below the diverse 3
    assert(got === Seq(1L, 3L, 2L))
  }

  test("mmrSelect: subset of pool, rank-1 = top relevance, stable") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 3)
    val pool = Similarity.bruteForceTopK(emb, queries, k = 30)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(2)).map(_.getLong(1)).toSeq }
    val run1 = Similarity.mmrSelect(emb, queries, k = 10, poolSize = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    val run2 = Similarity.mmrSelect(emb, queries, k = 10, poolSize = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    assert(run1.sorted.toSeq === run2.sorted.toSeq, "deterministic")
    run1.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1L to 10L))
      val ids = rows.sortBy(_._2).map(_._3)
      assert(ids.toSet.subsetOf(pool(q).toSet), s"query $q not in pool")
      assert(ids.head === pool(q).head, s"query $q rank-1 = most relevant")
      assert(ids.distinct.length === ids.length)
    }
  }

  test("IVF top-k recall@5 >= 0.6 vs brute force on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id").between(10, 19))
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, (0L until 20L), k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("bqTopK recall@5 vs brute force; widening m raises recall") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(m: Int): Double = {
      val bq = Similarity.bqTopK(emb, queries, k = 5, m = m, planes = 32)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      brute.count(bq.contains).toDouble / brute.size
    }
    val r32 = recallAt(32)
    info(s"BQ recall@5 m=32: $r32")
    // 32-bit codes on 64-dim embeddings: per-bit agreement for a true
    // neighbor at cosine c is 1 - arccos(c)/pi, so moderate-cosine
    // neighbors (this fixture's regime) land several bits away and a
    // 32-candidate budget catches ~half — the knob, not the code
    // length, buys recall (measured 0.4 here)
    assert(r32 >= 0.3, s"BQ recall $r32")
    // recall is MONOTONE in m: a larger budget's candidate pool is a
    // superset, and the exact re-rank can only gain true neighbors
    // (anything evicting one must itself be a true-top-k member)
    assert(recallAt(64) >= r32, "recall must not drop as m grows")
    // ... and m = corpus degenerates to exact brute force (every
    // candidate survives the pre-rank, so the re-rank IS the top-k)
    val n = emb.count().toInt
    assert(recallAt(n) === 1.0, "m = corpus must recover brute force")
  }

  test("filteredTopK = per-label brute force; neighbors share the label") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val got = Similarity.filteredTopK(emb, queries, Seq("label"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val labelOf = emb.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.nonEmpty)
    got.foreach { case (q, nb, _) =>
      assert(labelOf(q) === labelOf(nb), s"$nb crosses $q's label filter")
    }
    // equivalence: running brute force on each label slice gives the
    // same ranking (the filter is semantics, the equi-join is plan)
    val byLabel = labelOf.values.toSet.flatMap { l: Int =>
      val slice = emb.filter(col("label") === l)
      Similarity.bruteForceTopK(slice, slice.filter(col("vec_id") < 10), k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    assert(got.toSet === byLabel)
  }

  test("banded LSH near-dup: exact precision, high recall vs all-pairs") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.nearDupPairs(emb, threshold = 0.4))
    val lsh = pairs(Similarity.nearDupPairsLsh(emb, threshold = 0.4,
      bands = 16, rowsPerBand = 4))
    assert(exact.nonEmpty, "fixture should contain pairs at cosine>=0.4")
    // precision is exact by construction (true-cosine re-check)
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    info(s"banded LSH recall $recall over ${exact.size} exact pairs")
    assert(recall >= 0.6, s"banded LSH recall $recall")
  }

  test("assignCells plans as a narrow map: no hash-partition exchange") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = Similarity.assignCells(emb, emb.filter(col("vec_id") < 20))
      .queryExecution.executedPlan.toString
    // the corpus side must not reshuffle — only the 20-row centroid
    // aggregate (SinglePartition) and its broadcast are exchanges
    assert(!plan.contains("Exchange hashpartitioning"),
      s"cell assignment must stay narrow:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("nearDupPairsLsh candidates come from an equi-join, never a product") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = Similarity.nearDupPairsLsh(emb, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"banded LSH must never plan a pair product:\n$plan")
  }

  test("int8 quantization: bounded error, cosine preserved, zero-safe") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = Similarity.dequantizeInt8(Similarity.quantizeInt8(emb))
    // element-wise error bound: |x - q*scale| <= scale/2 (+ float eps)
    val maxRelErr = q.select(expr(
      """max(aggregate(zip_with(embedding, dvec,
        |  (x, d) -> abs(cast(x AS DOUBLE) - d)), 0D,
        |  (m, e) -> greatest(m, e)) / nullif(qscale, 0D))""".stripMargin))
      .collect()(0).getDouble(0)
    assert(maxRelErr <= 0.5 + 1e-9, s"max err / scale = $maxRelErr")
    // cosine between original and dequantized stays ~1
    val minCos = q.select(min(
      graft.functions.VectorFunctions.array_cosine(
        expr("transform(embedding, x -> cast(x AS DOUBLE))"), col("dvec"))))
      .collect()(0).getDouble(0)
    assert(minCos >= 0.999, s"min cosine after quantization = $minCos")
    // zero vector: scale 0, all-zero qvec, no division error
    val z = Similarity.quantizeInt8(
      Seq((0L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
      .collect()(0)
    assert(z.getDouble(z.fieldIndex("qscale")) === 0.0)
    assert(z.getSeq[Int](z.fieldIndex("qvec")).forall(_ == 0))
  }

  test("LSH buckets: similar vectors collide more than dissimilar ones") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val buckets = Similarity.cosineLshBuckets(emb, planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sanity: buckets are populated and deterministic
    assert(buckets.size === emb.count())
    val again = Similarity.cosineLshBuckets(emb, planes = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets === again)
  }

  test("kmeans training: Lloyd improves the objective; trained IVF recalls") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // spherical objective: mean over corpus of best cosine to a centroid
    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      emb.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(cents.select(col("embedding").as("__cent"))))
        .groupBy("vec_id")
        .agg(max(graft.functions.VectorFunctions.array_cosine(
          col("embedding"), col("__cent"))).as("best"))
        .agg(avg("best")).collect()(0).getDouble(0)
    val init = Similarity.kmeansCentroids(emb, k = 16, iters = 0)
    val trained = Similarity.kmeansCentroids(emb, k = 16, iters = 4)
    assert(trained.count() === 16)
    // unit-norm centroids
    val norms = trained.select(
      graft.functions.VectorFunctions.array_dot(
        col("embedding"), col("embedding")).as("n2")).collect()
    assert(norms.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    val (o0, o4) = (objective(init), objective(trained))
    assert(o4 >= o0 - 1e-9, s"Lloyd objective regressed: $o0 -> $o4")
    // trained centroids drive IVF to reasonable recall
    val qs = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, qs, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopKWith(emb, qs, trained, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.5, s"trained-IVF recall $recall")
  }

  test("RRF fusion: agreement dominates, self-fusion preserves order") {
    import spark.implicits._
    // system A and B agree on doc 10 at rank 1; disagree below
    val a = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val b = Seq((0L, 10L, 1L), (0L, 13L, 2L), (0L, 11L, 3L))
      .toDF("query_id", "neighbor_id", "rank")
    val fused = Similarity.rrfFuse(Seq(a, b), k = 4).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Long]("n_systems")))).toMap
    assert(fused(1L) === ((10L, 2L)))  // both systems: 2/61
    assert(fused(2L) === ((11L, 2L)))  // 1/62 + 1/63 beats single-system
    // self-fusion keeps the input order
    val self = Similarity.rrfFuse(Seq(a, a), k = 3).collect()
      .sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("neighbor_id"))
    assert(self.toSeq === Seq(10L, 11L, 12L))
  }

  test("L2 top-k: nearest by euclidean distance with deterministic ties") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 2.0f)), (3L, Array(3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") === 0L)
    val got = Similarity.bruteForceTopKL2(corpus, qs, k = 2).collect()
      .map(r => r.getAs[Long]("rank") -> r.getAs[Long]("neighbor_id")).toMap
    assert(got(1L) === 1L) // dist 1
    assert(got(2L) === 2L) // dist 2
  }

  test("assignCells: native argmax ≡ composed, bit-exact incl. hostile rows") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = Similarity.kmeansCentroids(emb, k = 16, iters = 2)
    val n = Similarity.assignCells(emb, cents).select("vec_id", "cell")
    val c = Similarity.assignCellsComposed(emb, cents).select("vec_id", "cell")
    assert(n.exceptAll(c).isEmpty && c.exceptAll(n).isEmpty,
      "native assignCells diverged from the composed form on the corpus")
    // hostile: null vec (assigns to the all-null-sim tie → smallest
    // id), short vec (same), NaN elements, zero vector
    val hostile = Seq(
      (0L, Array[java.lang.Double](1.0, -2.0, 3.0, -4.0)),
      (1L, null),
      (2L, Array[java.lang.Double](1.0, 2.0)),
      (3L, Array[java.lang.Double](null, 2.0, null, -4.0)),
      (4L, Array[java.lang.Double](Double.NaN, 1.0, 0.0, 2.0)),
      (5L, Array[java.lang.Double](0.0, 0.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val hcents = Seq(
      (10L, Array(1.0, 0.0, 0.0, 0.0)),
      (11L, Array(0.0, 1.0, 0.0, 0.0)),
      (12L, Array(0.0, 0.0, 1.0, 1.0))
    ).toDF("vec_id", "embedding")
    val hn = Similarity.assignCells(hostile, hcents)
      .select("vec_id", "cell").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val hc = Similarity.assignCellsComposed(hostile, hcents)
      .select("vec_id", "cell").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hn.toSeq === hc.toSeq,
      s"hostile assignment diverged: native=${hn.toSeq} composed=${hc.toSeq}")
    assert(hn.find(_._1 == 1L).get._2 === 10L,
      "null vec must fall to the smallest centroid id (all-null-sim tie)")
    // empty centroid set → -1 sentinel on both paths
    val empty = hcents.filter(col("vec_id") < 0L)
    val en = Similarity.assignCells(hostile, empty)
      .select("cell").distinct().collect().map(_.getLong(0)).toSeq
    val ec = Similarity.assignCellsComposed(hostile, empty)
      .select("cell").distinct().collect().map(_.getLong(0)).toSeq
    assert(en === Seq(-1L) && ec === Seq(-1L))
  }

  test("LSH: native sign-bit keys ≡ composed, bit-exact incl. hostile rows") {
    // real corpus, both configs that ship (8×4 default, 4×16 prod)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    for ((bands, rpb) <- Seq((8, 4), (4, 16))) {
      val n = Similarity.cosineLshBands(emb, bands, rpb, dim = 64)
      val c = Similarity.cosineLshBandsComposed(emb, bands, rpb, dim = 64)
      assert(n.exceptAll(c).isEmpty && c.exceptAll(n).isEmpty,
        s"native band keys diverged at $bands x $rpb")
    }
    val nb = Similarity.cosineLshBuckets(emb, planes = 16, dim = 64)
    val cbk = Similarity.cosineLshBucketsComposed(emb, planes = 16, dim = 64)
    assert(nb.exceptAll(cbk).isEmpty && cbk.exceptAll(nb).isEmpty,
      "native bucket keys diverged")
    // hostile rows: null vec (→ key 0), short vec (→ key 0), null/NaN
    // elements, zero vector (strict sign: no bit)
    val hostile = Seq(
      (0L, Array[java.lang.Double](1.0, -2.0, 3.0, -4.0)),
      (1L, null),
      (2L, Array[java.lang.Double](1.0, 2.0)),                // short
      (3L, Array[java.lang.Double](null, 2.0, null, -4.0)),   // null elems
      (4L, Array[java.lang.Double](Double.NaN, 1.0, 0.0, 2.0)),
      (5L, Array[java.lang.Double](0.0, 0.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val hn = Similarity.cosineLshBands(hostile, bands = 4, rowsPerBand = 4,
        dim = 4).orderBy("vec_id", "band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val hc = Similarity.cosineLshBandsComposed(hostile, bands = 4,
        rowsPerBand = 4, dim = 4).orderBy("vec_id", "band").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(hn.toSeq === hc.toSeq,
      s"hostile band keys diverged: native=${hn.toSeq} composed=${hc.toSeq}")
    assert(hn.filter(_._1 == 1L).forall(_._3 == 0L),
      "null vector must key to bucket 0 in every band")
  }

  test("PQ: native encode ≡ composed encode, bit-exact incl. hostile rows") {
    import graft.sim.ProductQuantizer
    // real corpus + trained codebook: every row must agree
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    val native = ProductQuantizer.encode(emb, cb)
      .select("vec_id", "pq_codes")
    val composed = ProductQuantizer.encodeComposed(emb, cb)
      .select("vec_id", "pq_codes")
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty,
      "native PqEncode diverged from the composed form on the corpus")
    // hostile inputs: null vec (→ all-zero codes), short vec (short
    // subspaces → code 0), null/NaN elements, double element type
    val hostile = Seq(
      (0L, Array[java.lang.Double](1.0, 2.0, 3.0, 4.0)),
      (1L, null),
      (2L, Array[java.lang.Double](1.0, 2.0, 3.0)),           // short
      (3L, Array[java.lang.Double](null, 2.0, null, 4.0)),    // null elems
      (4L, Array[java.lang.Double](Double.NaN, 0.0, 1.0, Double.NaN)),
      (5L, Array[java.lang.Double](-0.0, 0.0, 1e300, -1e300))
    ).toDF("vec_id", "embedding")
    val hcb: ProductQuantizer.Codebook = IndexedSeq.tabulate(2)(s =>
      IndexedSeq.tabulate(3)(c =>
        Array(c.toDouble + s, 2.0 * c - s)))
    val hn = ProductQuantizer.encode(hostile, hcb)
      .select("vec_id", "pq_codes").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
    val hc = ProductQuantizer.encodeComposed(hostile, hcb)
      .select("vec_id", "pq_codes").orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
    assert(hn.toSeq === hc.toSeq,
      s"hostile rows diverged: native=${hn.toSeq} composed=${hc.toSeq}")
    assert(hn.find(_._1 == 1L).get._2 === List(0, 0),
      "null vector must encode to all-zero codes")
  }

  test("PQ: ADC score equals dot(query, reconstructed codes) exactly") {
    import graft.sim.ProductQuantizer
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    val codes = ProductQuantizer.encode(emb, cb)
      .select("vec_id", "embedding", "pq_codes")
      .where(col("vec_id") < 50).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray,
        r.getSeq[Int](2)))
    val query = codes.find(_._1 == 0L).get._2
    val adc = ProductQuantizer.topK(
        ProductQuantizer.encode(emb, cb).where(col("vec_id") < 50),
        emb.filter(col("vec_id") === 0L), cb, k = 49)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    for ((id, _, cs) <- codes if id != 0L) {
      val recon = ProductQuantizer.reconstruct(cb, cs.map(c => c: Int))
      val want = query.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(adc(id) - want) < 1e-4,
        s"vec $id: adc=${adc(id)} expected=$want")
    }
  }

  test("PQ recall@5: pure ADC >= 0.15, exact re-rank >= 0.6; train deterministic") {
    import graft.sim.ProductQuantizer
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    val cb2 = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    assert(cb.flatten.flatMap(_.toSeq) === cb2.flatten.flatMap(_.toSeq),
      "training must be deterministic")
    // exact inner-product ranking (what ADC approximates)
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv"))
      val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("__dot").desc, col("neighbor_id").asc)
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("__dot", graft.functions.VectorFunctions
          .array_dot(col("__qv"), col("__cv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
    }
    val codes = ProductQuantizer.encode(emb, cb)
    val total = exact.count().toDouble
    // pure ADC: well above random (random recall@5 ≈ 5/n ≈ 0.01)
    val adcHits = ProductQuantizer.topK(codes, queries, cb, k = 5)
      .select("query_id", "neighbor_id").intersect(exact).count().toDouble
    assert(adcHits / total >= 0.15,
      s"pure-ADC recall ${adcHits / total} suspiciously low")
    // ADC shortlist + exact re-rank: the production recipe
    val rrHits = ProductQuantizer.topK(codes, queries, cb, k = 5,
        rerank = 25)
      .select("query_id", "neighbor_id").intersect(exact).count().toDouble
    assert(rrHits / total >= 0.6,
      s"rerank-25 recall ${rrHits / total} below 0.6")
    assert(rrHits >= adcHits, "re-ranking must not lose recall")
  }

  test("IVFADC: decent recall, corpus candidates join equi on cell") {
    import graft.sim.ProductQuantizer
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val cents = Similarity.kmeansCentroids(emb, k = 16, iters = 2)
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    val ivfadc = ProductQuantizer.ivfPqTopK(emb, queries, cents, cb,
      k = 5, nProbe = 4, rerank = 25)
    // recall vs exact dot ranking — IVF misses + PQ shortlist misses
    // both in play, so the floor is lower than plain PQ+rerank
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id")
    val pq = ivfadc.select("query_id", "neighbor_id")
    // NOTE exact uses cosine; IVFADC ranks by dot. On this corpus norms
    // are near-constant so the rankings are comparable — assert a
    // modest floor, not equality.
    val recall =
      pq.intersect(exact).count().toDouble / exact.count().toDouble
    assert(recall >= 0.3, s"IVFADC recall $recall below 0.3")
    // plan shape: the corpus-side candidate join must be an equi-join
    // with the cell id among its keys, never a nested-loop product.
    // AQE off for the inspection session — with it on, executedPlan is
    // an AdaptiveSparkPlanExec leaf that collect() cannot traverse
    // (same caveat as ScaleSpec's gate).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val emb2 = s2.read.parquet(s"$sfDir/embeddings.parquet")
    val cents2 = s2.createDataFrame(cents.rdd, cents.schema)
    val planDf = ProductQuantizer.ivfPqTopK(emb2,
      emb2.filter(col("vec_id") < 10), cents2, cb,
      k = 5, nProbe = 4, rerank = 25)
    val equiJoins = planDf.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec =>
        j.leftKeys.map(_.sql).mkString(",")
    }
    assert(equiJoins.exists(_.contains("cell")),
      s"expected a cell-keyed equi-join, saw: $equiJoins")
  }

  test("OPQ: allocation is a balanced partition; rotation preserves dots; recall holds") {
    import graft.sim.{Opq, Pca}
    // allocation invariants on a skewed spectrum
    val ev = Array(100.0, 50.0, 10.0, 5.0, 1.0, 0.5, 0.1, 0.01)
    val groups = Opq.allocate(ev, m = 4)
    assert(groups.length === 4)
    assert(groups.forall(_.length === 2))
    assert(groups.flatten.sorted.toSeq === (0 until 8))
    // greedy must beat the naive contiguous split on log-product spread
    def spread(gs: Array[Array[Int]]) = {
      val sums = gs.map(_.map(i => math.log(ev(i))).sum)
      sums.max - sums.min
    }
    val naive = Array(Array(0, 1), Array(2, 3), Array(4, 5), Array(6, 7))
    assert(spread(groups) <= spread(naive),
      s"greedy ${spread(groups)} worse than contiguous ${spread(naive)}")

    // rotation is orthonormal → preserves inner products exactly
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", k = Int.MaxValue)
    val r = Opq.rotation(model, m = 8)
    val two = emb.filter(col("vec_id") < 2)
      .select(Opq.rotateColumn(col("embedding"), r).as("rv"),
        col("embedding")).collect()
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (a, b) => a * b }.sum
    val raw = two.map(_.getSeq[Float](1).map(_.toDouble))
    val rot = two.map(_.getSeq[Double](0))
    assert(math.abs(dot(raw(0), raw(1)) - dot(rot(0), rot(1))) < 1e-6)
    assert(math.abs(dot(raw(0), raw(0)) - dot(rot(0), rot(0))) < 1e-6)

    // end-to-end recall vs the exact dot ranking (rerank on, like q_pq_opq)
    val qs = emb.filter(col("vec_id") < 10)
    val got = Opq.topK(emb, qs, m = 8, ksub = 16, iters = 2,
        k = 5, rerank = 25)
      .select("query_id", "neighbor_id")
    val exact = {
      import org.apache.spark.sql.expressions.Window
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("__cv"))
      val q = qs.select(col("vec_id").as("query_id"),
        col("embedding").as("__qv"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("__dot").desc, col("neighbor_id").asc)
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("__dot", graft.functions.VectorFunctions
          .array_dot(col("__qv"), col("__cv")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id")
    }
    val recall = got.intersect(exact).count().toDouble / exact.count()
    assert(recall >= 0.6, s"OPQ rerank recall $recall below 0.6")
  }

  test("semDedup: survivors are a same-cell τ-independent set; dropped are dominated") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tau = 0.9
    val survivors = Similarity.semDedup(emb, k = 16, iters = 3,
      threshold = tau).cache()
    val n = emb.count()
    val kept = survivors.count()
    assert(kept > 0 && kept <= n)

    // (1) no two survivors in the SAME cell may be τ-close: if they
    // were, the larger id had a smaller-id neighbor and was dropped
    val v = emb.select(col("vec_id"), col("embedding"))
    val sv = survivors.join(v, "vec_id")
    val aa = sv.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("__va"))
    val bb = sv.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("__vb"))
    val closePairs = aa.join(bb, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.array_cosine(
        col("__va"), col("__vb")) >= tau)
      .count()
    assert(closePairs === 0, s"$closePairs τ-close survivor pairs")

    // (2) every dropped vector has a smaller-id τ-neighbor in its cell
    val cells = Similarity.assignCells(emb,
      Similarity.kmeansCentroids(emb, k = 16, iters = 3))
      .select(col("vec_id"), col("cell"), col("embedding"))
    val dropped = cells.join(survivors.select("vec_id"), Seq("vec_id"),
      "left_anti")
    val da = dropped.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("__vb"))
    val ca = cells.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("__va"))
    val witnessed = da.join(ca, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.VectorFunctions.array_cosine(
        col("__va"), col("__vb")) >= tau)
      .select("id_b").distinct().count()
    assert(witnessed === dropped.count(),
      "a dropped vector has no dominating neighbor")
    survivors.unpersist()
  }

  test("kCenterGreedy: farthest-first order, shrinking separation") {
    import graft.sim.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = 6
    val out = Similarity.kCenterGreedy(emb, k)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.map(_._1).toSeq === (1L to k.toLong))
    assert(out.map(_._2).distinct.length === k, "picks must be distinct")
    // seed is the smallest id; its separation is NULL
    val minId = emb.agg(min("vec_id")).collect()(0).getLong(0)
    assert(out(0)._2 === minId && out(0)._3.isEmpty)
    // the coverage radius is non-increasing (farthest-first property)
    val seps = out.tail.map(_._3.get)
    assert(seps.forall(_ >= 0.0))
    seps.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"separation must shrink: $a then $b")
    case _ => }
    // rank-2 is the true farthest point from the seed (brute check)
    val d = Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") === minId), k = emb.count().toInt)
      .collect().map(r => r.getLong(1) -> r.getDouble(3))
    val farthest = d.minBy { case (id, cos) => (cos, id) }._1
    assert(out(1)._2 === farthest, "rank 2 must be farthest from seed")
  }

  test("nearDupIncremental replayed in waves reconstructs the full LSH relation") {
    // ingest the corpus in 5 id-sliced waves, each probing the index
    // of everything before it; the union of wave outputs plus the
    // wave-0 intra-batch pairs must equal the one-shot
    // nearDupPairsLsh relation — old x old never re-pairs, nothing
    // is lost (the minhashIncremental discipline, embedding modality)
    import graft.sim.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val full = Similarity.nearDupPairsLsh(emb, threshold = 0.25,
        bands = 4, rowsPerBand = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = scala.collection.mutable.Set[(Long, Long)]()
    var ik: Option[org.apache.spark.sql.DataFrame] = None
    var iv: Option[org.apache.spark.sql.DataFrame] = None
    for (wave <- 0L to 4L) {
      val batch = emb.filter(pmod(col("vec_id"), lit(5L)) === wave)
      (ik, iv) match {
        case (Some(keys), Some(vecs)) =>
          got ++= Similarity.nearDupIncremental(batch, keys, vecs,
              threshold = 0.25, dim = 64)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
        case _ => // first wave: intra-batch pairs via the batch form
          got ++= Similarity.nearDupPairsLsh(batch, threshold = 0.25,
              bands = 4, rowsPerBand = 16)
            .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      val newKeys = Similarity.cosineLshKeys(batch, dim = 64)
      val newVecs = batch.select(col("vec_id"), col("embedding"))
      ik = Some(ik.map(_.unionByName(newKeys)).getOrElse(newKeys))
      iv = Some(iv.map(_.unionByName(newVecs)).getOrElse(newVecs))
    }
    assert(full.nonEmpty, "fixture has no LSH near-dups — vacuous")
    assert(got.toSet === full)
  }

  test("kCenterGreedy: incremental recurrence == naive re-fold, exactly") {
    // the O(k·n·d) production form folds one center per round into a
    // persisted running `mind`; this pins its EXACT equivalence to the
    // textbook re-fold over all selected centers (1 − x is monotone
    // non-increasing in IEEE doubles, so least_i(1−dot_i) =
    // 1−greatest_i(dot_i) bit-for-bit) — selections AND separations
    // must match to the last ulp, not approximately.
    import graft.sim.Similarity
    import graft.functions.VectorFunctions.array_dot
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = 10
    val got = Similarity.kCenterGreedy(emb, k)
      .orderBy("sel_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    // naive re-fold reference (the pre-r9 implementation), replaying
    // the same normalization expressions
    val cu = emb
      .withColumn("__dvec",
        expr("transform(embedding, x -> coalesce(cast(x AS DOUBLE), 0D))"))
      .withColumn("__norm", expr(
        "sqrt(aggregate(zip_with(__dvec, __dvec, (x, y) -> x * y), " +
          "0D, (acc, v) -> acc + v))"))
      .withColumn("u", expr(
        "CASE WHEN __norm > 0 THEN transform(__dvec, x -> x / __norm) " +
          "ELSE __dvec END"))
      .select(col("vec_id").cast("long").as("id"), col("u"))
    val seed = cu.orderBy(col("id").asc).limit(1).collect()(0)
    var selected = Vector(
      (seed.getLong(0), seed.getSeq[Double](1).toArray,
        Option.empty[Double]))
    while (selected.size < k) {
      val maxdot = selected.map { case (_, c, _) =>
        array_dot(col("u"), typedLit(c.toSeq)) }
        .reduce((a, b) => greatest(a, b))
      val next = cu.filter(!col("id").isInCollection(selected.map(_._1)))
        .withColumn("mind", lit(1.0) - maxdot)
        .orderBy(col("mind").desc, col("id").asc).limit(1)
        .select(col("id"), col("mind"), col("u")).collect()(0)
      selected = selected :+ ((next.getLong(0),
        next.getSeq[Double](2).toArray, Some(next.getDouble(1))))
    }
    val want = selected.zipWithIndex.map { case ((id, _, sep), i) =>
      ((i + 1).toLong, id, sep.map(d => new java.math.BigDecimal(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
    }
    assert(got.toSeq === want)
  }
}
