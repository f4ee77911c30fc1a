package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PqFunctions.pq_adc
import graft.functions.VectorFunctions.{array_dot, array_l2}

/** Product quantization for compressed ANN search (Jégou, Douze &
  * Schmid, "Product Quantization for Nearest Neighbor Search", IEEE
  * TPAMI 33(1), 2011).
  *
  * The vector is split into `m` subspaces; each subspace gets its own
  * `ksub`-centroid L2 codebook; a document is stored as `m` small
  * centroid indices (`array<int>`, m bytes of information) instead of
  * `d` floats — 32× compression at m=8 over d=64 float32. Search is
  * asymmetric distance computation: the QUERY stays exact, its inner
  * products against every centroid are tabulated once per query
  * (`m·ksub` values), and each candidate scores in `m` table lookups
  * ([[graft.functions.PqAdc]], codegen'd).
  *
  * Why this matters at 100 TB: brute-force ANN is memory-bandwidth
  * bound — scanning 100 TB of float vectors per query batch is the
  * cost. PQ codes cut the scanned bytes ~32× and compose with the IVF
  * cells ([[Similarity.assignCells]]) exactly as in the paper's
  * IVFADC: route queries to `nProbe` cells, ADC-scan only those cells'
  * codes. Training is Lloyd per subspace — all `m` subspaces train in
  * the SAME pass (one narrow encode map + one (sub, code, pos)-keyed
  * mean shuffle per iteration), and the model state that round-trips
  * through the driver is the `m·ksub·dsub` codebook (~KBs — model,
  * not data), the same contract as [[Similarity.kmeansCentroids]].
  *
  * Deterministic end to end: centroids seed from the `ksub`
  * smallest-id rows, Lloyd ties break to the smaller code, so the
  * same corpus always yields the same codebook/codes.
  */
object ProductQuantizer {

  /** codebook(sub)(code) = centroid of length dsub. */
  type Codebook = IndexedSeq[IndexedSeq[Array[Double]]]

  /** Train per-subspace L2 codebooks with Lloyd iterations. Requires
    * the embedding dim to divide evenly into `m` subspaces. Empty
    * clusters keep their previous centroid.
    */
  def train(corpus: DataFrame, m: Int = 8, ksub: Int = 16, iters: Int = 3,
            vecCol: String = "embedding",
            idCol: String = "vec_id"): Codebook = {
    require(m >= 1 && ksub >= 1 && iters >= 0,
      s"need m>=1, ksub>=1, iters>=0: $m/$ksub/$iters")
    val seed = corpus.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol).asc).limit(ksub)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
        case null => 0.0
      }.toArray)
    require(seed.nonEmpty, "empty corpus: nothing to train on")
    val d = seed(0).length
    require(d % m == 0, s"dim $d must be divisible by m=$m subspaces")
    val dsub = d / m
    var cb: Codebook = IndexedSeq.tabulate(m) { s =>
      // fewer rows than ksub: cycle the seeds (duplicate centroids are
      // harmless — argmin ties to the smaller code)
      IndexedSeq.tabulate(ksub)(c =>
        seed(c % seed.length).slice(s * dsub, (s + 1) * dsub))
    }
    for (_ <- 1 to iters) {
      val means = encode(corpus, cb, vecCol)
        .select(posexplode(col("pq_codes")).as(Seq("sub", "code")),
          col(vecCol))
        .select(col("sub"), col("code"),
          slice(col(vecCol), col("sub") * dsub + 1, lit(dsub)).as("__sv"))
        .select(col("sub"), col("code"),
          posexplode(col("__sv")).as(Seq("pos", "v")))
        .groupBy("sub", "code", "pos")
        .agg(avg(coalesce(col("v"), lit(0.0))).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
      cb = IndexedSeq.tabulate(m)(s => IndexedSeq.tabulate(ksub)(c =>
        means.getOrElse((s, c), cb(s)(c))))
    }
    cb
  }

  /** Literal array<struct<code:int, cent:array<double>>> for one
    * subspace — the broadcast-free model literal (same pattern as
    * [[Similarity.assignCells]]'s centroid frame, but the codebook is
    * driver-side model state so a plain literal is simpler and keeps
    * the encode map narrow).
    */
  private def litSub(sub: IndexedSeq[Array[Double]]): Column =
    array(sub.zipWithIndex.map { case (cent, code) =>
      struct(lit(code).as("code"), Similarity.litVec(cent).as("cent"))
    }: _*)

  /** Add `pq_codes: array<int>` — per subspace, the L2-nearest centroid
    * index (ties → smaller code). Narrow map, no shuffle, ONE native
    * codegen expression ([[graft.functions.PqEncode]]) carrying the
    * whole flattened codebook: the r11 ×100 leg measured the previous
    * `transform`/`array_max` composition (higher-order functions are
    * CodegenFallback — interpreted, boxed structs per centroid per row)
    * at ~3 ms/row, 639 CPU-s for a 200 k-row encode; the native loop is
    * the entire PQ-family fix. [[encodeComposed]] keeps the composed
    * form, and SimilaritySpec pins bit-equality between the two.
    */
  def encode(df: DataFrame, cb: Codebook,
             vecCol: String = "embedding",
             outCol: String = "pq_codes"): DataFrame = {
    val m = cb.length
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    val flat = new Array[Double](m * ksub * dsub)
    for (s <- 0 until m; c <- 0 until ksub; p <- 0 until dsub)
      flat((s * ksub + c) * dsub + p) = cb(s)(c)(p)
    // composed-form edge: a NULL vector encodes to all-zero codes (its
    // per-code distances were all null → all-tie → smallest code)
    df.withColumn(outCol, coalesce(
      graft.functions.PqEncodeFunctions.pq_encode(
        col(vecCol), m, ksub, dsub, flat),
      lit(Array.fill(m)(0))))
  }

  /** The pre-r11 composed encode (slice + transform over the literal
    * codebook + array_max over `(−dist, −code)` structs) — retained as
    * the independently-derived semantics oracle for [[encode]]'s native
    * expression; spec-only, never on a hot path.
    */
  private[graft] def encodeComposed(df: DataFrame, cb: Codebook,
                                    vecCol: String = "embedding",
                                    outCol: String = "pq_codes"): DataFrame = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val codeExprs = (0 until m).map { s =>
      val sv = slice(col(vecCol), s * dsub + 1, dsub)
      (-array_max(transform(litSub(cb(s)), c =>
        struct((-array_l2(sv, c.getField("cent"))).as("nd"),
          (-c.getField("code")).as("nc"))))
        .getField("nc")).cast("int")
    }
    df.withColumn(outCol, array(codeExprs: _*))
  }

  /** Driver-side reconstruction of one code array (spec/debug use). */
  def reconstruct(cb: Codebook, codes: Seq[Int]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, s) => cb(s)(c) }.toArray

  /** ADC top-k by inner product: per query, tabulate `m·ksub` exact
    * subspace dot products ONCE (the LUT — computed on the broadcast
    * query side), then every candidate scores in `m` lookups. The ADC
    * score equals `dot(query, reconstruct(codes))` exactly (asserted
    * in SimilaritySpec), so ranking quality degrades only with
    * quantization error, never with corpus size.
    *
    * `rerank > 0` is the production recipe (paper §V.C): take the ADC
    * top-`rerank` shortlist, re-score those few candidates with the
    * EXACT dot product, return the exact top-k. The expensive full-dim
    * math runs on |queries|·rerank rows instead of the whole corpus —
    * recall approaches exact search while the corpus scan still reads
    * only codes. Requires `corpusCodes` to retain `vecCol`. Both
    * windows share the query_id partitioning: one shuffle total.
    *
    * Approximate → no SQL oracle; recall vs the exact dot ranking is
    * spec-tested. Output: `(query_id, neighbor_id, rank, score)` —
    * score is the ADC estimate (rerank=0) or the exact dot (rerank>0).
    */
  def topK(corpusCodes: DataFrame, queries: DataFrame, cb: Codebook,
           k: Int = 5, vecCol: String = "embedding",
           idCol: String = "vec_id",
           codesCol: String = "pq_codes",
           rerank: Int = 0): DataFrame = {
    val withRerank = rerank > 0
    if (withRerank) require(corpusCodes.columns.contains(vecCol),
      s"rerank needs the raw '$vecCol' column on corpusCodes")
    val q = queries.select(
      col(idCol).as("query_id") +: lutExpr(cb, vecCol).as("__lut") +:
        (if (withRerank) Seq(col(vecCol).as("__qv")) else Nil): _*)
    val cs = corpusCodes.select(
      col(idCol).as("neighbor_id") +: col(codesCol).as("__codes") +:
        (if (withRerank) Seq(col(vecCol).as("__cv")) else Nil): _*)
    adcRank(cs.join(broadcast(q), col("query_id") =!= col("neighbor_id")),
      k, rerank)
  }

  /** IVFADC (paper §V): route each query to its `nProbe` best cells,
    * ADC-scan ONLY those cells' codes. The corpus-side candidate join
    * is an EQUI-join on the cell id — at 100 TB, with the corpus
    * written partitioned/bucketed by cell, each query batch touches
    * `nProbe/k_cells` of the data and nothing else shuffles. This is
    * the compressed-scan analogue of [[Similarity.ivfTopKWith]]
    * (which scans raw floats in the probed cells).
    *
    * `centroids`: the coarse quantizer (e.g.
    * [[Similarity.kmeansCentroids]] output). `rerank` as in [[topK]].
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                centroids: DataFrame, cb: Codebook,
                k: Int = 5, nProbe: Int = 3, rerank: Int = 0,
                vecCol: String = "embedding",
                idCol: String = "vec_id"): DataFrame = {
    val withRerank = rerank > 0
    val codes = encode(
      Similarity.assignCells(corpus, centroids, vecCol, idCol), cb, vecCol)
    val cs = codes.select(
      col(idCol).as("neighbor_id") +: col("pq_codes").as("__codes") +:
        col("cell") +:
        (if (withRerank) Seq(col(vecCol).as("__cv")) else Nil): _*)
    // nProbe best cells per query (bounded |queries| × |centroids|
    // broadcast ranking, same as ivfTopKWith), carrying the LUT along
    val cu = Similarity.withUnit(centroids, vecCol)
      .select(col(idCol).as("cell"), col("__unit").as("__cent_u"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("__csim").desc, col("cell").asc)
    val qcells = queries
      .select(col(idCol).as("query_id") +: col(vecCol).as("__q") +:
        (if (withRerank) Seq(col(vecCol).as("__qv")) else Nil): _*)
      .crossJoin(broadcast(cu))
      .withColumn("__csim", array_dot(col("__q"), col("__cent_u")))
      .withColumn("__r", row_number().over(wq))
      .filter(col("__r") <= nProbe)
      .select(col("query_id") +: col("cell") +:
        lutExpr(cb, "__q").as("__lut") +:
        (if (withRerank) Seq(col("__qv")) else Nil): _*)
    adcRank(cs.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id")), k, rerank)
  }

  /** Per-query lookup table: exact inner products of each query
    * subvector against every centroid, flattened `[sub·ksub + code]`.
    */
  private def lutExpr(cb: Codebook, vecCol: String): Column = {
    val ksub = cb(0).length
    val dsub = cb(0)(0).length
    array((for (s <- cb.indices; c <- 0 until ksub) yield
      array_dot(slice(col(vecCol), s * dsub + 1, dsub),
        Similarity.litVec(cb(s)(c)))): _*)
  }

  /** Shared scoring tail: ADC shortlist window, optional exact re-rank.
    * `cand` carries (query_id, neighbor_id, __codes, __lut[, __qv,
    * __cv]). Both windows partition by query_id: one shuffle total.
    */
  private def adcRank(cand: DataFrame, k: Int, rerank: Int): DataFrame = {
    val withRerank = rerank > 0
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("__adc").desc, col("neighbor_id").asc)
    val shortlist = cand
      .withColumn("__adc", pq_adc(col("__codes"), col("__lut")))
      .withColumn("__r", row_number().over(wAdc))
      .filter(col("__r") <= (if (withRerank) math.max(rerank, k) else k))
    if (!withRerank)
      shortlist.select(col("query_id"), col("neighbor_id"),
        col("__r").cast("long").as("rank"),
        round(col("__adc"), 6).as("score"))
    else {
      val wExact = Window.partitionBy("query_id")
        .orderBy(col("__dot").desc, col("neighbor_id").asc)
      shortlist
        .withColumn("__dot", array_dot(col("__qv"), col("__cv")))
        .withColumn("rank", row_number().over(wExact).cast("long"))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          round(col("__dot"), 6).as("score"))
    }
  }
}
