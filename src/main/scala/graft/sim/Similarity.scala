package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{array_cosine, array_dot}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), expression-only (codegen-friendly, no UDF).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: baseline — broadcast the (small) query set,
  *    scan the corpus once, per-query top-k via window. Exact; the scan
  *    is embarrassingly parallel and the only shuffle is keyed by
  *    query_id for the top-k.
  *  - [[ivfTopK]]: scale path — IVF-style coarse quantization: assign
  *    every corpus vector to its nearest centroid (one broadcast pass),
  *    probe only the `nProbe` nearest centroid cells per query. At 100
  *    TB the cell assignment is a narrow map (partition-pruned if the
  *    corpus is written bucketed by cell) and the candidate join is
  *    keyed by cell id.
  */
object Similarity {

  /** Dot product of two double arrays (expression tree). */
  private def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

  /** L2 norm. */
  private def normExpr(a: String): String =
    s"sqrt(${dotExpr(a, a)})"

  /** Add a unit-normalized double copy of `vecCol` as `__unit`. */
  private def withUnit(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("__dvec", expr(s"transform($vecCol, x -> cast(x AS DOUBLE))"))
      .withColumn("__norm", expr(normExpr("__dvec")))
      .withColumn("__unit", expr(
        "CASE WHEN __norm > 0 THEN transform(__dvec, x -> x / __norm) " +
          "ELSE __dvec END"))
      .drop("__dvec", "__norm")

  /** Exact cosine top-k: for every row of `queries`, the `k` nearest
    * corpus rows by cosine similarity (ties → smaller corpus id).
    * Output: `(query_id, neighbor_id, rank, cosine)`.
    *
    * Queries are unit-normalized and BROADCAST (the small side); cosine
    * reduces to a dot product of unit vectors. Corpus rows never
    * shuffle until the keyed top-k.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
                     vecCol: String = "embedding",
                     idCol: String = "vec_id"): DataFrame = {
    val c = withUnit(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__unit").as("__cu"))
    val q = withUnit(queries, vecCol)
      .select(col(idCol).as("query_id"), col("__unit").as("__qu"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    // native codegen'd dot product (graft.functions.ArrayDot) — the
    // per-pair hot loop; unit vectors make it the cosine
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("__cos", array_dot(col("__qu"), col("__cu")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__cos"), 6).as("cosine"))
  }

  /** Deterministic coarse centroids: the corpus rows whose id is in
    * `centroidIds` (k-means would be the production path; seeding by id
    * keeps the operator deterministic for the oracle).
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
                  vecCol: String = "embedding",
                  idCol: String = "vec_id"): DataFrame = {
    val cents = withUnit(centroids, vecCol)
      .select(col(idCol).as("__cent_id"), col("__unit").as("__cent_unit"))
    val rows = withUnit(corpus, vecCol)
    // collect centroid list as one broadcastable array literal via
    // cross-join of a 1-row aggregated frame (no driver collect)
    val centArr = cents.agg(
      collect_list(struct(col("__cent_id"), col("__cent_unit"))).as("__cents"))
    rows.crossJoin(broadcast(centArr))
      .withColumn("cell", expr(
        """aggregate(__cents,
          |  struct(cast(-1L AS BIGINT) AS id, cast(-2D AS DOUBLE) AS sim),
          |  (best, c) -> CASE WHEN aggregate(zip_with(c.__cent_unit, __unit,
          |      (x, y) -> x * y), 0D, (acc, v) -> acc + v) > best.sim
          |    THEN struct(c.__cent_id AS id,
          |      aggregate(zip_with(c.__cent_unit, __unit, (x, y) -> x * y),
          |        0D, (acc, v) -> acc + v) AS sim)
          |    ELSE best END).id""".stripMargin))
      .drop("__cents")
  }

  /** IVF top-k: probe only the cells of the `nProbe` centroids nearest
    * to each query. Returns the same schema as [[bruteForceTopK]];
    * approximate (recall < 1 when the true neighbor lives in an
    * unprobed cell).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              centroidIds: Seq[Long], k: Int = 5, nProbe: Int = 3,
              vecCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame = {
    val centroids = corpus.filter(col(idCol).isin(centroidIds: _*))
    val cells = assignCells(corpus, centroids, vecCol, idCol)
      .select(col(idCol).as("neighbor_id"), col("__unit").as("__cu"),
        col("cell"))
    // nearest nProbe cells per query: rank centroids by cosine
    val qcells = {
      val qu = withUnit(queries, vecCol)
        .select(col(idCol).as("query_id"), col("__unit").as("__qu"))
      val cu = withUnit(centroids, vecCol)
        .select(col(idCol).as("cell"), col("__unit").as("__cent_u"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("__csim").desc, col("cell").asc)
      qu.crossJoin(broadcast(cu))
        .withColumn("__csim", array_dot(col("__qu"), col("__cent_u")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= nProbe)
        .select("query_id", "cell", "__qu")
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id").asc)
    cells.join(broadcast(qcells), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__cos", array_dot(col("__qu"), col("__cu")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__cos"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs, exact: every pair with
    * cosine ≥ threshold (native codegen'd [[graft.functions.ArrayCosine]]
    * in the hot loop). The non-equi self-join broadcasts one side —
    * correct for corpora that fit broadcast; at 100 TB use
    * [[nearDupPairsLsh]], which turns the product into a bucket-keyed
    * equi-join.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double = 0.5,
                   vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("__cos", array_cosine(col("__va"), col("__vb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 6).as("cosine"))
  }

  /** LSH-bucketed near-dup: candidates must share a random-hyperplane
    * bucket, so the join key is the bucket, not the pair product.
    * Approximate (misses cross-bucket pairs; raise `planes` ↓ buckets).
    */
  def nearDupPairsLsh(corpus: DataFrame, threshold: Double = 0.5,
                      planes: Int = 8, vecCol: String = "embedding",
                      idCol: String = "vec_id"): DataFrame = {
    val buckets = cosineLshBuckets(corpus, planes, vecCol, idCol)
    val withB = corpus.join(buckets, Seq(idCol))
    val a = withB.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col("bucket"))
    val b = withB.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__cos", array_cosine(col("__va"), col("__vb")))
      .filter(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 6).as("cosine"))
      .distinct()
  }

  /** Random-hyperplane LSH buckets for cosine: bit i of the bucket key
    * is the sign of the dot product with a deterministic pseudo-random
    * hyperplane derived from xxhash64(dimension, plane). Candidate
    * pairs share a bucket; same inverted-index-join scale shape as
    * MinHash LSH.
    */
  def cosineLshBuckets(df: DataFrame, planes: Int = 16,
                       vecCol: String = "embedding",
                       idCol: String = "vec_id"): DataFrame = {
    val u = withUnit(df, vecCol)
    // hyperplane p component d = (xxhash64(d, p) mod 1000)/1000 - 0.5
    u.withColumn("bucket", expr(
      s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, p) ->
         |  acc | (CASE WHEN aggregate(
         |    zip_with(__unit,
         |      transform(sequence(0, size(__unit) - 1),
         |        d -> cast(pmod(xxhash64(d, p), 1000L) AS DOUBLE) / 1000.0 - 0.5),
         |      (x, h) -> x * h),
         |    0D, (acc2, v) -> acc2 + v) > 0 THEN 1L ELSE 0L END << p))"""
        .stripMargin))
      .select(col(idCol), col("bucket"))
  }
}
