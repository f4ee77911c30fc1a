package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.array_dot

/** PCA over an embedding column — the whitening / dimensionality-
  * reduction preprocessor ANN indexes use (PQ quality in particular
  * depends on decorrelated, variance-balanced subspaces; cf. Jégou
  * et al., "Product quantization for nearest neighbor search", TPAMI
  * 2011 §V.A, which applies a random/structured rotation first for
  * exactly this reason).
  *
  * Spark-shaped split of the classic algorithm:
  *  - moments (n, Σx, Σx⊗x) come from ONE pass via a typed
  *    [[Aggregator]] with an upper-triangle packed buffer —
  *    commutative/associative, so it partially aggregates map-side and
  *    merges like any built-in; 100 TB costs one scan + a d(d+3)/2
  *    double shuffle per partition, nothing driver-side grows with n;
  *  - the d×d eigendecomposition happens on the DRIVER (cyclic Jacobi —
  *    d is an embedding dimension, 64 here, so this is microseconds;
  *    the data-sized work never leaves the cluster);
  *  - projection back over the corpus is a narrow map of k codegen'd
  *    [[graft.functions.ArrayDot]]s against literal component vectors —
  *    no shuffle, no UDF.
  */
object Pca {

  /** Eigenvectors are rows of `components` (unit length, eigenvalue-
    * descending); `eigenvalues` are the population variances along them.
    */
  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]],
                         eigenvalues: Array[Double])

  /** Packed second-moment accumulator: `(n, sums[d], prods[d(d+1)/2])`
    * with `prods` the upper triangle of Σ x⊗x in row-major order.
    */
  object MomentsAgg extends Aggregator[Seq[Float],
      (Long, Array[Double], Array[Double]), (Long, Seq[Double], Seq[Double])] {

    override def zero: (Long, Array[Double], Array[Double]) =
      (0L, Array.empty, Array.empty)

    override def reduce(buf: (Long, Array[Double], Array[Double]),
                        v: Seq[Float]) = {
      if (v == null) buf
      else {
        val d = v.length
        val (n, s0, p0) = buf
        val (s, p) =
          if (s0.isEmpty) (new Array[Double](d), new Array[Double](d * (d + 1) / 2))
          else (s0, p0)
        require(s.length == d,
          s"Pca.MomentsAgg: embedding dim $d != ${s.length}")
        val x = new Array[Double](d)
        var i = 0
        while (i < d) { x(i) = v(i); s(i) += x(i); i += 1 }
        var k = 0
        i = 0
        while (i < d) {
          var j = i
          while (j < d) { p(k) += x(i) * x(j); j += 1; k += 1 }
          i += 1
        }
        (n + 1, s, p)
      }
    }

    override def merge(a: (Long, Array[Double], Array[Double]),
                       b: (Long, Array[Double], Array[Double])) = {
      if (a._1 == 0) b
      else if (b._1 == 0) a
      else {
        require(a._2.length == b._2.length,
          s"Pca.MomentsAgg: partial dims ${a._2.length} != ${b._2.length}")
        var i = 0
        while (i < a._2.length) { a._2(i) += b._2(i); i += 1 }
        i = 0
        while (i < a._3.length) { a._3(i) += b._3(i); i += 1 }
        (a._1 + b._1, a._2, a._3)
      }
    }

    override def finish(r: (Long, Array[Double], Array[Double])) =
      (r._1, r._2.toSeq, r._3.toSeq)

    override def bufferEncoder: Encoder[(Long, Array[Double], Array[Double])] =
      Encoders.kryo[(Long, Array[Double], Array[Double])]
    override def outputEncoder: Encoder[(Long, Seq[Double], Seq[Double])] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Seq[Double], Seq[Double])]()
  }

  /** Fit top-`k` components. One distributed pass + driver-side d×d
    * Jacobi; see object doc for the cost split.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    import df.sparkSession.implicits._
    // normalize the element type BEFORE the typed boundary: a direct
    // .as[Seq[Float]] rejects array<double> corpora at analysis and
    // NPEs on a null ELEMENT (na.drop only removes null rows); the
    // cast+coalesce accepts either width and applies the library-wide
    // null-element-as-0 convention (ArrayDot, withUnit, quantizeInt8)
    val (n, sums, prods) = df
      .select(expr(
        s"transform($vecCol, x -> coalesce(cast(x AS FLOAT), 0F))")
        .as("value"))
      .na.drop()
      .as[Seq[Float]]
      .select(udaf(MomentsAgg).apply(col("value")).as("m"))
      .select(col("m._1"), col("m._2"), col("m._3"))
      .as[(Long, Seq[Double], Seq[Double])]
      .head()
    require(n > 1, s"Pca.fit: need at least 2 vectors, got $n")
    val d = sums.length
    val mean = sums.map(_ / n).toArray
    // population covariance from packed moments
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val c = prods(idx) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      idx += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy(-_._1).map(_._2).take(k)
    Model(mean,
      order.map(c => vectors.map(row => row(c))),
      order.map(values))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Converges quadratically; for d ≤ a few hundred this is driver
    * noise. (Golub & Van Loan, "Matrix Computations", §8.5.)
    */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 30,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (sweep < sweeps && off() > tol) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > tol / d) {
        // the rotation angle that zeroes a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // sgn(0) must be 1 (Rutishauser): equal diagonal entries need a
        // 45° rotation, not a no-op — math.signum(0.0) would stall here
        val t = (if (theta >= 0) 1.0 else -1.0) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val (aip, aiq) = (a(i)(p), a(i)(q))
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val (api, aqi) = (a(p)(i), a(q)(i))
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val (vip, viq) = (v(i)(p), v(i)(q))
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Projection column: vector → k principal coordinates (centered).
    * k codegen'd dots against literal components; a narrow map.
    */
  def projectColumn(vecCol: Column, model: Model): Column = {
    val centeredDots = model.components.map { pc =>
      // dot(x - mean, pc) = dot(x, pc) - dot(mean, pc): keep the data
      // side a single ArrayDot and fold the mean term into a literal
      val meanDot = pc.zip(model.mean).map { case (a, b) => a * b }.sum
      array_dot(vecCol, lit(pc)) - lit(meanDot)
    }
    array(centeredDots: _*)
  }
}
