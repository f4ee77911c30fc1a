package graft

import org.apache.spark.sql.functions._

import graft.sim.Pca

/** PCA semantics: exact recovery on a hand-built anisotropic cloud,
  * spectral invariants (orthonormal components, descending non-negative
  * eigenvalues, trace preservation) on the real embeddings, and the
  * distributed projection agreeing with the moments-pass eigenvalues.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** 2-D points exactly on the y = x line, plus symmetric off-line
    * noise along y = -x: first PC must be (1,1)/√2 (up to sign) and the
    * eigenvalues must be the per-axis variances in the rotated frame.
    */
  private def line = Seq(
    Array(-2.0f, -2.0f), Array(-1.0f, -1.0f), Array(0.0f, 0.0f),
    Array(1.0f, 1.0f), Array(2.0f, 2.0f),
    Array(0.5f, -0.5f), Array(-0.5f, 0.5f)
  ).toDF("embedding")

  test("fit recovers the dominant direction of a known 2-D cloud") {
    val m = Pca.fit(line, "embedding", k = 2)
    assert(m.mean.forall(v => math.abs(v) < 1e-9))
    val pc1 = m.components(0)
    val c = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(pc1(0) * c + pc1(1) * c) - 1.0) < 1e-9,
      s"pc1 not along (1,1): ${pc1.mkString(",")}")
    // population variances: along (1,1)/√2 → 20/7; along (1,-1)/√2 → 1/7
    assert(math.abs(m.eigenvalues(0) - 20.0 / 7) < 1e-9)
    assert(math.abs(m.eigenvalues(1) - 1.0 / 7) < 1e-9)
  }

  test("components are orthonormal and eigenvalues descend, on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val m = Pca.fit(emb, "embedding", k = 8)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val dot = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"<pc$i, pc$j> = $dot")
    }
    assert(m.eigenvalues.forall(_ >= -1e-12))
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("jacobiEigen preserves the trace (sum of eigenvalues = total variance)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val full = Pca.fit(emb, "embedding", k = Int.MaxValue)
    // total variance straight from Spark's var_pop, one pass
    val d = full.mean.length
    val row = emb.select(
      (0 until d).map(i => var_pop(element_at(col("embedding"), i + 1))
        .as(s"v$i")): _*).head()
    val trace = (0 until d).map(row.getDouble).sum
    assert(math.abs(full.eigenvalues.sum - trace) < 1e-6 * math.max(1.0, trace))
  }

  test("projected coordinate variance equals the eigenvalue (q_pca self-check)") {
    val got = SparkEntry.queries("q_pca")(spark, sfDir).collect()
    assert(got.length === 4)
    got.foreach { r =>
      val (ev, pv) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(ev - pv) <= 1e-4 * math.max(1.0, ev),
        s"pc ${r.getInt(0)}: eigenvalue $ev vs projected var $pv")
    }
    // evr is a ratio over the full spectrum: positive, ≤ 1, descending
    val evr = got.map(_.getDouble(3))
    assert(evr.forall(v => v > 0 && v <= 1.0))
    assert(evr.sliding(2).forall(p => p(0) >= p(1)))
  }
}
