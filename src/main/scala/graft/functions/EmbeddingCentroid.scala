package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (SURVEY.md §2.10/§7.4): element-wise mean of an
  * embedding column — the centroid/summary aggregate a training-data
  * pipeline uses for cluster summaries and IVF codebook refinement.
  *
  * Buffer is `(sum vector, count)`; merge is element-wise — classic
  * commutative/associative partial aggregation, so Spark computes it
  * map-side before the shuffle like any built-in agg.
  */
object EmbeddingCentroid
  extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(buf: (Array[Double], Long), v: Seq[Float])
  : (Array[Double], Long) = {
    if (v == null) buf
    else {
      val sums = if (buf._1.isEmpty) new Array[Double](v.length) else buf._1
      // Ragged inputs must FAIL, not silently truncate to whichever
      // dimensionality a partition happened to see first.
      require(v.length == sums.length,
        s"EmbeddingCentroid: embedding dim ${v.length} != ${sums.length}")
      var i = 0
      while (i < sums.length) { sums(i) += v(i); i += 1 }
      (sums, buf._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long))
  : (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"EmbeddingCentroid: partial dims ${a._1.length} != ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(buf: (Array[Double], Long)): Seq[Double] =
    if (buf._2 == 0) Seq.empty
    else buf._1.map(_ / buf._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
