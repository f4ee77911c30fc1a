package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k per group as a typed `Aggregator`: keeps the k best
  * `(score, id)` pairs by (score DESC, id ASC — deterministic
  * tie-break), never more than `2k` buffered.
  *
  * Why this exists next to `Ops.topKPerGroup` (the window form): a
  * `row_number` window must shuffle EVERY row of a group to one
  * partition and sort it before it can discard rank > k (Spark's
  * WindowGroupLimit pushes a per-partition limit down, but the full
  * k-per-map-partition set still crosses the shuffle and is re-sorted).
  * An Aggregator participates in PARTIAL aggregation: each map task
  * reduces its slice of a group to ≤ k pairs, only those cross the
  * shuffle, and merge is a k-way bound — O(k) state and traffic per
  * (task × group) with NO sort of the full group. At 100 TB, top-5
  * orders per priority is 5 rows per task per priority on the wire
  * instead of the whole orders table.
  *
  * Cost law: reduce is amortized O(log k) per row (append + sort every
  * k appends); merge is O(k log k). The buffer is pruned to k before
  * it can exceed 2k, so buffer encoding stays bounded too.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)],
    Seq[(Double, Long)]] {
  require(k >= 1, s"need k >= 1: $k")

  // best-first: score desc, then id asc
  private val best: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  override def zero: mutable.ArrayBuffer[(Double, Long)] =
    mutable.ArrayBuffer.empty

  private def prune(buf: mutable.ArrayBuffer[(Double, Long)])
  : mutable.ArrayBuffer[(Double, Long)] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(best).take(k)
      buf.clear()
      buf ++= kept
    }

  override def reduce(buf: mutable.ArrayBuffer[(Double, Long)],
                      t: (Double, Long))
  : mutable.ArrayBuffer[(Double, Long)] = {
    buf += t
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)])
  : mutable.ArrayBuffer[(Double, Long)] = prune(a ++= b)

  override def finish(buf: mutable.ArrayBuffer[(Double, Long)])
  : Seq[(Double, Long)] = buf.sorted(best).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
