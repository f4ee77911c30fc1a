package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` (Misra &
  * Gries, "Finding repeated elements", Sci. Comput. Program. 1982;
  * merge rule from Agarwal et al., "Mergeable summaries", PODS 2012).
  *
  * Tracks at most `k` counters over a token stream. Guarantees:
  *  - every item with true frequency > n/(k+1) is IN the sketch
  *    (no false negatives above the threshold);
  *  - each reported count underestimates the true count by at most
  *    n/(k+1).
  *
  * Merge sums counters then subtracts the (k+1)-th largest value from
  * all (keeping positives) — associative/commutative, so Spark runs it
  * as a normal partial aggregation: each task summarizes its partition
  * into ≤ k counters map-side and only sketches cross the shuffle.
  * That is the whole point at 100 TB: corpus-wide top-token statistics
  * with O(k) state per task instead of a full token-frequency shuffle
  * (the exact path, `TrainingQueries.termFreq`, shuffles every
  * distinct token).
  *
  * The mutable.Map buffer is Spark-safe: Aggregator buffers are
  * per-task and serialized between stages by `bufferEncoder` (kryo).
  */
class MisraGries(k: Int)
  extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"need k >= 1: $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], t: String)
  : mutable.Map[String, Long] = {
    if (t == null) buf
    else buf.get(t) match {
      case Some(c) => buf.update(t, c + 1); buf
      case None if buf.size < k => buf.update(t, 1L); buf
      case None =>
        // MG step: decrement every counter, dropping zeros
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1
          if (c == 0) dead += key else buf.update(key, c)
        }
        dead.foreach(buf.remove)
        buf
    }
  }

  override def merge(a: mutable.Map[String, Long],
                     b: mutable.Map[String, Long])
  : mutable.Map[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from all, keep positives
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val c = a(key) - cut
        if (c <= 0) dead += key else a.update(key, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
