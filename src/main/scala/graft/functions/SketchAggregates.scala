package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-state sketch aggregates as native
  * [[TypedImperativeAggregate]]s — the same Catalyst machinery behind
  * Spark's own `count_min_sketch` / `approx_percentile`.
  *
  * Why NOT a typed `Aggregator` with a kryo `bufferEncoder`: that path
  * stores the buffer as a binary column in the aggregation row, so
  * every single `reduce` call round-trips the whole sketch through
  * kryo (deserialize → add one token → reserialize). Measured on this
  * repo's own bench it turned a 20-counter Misra–Gries over sf0.001
  * tokens into 23 s of pure CPU. A `TypedImperativeAggregate` keeps
  * the buffer as a LIVE JVM object inside `ObjectHashAggregateExec`
  * and serializes exactly once per task — when partial sketches cross
  * the shuffle. That is the contract sketches need: O(k) state per
  * task, O(rows) cheap updates, O(k) wire traffic.
  */
object SketchAggregates {

  /** Misra–Gries heavy-hitters column: map token → estimated count,
    * at most `k` entries (see [[MisraGriesSketch]] for guarantees).
    */
  def misra_gries(tok: Column, k: Int): Column =
    toCol(MisraGriesSketch(toExpr(tok.cast("string")), k)
      .toAggregateExpression())

  /** Bounded per-group top-k pairs by (score DESC, id ASC):
    * array<struct<score:double, id:bigint>> of length ≤ k.
    */
  def top_k_pairs(score: Column, id: Column, k: Int): Column =
    toCol(TopKPairs(toExpr(score.cast("double")), toExpr(id.cast("long")), k)
      .toAggregateExpression())
}

/** Misra–Gries heavy-hitters sketch (Misra & Gries, "Finding repeated
  * elements", Sci. Comput. Program. 1982; merge rule from Agarwal et
  * al., "Mergeable summaries", PODS 2012).
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
  * with O(k) state per task instead of the full token-frequency
  * shuffle of the exact path (`TrainingQueries.termFreq`).
  */
/** The pure Misra–Gries steps, shared by the batch
  * TypedImperativeAggregate ([[MisraGriesSketch]]) and the streaming
  * state operator ([[graft.stream.Streams.heavyHittersStream]]) — one
  * implementation so a fix to the decrement/merge discipline cannot
  * miss a surface. Both steps preserve the sketch invariant: for any
  * item, (true count − sketch count) ≤ N/(k+1) over the items folded
  * in so far.
  */
object MisraGries {

  /** One MG insertion: bump, admit while below k, else the global
    * decrement that drops zeroed counters.
    */
  def add(buf: mutable.HashMap[String, Long], t: String, k: Int): Unit =
    buf.get(t) match {
      case Some(c) => buf.update(t, c + 1)
      case None if buf.size < k => buf.update(t, 1L)
      case None =>
        // MG step: decrement every counter, dropping zeros
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { key =>
          val c = buf(key) - 1
          if (c == 0) dead += key else buf.update(key, c)
        }
        dead.foreach(buf.remove)
    }

  /** Sketch merge into `a` (Agarwal et al.'s mergeable-summaries
    * rule): sum counters, then subtract the (k+1)-th largest count
    * from all and keep positives.
    */
  def mergeInto(a: mutable.HashMap[String, Long],
                b: scala.collection.Map[String, Long], k: Int): Unit = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { key =>
        val c = a(key) - cut
        if (c <= 0) dead += key else a.update(key, c)
      }
      dead.foreach(a.remove)
    }
  }
}

case class MisraGriesSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {
  require(k >= 1, s"need k >= 1: $k")

  override def prettyName: String = "misra_gries"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
  : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    MisraGries.add(buf, v.asInstanceOf[UTF8String].toString, k)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long])
  : mutable.HashMap[String, Long] = {
    MisraGries.mergeInto(a, b, k)
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic key order so downstream explode order is stable
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(
        entries.map(e => UTF8String.fromString(e._1): Any)),
      new GenericArrayData(entries.map(_._2: Any)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
  : mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression)
  : MisraGriesSketch = copy(child = c)
}

/** Bounded top-k `(score, id)` pairs per group, best-first by
  * (score DESC, id ASC — deterministic tie-break).
  *
  * Why this exists next to `Ops.topKPerGroup` (the window form): a
  * `row_number` window must shuffle EVERY row of a group to one
  * partition and sort it before it can discard rank > k (Spark's
  * WindowGroupLimit pushes a per-partition limit down, but the full
  * k-per-map-partition set still crosses the shuffle and is
  * re-sorted). This aggregate participates in PARTIAL aggregation:
  * each map task reduces its slice of a group to ≤ k pairs, only
  * those cross the shuffle, and merge is a k-way bound — O(k) state
  * and traffic per (task × group) with NO sort of the full group. At
  * 100 TB, top-5 orders per priority is 5 rows per task per priority
  * on the wire instead of the whole orders table.
  *
  * Cost law: update is amortized O(log k) per row (append + prune
  * every k appends); merge is O(k log k). The buffer is pruned to k
  * before it can exceed 2k, so serialized size stays bounded too.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Double, Long)]]
  with BinaryLike[Expression] {
  require(k >= 1, s"need k >= 1: $k")

  override def prettyName: String = "top_k_pairs"
  override def left: Expression = score
  override def right: Expression = id
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  // best-first: score desc, then id asc
  private val best: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])

  private def prune(buf: mutable.ArrayBuffer[(Double, Long)])
  : mutable.ArrayBuffer[(Double, Long)] =
    if (buf.length <= k) buf
    else {
      val kept = buf.sorted(best).take(k)
      buf.clear(); buf ++= kept
    }

  override def createAggregationBuffer()
  : mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Double, Long)],
                      input: InternalRow)
  : mutable.ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s == null || i == null) return buf
    val sv = s.asInstanceOf[Double]
    // NaN is skipped like NULL: Ordering[Double] totals NaN ABOVE
    // +Inf, so a single NaN score would otherwise permanently occupy
    // a top-k slot and evict genuine winners
    if (sv.isNaN) return buf
    buf += ((sv, i.asInstanceOf[Long]))
    if (buf.length >= 2 * k) prune(buf) else buf
  }

  override def merge(a: mutable.ArrayBuffer[(Double, Long)],
                     b: mutable.ArrayBuffer[(Double, Long)])
  : mutable.ArrayBuffer[(Double, Long)] = prune(a ++= b)

  override def eval(buf: mutable.ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sorted(best).take(k).map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: mutable.ArrayBuffer[(Double, Long)])
  : Array[Byte] = {
    val pruned = prune(buf)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(pruned.length)
    pruned.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
  : mutable.ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < n) { buf += ((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): TopKPairs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
  : TopKPairs = copy(score = l, id = r)
}
