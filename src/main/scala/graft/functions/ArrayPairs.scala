package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** UDTF-style table function: explode an array into its ordered pairs
  * of DISTINCT-VALUED elements — one row `(a, b)` per (x, y) with
  * `y != x`, both orientations, outer/inner in array order. This is
  * the basket → co-occurrence-pair hyperedge step
  * ([[graft.queries.AnalyticsQueries]] itemSim / basket /
  * assortativity: per-order part sets fan out to Σ basket² pair rows,
  * never |catalog|²).
  *
  * Replaces `explode(flatten(transform(parts, x →
  * transform(filter(parts, y → y != x), y → struct(x, y)))))`:
  * higher-order functions evaluate interpreted with boxed lambdas and
  * allocate the full k² struct ARRAY per basket before the explode —
  * measured ~4.3 k CPU-s across the three consumers at the ×100 leg,
  * the suite's largest remaining expression-shape cost (BASELINE
  * §16.3). The generator emits pairs one at a time in a primitive
  * loop; `GenerateExec` handles the fan-out, so CodegenFallback costs
  * nothing extra (same rationale as [[TokenShingles]]).
  *
  * Semantics match the composed form exactly (pinned in
  * AnalyticsSpec): NULL array → no rows; NULL elements produce no
  * pairs on either side (`y != x` is SQL-null → filtered; a null
  * outer never pairs); equal VALUES never pair (value inequality,
  * not position). Element types are restricted to integral/string —
  * value equality is unambiguous there (floats would diverge from
  * SQL on -0.0/NaN edges; the shipped consumers are all long keys).
  */
case class ArrayPairs(child: Expression)
    extends Generator with CodegenFallback {

  override def prettyName: String = "array_pairs"
  override def children: Seq[Expression] = Seq(child)

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("part_a", elemType, nullable = false),
    StructField("part_b", elemType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType |
                   StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<integral|string>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val t = elemType
    // extract non-null values once (array order preserved); nulls
    // never pair in the composed form
    val vals = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) vals += arr.get(i, t)
      i += 1
    }
    val m = vals.length
    if (m < 2) return Nil
    new Iterator[InternalRow] {
      private var oi = 0
      private var ij = 0
      private var nextRow: InternalRow = _
      advance()
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && oi < m) {
          if (ij >= m) { oi += 1; ij = 0 }
          else {
            if (ij != oi && vals(ij) != vals(oi)) {
              val r = new GenericInternalRow(2)
              r.update(0, vals(oi)); r.update(1, vals(ij))
              nextRow = r
            }
            ij += 1
          }
        }
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  override def terminate(): IterableOnce[InternalRow] = Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArrayPairs =
    copy(child = newChildren(0))
}

/** Canonical-orientation variant of [[ArrayPairs]]: one row per
  * position combination i < j with DIFFERING values, emitted as
  * `(min, max)` by value order — i.e. exactly
  * `array_pairs(xs).filter(part_a < part_b)` for EVERY input
  * (including duplicate values: a basket `[5,5,6]` emits `(5,6)`
  * twice either way), but generating and emitting HALF the rows.
  *
  * This is the r13 pair-pipeline optimization (guide §2.3 "shuffle
  * fewer bytes" applied to the basket family's dominant cost): the
  * co-occurrence relation is symmetric — `n(a,b) = n(b,a)` over set
  * baskets — so the k²-per-basket generation, the partial+final pair
  * aggregation, and the count probes can all run on the a<b half,
  * with the full relation reconstructed AFTER aggregation by a
  * 2-rows-per-row mirror explode (see AnalyticsQueries.mirrorPairs).
  * At the ×100 leg the pair stage was ~1.1 M run_ms per item-sim
  * query; every halved stage is linear in pair volume.
  *
  * Value order: numeric for integral types, binary (UTF8String) for
  * strings — identical to the SQL `<` the filter form uses under
  * UTF8_BINARY collation.
  */
case class ArrayCombinations(child: Expression)
    extends Generator with CodegenFallback {

  override def prettyName: String = "array_combinations"
  override def children: Seq[Expression] = Seq(child)

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("part_a", elemType, nullable = false),
    StructField("part_b", elemType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType |
                   StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<integral|string>, got ${t.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Nil
    val t = elemType
    val vals = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) vals += arr.get(i, t)
      i += 1
    }
    val m = vals.length
    if (m < 2) return Nil
    // Comparison keys are hoisted OUT of the k² loop: a per-pair
    // `(Any, Any)` pattern match costs a Tuple2 allocation plus
    // megamorphic dispatch per candidate pair, which measured ~4× the
    // whole ArrayPairs emission cost (r13 A/B: q_basket run_ms
    // 3.4 s → 14.5 s at close with the naive spelling). With a
    // primitive long[] (integrals) / UTF8String[] (strings) built once
    // per basket, the inner loop is an array load + primitive compare,
    // the same cost profile as [[ArrayPairs]] at half the rows.
    val isStr = t.isInstanceOf[StringType]
    val longKeys: Array[Long] =
      if (isStr) null
      else {
        val a = new Array[Long](m)
        var j = 0
        while (j < m) {
          a(j) = vals(j).asInstanceOf[java.lang.Number].longValue(); j += 1
        }
        a
      }
    val strKeys: Array[org.apache.spark.unsafe.types.UTF8String] =
      if (!isStr) null
      else {
        val a = new Array[org.apache.spark.unsafe.types.UTF8String](m)
        var j = 0
        while (j < m) {
          a(j) = vals(j)
            .asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          j += 1
        }
        a
      }
    new Iterator[InternalRow] {
      private var oi = 0
      private var ij = 1
      private var nextRow: InternalRow = _
      advance()
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && oi < m - 1) {
          if (ij >= m) { oi += 1; ij = oi + 1 }
          else {
            val cmp =
              if (isStr) strKeys(oi).compareTo(strKeys(ij))
              else java.lang.Long.compare(longKeys(oi), longKeys(ij))
            if (cmp != 0) {
              val r = new GenericInternalRow(2)
              if (cmp < 0) { r.update(0, vals(oi)); r.update(1, vals(ij)) }
              else { r.update(0, vals(ij)); r.update(1, vals(oi)) }
              nextRow = r
            }
            ij += 1
          }
        }
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  override def terminate(): IterableOnce[InternalRow] = Nil

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ArrayCombinations =
    copy(child = newChildren(0))
}

object ArrayPairsFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  /** `df.select(array_pairs($"parts"))` → rows `(part_a, part_b)`. */
  def array_pairs(arr: Column): Column = toCol(ArrayPairs(toExpr(arr)))

  /** `df.select(array_combinations($"parts"))` → the `part_a < part_b`
    * half of [[array_pairs]], one row per position combination.
    */
  def array_combinations(arr: Column): Column =
    toCol(ArrayCombinations(toExpr(arr)))
}
