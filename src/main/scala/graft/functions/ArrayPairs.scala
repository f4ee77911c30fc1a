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

object ArrayPairsFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  /** `df.select(array_pairs($"parts"))` → rows `(part_a, part_b)`. */
  def array_pairs(arr: Column): Column = toCol(ArrayPairs(toExpr(arr)))
}
