package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency estimate against a serialized Count-Min sketch.
  *
  * Pairs with Spark's built-in `count_min_sketch(col, eps, conf, seed)`
  * aggregate: the sketch is built distributed (map-side partials merge
  * bitwise — one tiny reduce regardless of input size), and this
  * expression answers "how many times did `value` occur?" with the CMS
  * guarantee `true ≤ estimate ≤ true + ε·N` (w.p. `conf`). Together
  * with the Misra–Gries candidates ([[MisraGriesSketch]]) this is the
  * standard two-step heavy-hitter pipeline at 100 TB: MG proposes a
  * bounded candidate set in one pass, CMS refines each candidate's
  * count without ever materializing the full key→count map.
  *
  * The sketch argument must be FOLDABLE or a scalar subquery (same
  * contract as Spark's own `might_contain`): the few-KB sketch is
  * evaluated ONCE, deserialized lazily, and reused across rows — never
  * re-parsed per row. Value routing mirrors `CountMinSketchAgg.update`
  * exactly (strings/binary by bytes, integral types widened to long),
  * so estimates hit the same buckets the aggregate filled.
  *
  * Eval-only (`CodegenFallback`): the per-row work is a few hash
  * probes against a cached array — codegen would save nothing, and the
  * expression sits in a |candidates|-sized projection, not the scan
  * hot path.
  */
case class CmsEstimate(sketch: Expression, value: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = sketch
  override def right: Expression = value
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = {
    def foldableOrSubquery(e: Expression): Boolean =
      e.foldable || e.isInstanceOf[PlanExpression[_]] ||
        e.children.exists(_.isInstanceOf[PlanExpression[_]])
    if (sketch.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"sketch must be BINARY, got ${sketch.dataType.catalogString}")
    else if (!foldableOrSubquery(sketch))
      TypeCheckResult.TypeCheckFailure(
        "sketch must be a constant or scalar-subquery result (it is " +
          "deserialized once and cached, not re-parsed per row)")
    else value.dataType match {
      case StringType | BinaryType | ByteType | ShortType | IntegerType |
          LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"unsupported value type ${t.catalogString} (the count_min_sketch " +
          "aggregate only ingests integral/string/binary)")
    }
  }

  @transient private lazy val cms: CountMinSketch = {
    val bytes = sketch.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null else CountMinSketch.readFrom(bytes)
  }

  override def eval(input: InternalRow): Any = {
    if (cms == null) return null
    val v = value.eval(input)
    if (v == null) return null
    value.dataType match {
      case StringType => cms.estimateCount(v.asInstanceOf[UTF8String].getBytes)
      case BinaryType => cms.estimateCount(v.asInstanceOf[Array[Byte]])
      case ByteType => cms.estimateCount(v.asInstanceOf[Byte].toLong)
      case ShortType => cms.estimateCount(v.asInstanceOf[Short].toLong)
      case IntegerType => cms.estimateCount(v.asInstanceOf[Int].toLong)
      case LongType => cms.estimateCount(v.asInstanceOf[Long])
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, value = newRight)
}

object CmsFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  def cms_estimate(sketch: Column, value: Column): Column =
    toCol(CmsEstimate(toExpr(sketch), toExpr(value)))

  /** A one-row DataFrame as a scalar-subquery Column — the idiomatic way
    * to carry a distributed-built sketch (CMS, Bloom, HLL binary) into a
    * downstream plan without a cross join: the driver runs the tiny
    * aggregate once and injects the result as a literal.
    */
  def scalarSubquery(oneRow: org.apache.spark.sql.DataFrame): Column =
    toCol(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      org.apache.spark.sql.graftshim.PlanBridge.analyzed(oneRow)))
}
