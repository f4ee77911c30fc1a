package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array (Charikar, STOC 2002):
  * per token XXH64(utf8 bytes, `seed`) — the SAME hash Spark's
  * `xxhash64()` computes, via the same `XXH64.hashUTF8String` static —
  * then per-bit majority `2·count(bit) > n` folded into the signature.
  *
  * Why a custom Expression (SURVEY.md §7.4, same rationale as
  * [[ArrayDot]]): the composed form — `aggregate` carrying a 64-slot
  * struct accumulator over `zip_with`/`transform` lambdas — runs
  * INTERPRETED with boxed longs, O(64) Catalyst evaluations per token.
  * This expression is two tight primitive loops (tokens × 64 bit
  * tests on a stack `int[64]`), emitted inline by `doGenCode` so the
  * streaming ingest projection ([[graft.dedup.Dedup.simhashRow]] →
  * `Streams.nearDupBands`) stays inside whole-stage codegen. The
  * interpreted `nullSafeEval` runs the identical integer loop, so
  * results are bit-identical either way — and bit-identical to the
  * explode/groupBy batch pipeline ([[graft.dedup.Dedup.simhash]]),
  * which DedupSpec pins on real data.
  *
  * Null handling matches the composed form exactly: NULL array → NULL
  * (callers coalesce to 0), a NULL token hashes to `seed` (what
  * `xxhash64(null)` yields), and the majority denominator counts ALL
  * elements.
  */
case class SimHash64(child: Expression, seed: Long = 42L)
  extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.SimHash64.compute($a, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object SimHash64 {
  /** Column wrapper (`ColumnBridge` — Spark 4 removed `Column.expr`
    * from the public surface).
    */
  def asColumn(tokens: org.apache.spark.sql.Column,
               seed: Long = 42L): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens), seed))
  }

  /** The shared primitive kernel (interpreted eval AND generated code
    * call this — one definition, zero drift). Public + JVM-static
    * (object method, `@JvmStatic`-like via the Java-visible forwarder
    * Scala emits for object methods on a class-companion pair) so the
    * codegen'd Java can invoke it directly.
    */
  def compute(arr: ArrayData, seed: Long): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) seed
        else org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUTF8String(arr.getUTF8String(i), seed)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (2L * counts(j) > n) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
