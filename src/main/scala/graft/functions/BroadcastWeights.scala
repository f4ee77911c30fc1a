package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Index into a BROADCAST `Array[Long]` — the model-weights access
  * path for dimensions where a plan literal degrades.
  *
  * Why this exists (measured, ScaleProbe `quality` section, VERDICT
  * r8 #5): a 2²⁰-long weight vector as a `typedLit` array literal
  * works — codegen survives (the array is literal DATA, one object
  * reference, never per-element generated code) — but the literal
  * rides the serialized plan/task binary, costing a measured ~6 s of
  * FIXED per-job overhead at D=2²⁰ (corpus-size-independent: x1 and
  * x16 legs pay the same) plus a 7.7 MB plan string. Wrapping the
  * array in a `SparkContext.broadcast` instead ships a handle in the
  * task binary and moves the 8 MB once per EXECUTOR (TorrentBroadcast
  * — exactly how a 1000-executor cluster wants an 8 MB model
  * distributed), with the generated code reading a primitive
  * `long[]` resolved once per generated-class instance.
  *
  * Semantics: `bc.value(child)` — child is a 0-based int index the
  * caller guarantees in-bounds (the quality model feeds
  * `pmod(hash, D)`, always in [0, D)). Null child → null. Interpreted
  * and codegen paths read the identical array, so results are
  * bit-identical to the literal `element_at` form (TextSpec pins the
  * equality against [[graft.text.QualityModel.scoreDocs]]).
  */
case class BroadcastLongArrayGet(bc: Broadcast[Array[Long]],
                                 child: Expression)
  extends UnaryExpression {
  override def prettyName: String = "broadcast_weights_get"
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an int index, got ${child.dataType}")

  override def nullSafeEval(i: Any): Any = bc.value(i.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // the Broadcast handle goes into the references array (tiny); the
    // resolved primitive long[] is cached in a mutable field, fetched
    // once per generated-class instance (executor-side, post-ship)
    val bcRef = ctx.addReferenceObj("bcWeights", bc,
      classOf[Broadcast[_]].getName)
    val arr = ctx.addMutableState("long[]", "bcWeightsArr",
      v => s"$v = (long[]) $bcRef.value();")
    defineCodeGen(ctx, ev, i => s"$arr[$i]")
  }

  // the broadcast handle must not be printed into plan strings (a
  // 2^20 array would put us right back at the 7.7 MB toString)
  override def toString: String =
    s"broadcast_weights_get(${bc.id}, $child)"

  override protected def withNewChildInternal(newChild: Expression)
  : BroadcastLongArrayGet = copy(child = newChild)
}

object BroadcastWeights {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  /** `weights(idx)` against a broadcast handle. */
  def broadcast_weights_get(bc: Broadcast[Array[Long]],
                            idx: Column): Column =
    toCol(BroadcastLongArrayGet(bc, toExpr(idx)))
}
