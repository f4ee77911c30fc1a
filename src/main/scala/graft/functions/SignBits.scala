package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane sign signature (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002): bit `p` of the
  * LONG result is set iff `dot(vec, plane_p) > 0` (strict), planes
  * flattened row-major `planes[p·dim + i]`, `nPlanes ≤ 63`.
  *
  * Why not `when(array_dot(vec, litVec(h)) > 0, 1L<<p)` chains
  * (the pre-r11 form)? Those compile — ArrayDot is native — but a
  * 64-plane key becomes a WALL of generated code whose C2 compilation
  * alone cost 58 CPU-s for one query's plans at the ×100 leg; in a
  * 250-query suite JVM the accumulated compile queue starves later
  * queries into running interpreted for their whole lifetime (measured:
  * q_emb_neardup_lsh_prod 57.6 s on BOTH leg iterations vs ~5 s warm in
  * a fresh JVM — BASELINE §15.7). This expression is one short triple
  * loop over a `double[]` reference object: microseconds to JIT, and
  * the hyperplane literals never enter the generated source at all.
  *
  * Bit-identical to the composed form (pinned by SimilaritySpec
  * "native LSH keys ≡ composed"): dots accumulate left-to-right in
  * doubles, null vector elements read as 0.0 ([[ArrayDot]]
  * convention), a vector whose length differs from `dim` yields 0L
  * (every composed dot is null → no bit set), and a NaN dot SETS its
  * bit — Spark SQL's `>` orders NaN above every value, unlike Java's. A NULL input vector propagates null here;
  * call sites coalesce to the composed form's 0L.
  */
case class SignBits(child: Expression, nPlanes: Int, dim: Int,
                    planes: Array[Double])
    extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 63 && dim >= 1 &&
    planes.length == nPlanes * dim,
    s"sign_bits: planes length ${planes.length} != $nPlanes*$dim")

  override def prettyName: String = "lsh_sign_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sign_bits expects array<float|double>, got ${t.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    if (vec.numElements() != dim) 0L
    else {
      val isFloat = elemType == FloatType
      var bits = 0L
      var p = 0
      while (p < nPlanes) {
        val base = p * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          val x = if (vec.isNullAt(i)) 0.0
          else if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          acc += x * planes(base + i)
          i += 1
        }
        // Spark's `NaN > 0` is true (NaN is the largest double)
        if (acc > 0 || java.lang.Double.isNaN(acc)) bits |= 1L << p
        p += 1
      }
      bits
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "double[]")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val getElem =
        if (elemType == FloatType) s"(double) $vec.getFloat($i)"
        else s"$vec.getDouble($i)"
      s"""
         |long $bits = 0L;
         |if ($vec.numElements() == $dim) {
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    int $base = $p * $dim;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      double $x = $vec.isNullAt($i) ? 0.0 : $getElem;
         |      $acc += $x * $pl[$base + $i];
         |    }
         |    if ($acc > 0 || java.lang.Double.isNaN($acc)) $bits |= 1L << $p;
         |  }
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBitsFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  /** `vec → long` with bit p = strict-positive sign of
    * `dot(vec, planes(p))`; planes passed unflattened for call-site
    * convenience.
    */
  def sign_bits(vec: Column, planes: Seq[Array[Double]]): Column = {
    require(planes.nonEmpty, "sign_bits: no planes")
    val dim = planes.head.length
    require(planes.forall(_.length == dim), "sign_bits: ragged planes")
    val flat = new Array[Double](planes.length * dim)
    for (p <- planes.indices; i <- 0 until dim)
      flat(p * dim + i) = planes(p)(i)
    toCol(SignBits(toExpr(vec), planes.length, dim, flat))
  }
}
