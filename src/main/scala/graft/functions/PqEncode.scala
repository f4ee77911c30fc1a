package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** PQ encoding — per subspace, the index of the L2-nearest codebook
  * centroid (Jégou, Douze & Schmid, TPAMI 2011, §II.B) — as ONE native
  * codegen expression over the whole `m·ksub·dsub` codebook.
  *
  * Why not the composed form (`slice` + `transform(litSub, …)` +
  * `array_max` over structs)? Higher-order functions are
  * CodegenFallback: every row evaluates `m·ksub` interpreted lambda
  * calls, each allocating a sliced subvector, a boxed struct and an
  * ordering comparison — measured ~3 ms/row, which made the encode map
  * the entire cost of the PQ family at the ×100 leg (q_pq_assign
  * 639 CPU-s for 200 k rows; same rationale as [[PqAdc]] /
  * [[ArrayDot]]). This expression emits a tight primitive triple loop
  * inside whole-stage codegen and carries the codebook as one
  * flattened `double[]` reference object — no per-row allocation
  * beyond the m-int output.
  *
  * Distance semantics are BIT-IDENTICAL to the composed form (pinned
  * by SimilaritySpec "native encode ≡ composed encode"):
  *  - per-code distances accumulate left-to-right in doubles and
  *    compare as `-sqrt(Σd²)` maxima under Spark's total double order
  *    (`java.lang.Double.compare`: NaN largest, -0 < 0); ties take the
  *    SMALLER code — exactly `array_max` over `(nd, nc)` structs;
  *  - null vector elements read as 0.0 (the [[ArrayL2]] convention);
  *  - a subspace whose slice is short (vector shorter than
  *    `(s+1)·dsub`) yields code 0 — the composed form's `array_l2`
  *    length-mismatch → null distance → all-tie → smallest code.
  * A NULL input vector propagates null here (standard unary-expression
  * contract); [[graft.sim.ProductQuantizer.encode]] coalesces that to
  * the composed form's all-zero code row.
  *
  * The codebook rides along as a constructor value (driver-side model
  * state, `m·ksub·dsub` doubles ≈ KBs — the same contract as
  * [[graft.sim.ProductQuantizer.train]]'s return), flattened row-major
  * `cb[(s·ksub + c)·dsub + p]`.
  */
case class PqEncode(child: Expression, m: Int, ksub: Int, dsub: Int,
                    codebook: Array[Double])
    extends UnaryExpression {
  require(m >= 1 && ksub >= 1 && dsub >= 1 &&
    codebook.length == m * ksub * dsub,
    s"pq_encode: codebook length ${codebook.length} != $m*$ksub*$dsub")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${t.catalogString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val isFloat = elemType == FloatType
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      if (base + dsub <= n) {
        var bestNd = Double.NaN
        var best = 0
        var c = 0
        while (c < ksub) {
          val cb0 = (s * ksub + c) * dsub
          var acc = 0.0
          var p = 0
          while (p < dsub) {
            val i = base + p
            val x = if (vec.isNullAt(i)) 0.0
            else if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
            val d = x - codebook(cb0 + p)
            acc += d * d
            p += 1
          }
          val nd = -math.sqrt(acc)
          if (c == 0 || java.lang.Double.compare(nd, bestNd) > 0) {
            bestNd = nd; best = c
          }
          c += 1
        }
        out(s) = best
      } // else: short slice → composed form's null distance → code 0
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      val base = ctx.freshName("base")
      val cb0 = ctx.freshName("cb0")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val diff = ctx.freshName("diff")
      val nd = ctx.freshName("nd")
      val bestNd = ctx.freshName("bestNd")
      val best = ctx.freshName("best")
      val getElem =
        if (elemType == FloatType) s"(double) $vec.getFloat($base + $p)"
        else s"$vec.getDouble($base + $p)"
      s"""
         |int $n = $vec.numElements();
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $dsub;
         |  if ($base + $dsub <= $n) {
         |    double $bestNd = Double.NaN;
         |    int $best = 0;
         |    for (int $c = 0; $c < $ksub; $c++) {
         |      int $cb0 = ($s * $ksub + $c) * $dsub;
         |      double $acc = 0.0;
         |      for (int $p = 0; $p < $dsub; $p++) {
         |        double $x = $vec.isNullAt($base + $p) ? 0.0 : $getElem;
         |        double $diff = $x - $cb[$cb0 + $p];
         |        $acc += $diff * $diff;
         |      }
         |      double $nd = -java.lang.Math.sqrt($acc);
         |      if ($c == 0 || java.lang.Double.compare($nd, $bestNd) > 0) {
         |        $bestNd = $nd; $best = $c;
         |      }
         |    }
         |    $out[$s] = $best;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  /** `vec → array<int>` of per-subspace nearest-centroid codes under
    * the flattened row-major codebook.
    */
  def pq_encode(vec: Column, m: Int, ksub: Int, dsub: Int,
                codebook: Array[Double]): Column =
    toCol(PqEncode(toExpr(vec), m, ksub, dsub, codebook))
}
