package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance-computation (ADC) lookup for product
  * quantization (Jégou, Douze & Schmid, "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 33(1), 2011, §IV.A): given a
  * document's PQ code array (one centroid index per subspace) and a
  * query's precomputed lookup table (per-subspace inner products /
  * distances against every centroid, flattened row-major
  * `lut[sub * ksub + code]`), the document's score is
  * `Σ_sub lut[sub*ksub + codes[sub]]` — m array reads instead of a
  * d-dimensional float dot product.
  *
  * This is the PQ hot loop: it runs once per (query, candidate) pair
  * over the whole corpus, so it is a native codegen expression (a
  * tight primitive loop inside whole-stage codegen), not an
  * interpreted `transform`/`aggregate` lambda — same rationale as
  * [[ArrayDot]]. `ksub` is inferred as `lut.length / codes.length`.
  *
  * Null on: null inputs, a lut length that is not a multiple of the
  * code length, an out-of-range code, or a null element (a corrupt
  * code must poison the score, not silently skip a subspace).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(ByteType | ShortType | IntegerType, _),
          ArrayType(DoubleType | FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<int> codes, array<double> lut), got " +
        s"${l.catalogString} / ${r.catalogString}")
  }

  private def codeType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  private def lutType: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val lutLen = lut.numElements()
    if (m == 0 || lutLen % m != 0) return null
    val ksub = lutLen / m
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codeType match {
        case ByteType => codes.getByte(i).toInt
        case ShortType => codes.getShort(i).toInt
        case _ => codes.getInt(i)
      }
      if (c < 0 || c >= ksub) return null
      val j = i * ksub + c
      if (lut.isNullAt(j)) return null
      acc += (lutType match {
        case FloatType => lut.getFloat(j).toDouble
        case _ => lut.getDouble(j)
      })
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val getCode = codeType match {
        case ByteType => s"(int) $codes.getByte($i)"
        case ShortType => s"(int) $codes.getShort($i)"
        case _ => s"$codes.getInt($i)"
      }
      val getLut = lutType match {
        case FloatType => s"(double) $lut.getFloat($j)"
        case _ => s"$lut.getDouble($j)"
      }
      s"""
         |int $m = $codes.numElements();
         |if ($m == 0 || $lut.numElements() % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ksub = $lut.numElements() / $m;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    if ($codes.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    int $c = $getCode;
         |    if ($c < 0 || $c >= $ksub) { ${ev.isNull} = true; break; }
         |    int $j = $i * $ksub + $c;
         |    if ($lut.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    $acc += $getLut;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  def pq_adc(codes: Column, lut: Column): Column =
    toCol(PqAdc(toExpr(codes), toExpr(lut)))
}
