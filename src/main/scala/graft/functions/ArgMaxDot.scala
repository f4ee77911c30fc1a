package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment `(vec, cents) → id of the centroid with
  * the max dot product` — the IVF/k-means cell argmax
  * ([[graft.sim.Similarity.assignCells]]) as ONE native loop.
  *
  * `cents` is `array<struct<id: integral, unit: array<double>>>` BY
  * POSITION (field 0 = id, field 1 = centroid vector) — the aggregated
  * broadcast centroid array, an ordinary COLUMN (model state built on
  * the cluster, never collected to the driver), which is why this is a
  * BinaryExpression over both children rather than a constructor
  * literal like [[PqEncode]].
  *
  * Replaces `array_max(transform(cents, c → struct(dot, -id)))`:
  * higher-order functions are CodegenFallback, so every row paid k
  * interpreted lambda calls with boxed structs plus an interpreted
  * struct ordering — the same per-row tax measured on the PQ encode
  * map (BASELINE §15.7). Bit-identical semantics, pinned by
  * SimilaritySpec "native assignCells ≡ composed":
  *  - dot accumulates left-to-right in doubles, null elements as 0
  *    (the [[ArrayDot]] convention);
  *  - a null/length-mismatched vector (or null centroid unit) gives a
  *    NULL dot, which sorts BELOW every number; NaN sorts ABOVE
  *    everything (Spark's total double order);
  *  - ties on the dot take the SMALLER id (the composed `-id` max);
  *  - an empty or null `cents` array — and a winner with a null id —
  *    return NULL (callers coalesce to the -1 sentinel);
  *  - a NULL vec still assigns (all dots null → all tie → smallest
  *    id), exactly like the composed form.
  */
case class ArgMaxDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "argmax_dot"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def centsType: DataType = right.dataType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      centsType) match {
    case (ArrayType(FloatType | DoubleType, _),
          ArrayType(StructType(Array(idF, unitF)), _))
        if (idF.dataType match {
              case ByteType | ShortType | IntegerType | LongType => true
              case _ => false
            }) &&
          (unitF.dataType match {
              case ArrayType(DoubleType | FloatType, _) => true
              case _ => false
            }) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"argmax_dot expects (array<float|double> vec, " +
        s"array<struct<id: integral, unit: array<double|float>>> cents), " +
        s"got ${l.catalogString} / ${r.catalogString}")
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def idType: DataType = centsType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].fields(0).dataType
  private def unitIsFloat: Boolean = centsType.asInstanceOf[ArrayType]
    .elementType.asInstanceOf[StructType].fields(1).dataType
    .asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val centsV = right.eval(input)
    if (centsV == null) return null
    val cents = centsV.asInstanceOf[ArrayData]
    val n = cents.numElements()
    if (n == 0) return null
    val vecV = left.eval(input)
    val vec = if (vecV == null) null else vecV.asInstanceOf[ArrayData]
    var any = false
    var bestSimNull = true; var bestSim = 0.0
    var bestIdNull = true; var bestId = 0L
    var k = 0
    while (k < n) {
      var simNull = true; var sim = 0.0
      var idNull = true; var id = 0L
      if (!cents.isNullAt(k)) {
        val st = cents.getStruct(k, 2)
        if (!st.isNullAt(0)) {
          idNull = false
          id = idType match {
            case ByteType => st.getByte(0).toLong
            case ShortType => st.getShort(0).toLong
            case IntegerType => st.getInt(0).toLong
            case _ => st.getLong(0)
          }
        }
        if (vec != null && !st.isNullAt(1)) {
          val unit = st.getArray(1)
          val d = unit.numElements()
          if (d == vec.numElements()) {
            simNull = false
            var acc = 0.0
            var i = 0
            while (i < d) {
              val u = if (unit.isNullAt(i)) 0.0
              else if (unitIsFloat) unit.getFloat(i).toDouble
              else unit.getDouble(i)
              val x = if (vec.isNullAt(i)) 0.0
              else if (vecIsFloat) vec.getFloat(i).toDouble
              else vec.getDouble(i)
              acc += u * x
              i += 1
            }
            sim = acc
          }
        }
      }
      // candidate beats best under max-(sim, -id) with Spark's total
      // order: null sim lowest, NaN highest; sim ties → smaller id,
      // null id losing ties (null -id is lowest)
      val beats =
        if (!any) true
        else {
          val simCmp =
            if (simNull && bestSimNull) 0
            else if (simNull) -1
            else if (bestSimNull) 1
            else java.lang.Double.compare(sim, bestSim)
          if (simCmp != 0) simCmp > 0
          else if (idNull) false
          else bestIdNull || id < bestId
        }
      if (beats) {
        any = true
        bestSimNull = simNull; bestSim = sim
        bestIdNull = idNull; bestId = id
      }
      k += 1
    }
    if (bestIdNull) null else bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsGen = right.genCode(ctx)
    val vecGen = left.genCode(ctx)
    val cents = centsGen.value
    val vec = vecGen.value
    val n = ctx.freshName("n")
    val k = ctx.freshName("k")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    val st = ctx.freshName("st")
    val unit = ctx.freshName("unit")
    val acc = ctx.freshName("acc")
    val u = ctx.freshName("u")
    val x = ctx.freshName("x")
    val any = ctx.freshName("any")
    val simNull = ctx.freshName("simNull")
    val sim = ctx.freshName("sim")
    val idNull = ctx.freshName("idNull")
    val id = ctx.freshName("id")
    val bestSimNull = ctx.freshName("bestSimNull")
    val bestSim = ctx.freshName("bestSim")
    val bestIdNull = ctx.freshName("bestIdNull")
    val bestId = ctx.freshName("bestId")
    val simCmp = ctx.freshName("simCmp")
    val beats = ctx.freshName("beats")
    val getId = idType match {
      case ByteType => s"(long) $st.getByte(0)"
      case ShortType => s"(long) $st.getShort(0)"
      case IntegerType => s"(long) $st.getInt(0)"
      case _ => s"$st.getLong(0)"
    }
    val getU =
      if (unitIsFloat) s"(double) $unit.getFloat($i)" else s"$unit.getDouble($i)"
    val getX =
      if (vecIsFloat) s"(double) $vec.getFloat($i)" else s"$vec.getDouble($i)"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(code =
      code"""
         |${centsGen.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = 0L;
         |if (!${centsGen.isNull} && $cents.numElements() > 0) {
         |  ${vecGen.code}
         |  int $n = $cents.numElements();
         |  boolean $any = false;
         |  boolean $bestSimNull = true; double $bestSim = 0.0;
         |  boolean $bestIdNull = true; long $bestId = 0L;
         |  for (int $k = 0; $k < $n; $k++) {
         |    boolean $simNull = true; double $sim = 0.0;
         |    boolean $idNull = true; long $id = 0L;
         |    if (!$cents.isNullAt($k)) {
         |      InternalRow $st = $cents.getStruct($k, 2);
         |      if (!$st.isNullAt(0)) { $idNull = false; $id = $getId; }
         |      if (!${vecGen.isNull} && !$st.isNullAt(1)) {
         |        ArrayData $unit = $st.getArray(1);
         |        int $d = $unit.numElements();
         |        if ($d == $vec.numElements()) {
         |          $simNull = false;
         |          double $acc = 0.0;
         |          for (int $i = 0; $i < $d; $i++) {
         |            double $u = $unit.isNullAt($i) ? 0.0 : $getU;
         |            double $x = $vec.isNullAt($i) ? 0.0 : $getX;
         |            $acc += $u * $x;
         |          }
         |          $sim = $acc;
         |        }
         |      }
         |    }
         |    boolean $beats;
         |    if (!$any) { $beats = true; }
         |    else {
         |      int $simCmp = ($simNull && $bestSimNull) ? 0
         |        : $simNull ? -1 : $bestSimNull ? 1
         |        : java.lang.Double.compare($sim, $bestSim);
         |      if ($simCmp != 0) $beats = $simCmp > 0;
         |      else if ($idNull) $beats = false;
         |      else $beats = $bestIdNull || $id < $bestId;
         |    }
         |    if ($beats) {
         |      $any = true;
         |      $bestSimNull = $simNull; $bestSim = $sim;
         |      $bestIdNull = $idNull; $bestId = $id;
         |    }
         |  }
         |  if (!$bestIdNull) { ${ev.isNull} = false; ${ev.value} = $bestId; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArgMaxDotFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge.{column => toCol, expression => toExpr}

  /** `(vec, cents) → id` of the max-dot centroid; null on empty/null
    * cents (callers coalesce to their sentinel).
    */
  def argmax_dot(vec: Column, cents: Column): Column =
    toCol(ArgMaxDot(toExpr(vec), toExpr(cents)))
}
