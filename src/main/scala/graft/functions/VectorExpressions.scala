package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two equal-length float/double array
  * columns, returning DOUBLE.
  *
  * Why a custom expression instead of
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`: the higher-order
  * functions are evaluated interpreted (no codegen) and allocate a boxed
  * intermediate array per row-pair. On an all-pairs similarity join that
  * is millions of evaluations — the interpreted form measured 29 s for
  * 2M pairs × 64 dims where this expression runs inside whole-stage
  * codegen as a primitive loop.
  *
  * Semantics (kept bit-identical to the HOF form so DuckDB oracles
  * agree): elements cast to double, products accumulated strictly
  * left-to-right starting from 0.0; null array, mismatched lengths, or
  * any null element → null.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<float> or two array<double> inputs, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val isFloat = elemType == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc +=
        (if (isFloat) x.getFloat(i).toDouble * y.getFloat(i).toDouble
         else x.getDouble(i) * y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column-API entry point for [[VecDot]]. */
  def vecDot(a: Column, b: Column): Column =
    graftbridge.column(
      VecDot(graftbridge.expression(a), graftbridge.expression(b)))

  /** L2 norm via the codegen'd dot product. */
  def vecNorm(a: Column): Column = org.apache.spark.sql.functions.sqrt(vecDot(a, a))
}
