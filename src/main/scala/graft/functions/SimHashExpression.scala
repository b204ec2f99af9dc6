package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** 32-bit SimHash fingerprint of an array of feature hashes (bigint):
  * bit p of the result is set iff more than half of the hashes have bit
  * p set (strict majority — ties round down, matching the SQL oracle's
  * `ones * 2 > n`).
  *
  * Why a custom expression: the HOF formulation folds a 33-slot
  * accumulator array per feature hash (`aggregate` + `zip_with`), which
  * is evaluated interpreted and allocates a fresh array per fold step —
  * ~9M lambda invocations at bench scale. This is a primitive nested
  * loop inside whole-stage codegen.
  *
  * Null semantics: null array → null; null element → null (mirrors the
  * HOF fold where a null propagates through the accumulator).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = arr.getLong(i)
      var p = 0
      while (p < 32) {
        counts(p) += ((h >>> p) & 1L).toInt
        p += 1
      }
      i += 1
    }
    var fp = 0L
    var p = 0
    while (p < 32) {
      if (counts(p) * 2 > n) fp |= (1L << p)
      p += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
        int $n = $a.numElements();
        int[] $counts = new int[32];
        for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
          if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
          long $h = $a.getLong($i);
          for (int $p = 0; $p < 32; $p++) {
            $counts[$p] += (int) (($h >>> $p) & 1L);
          }
        }
        if (!${ev.isNull}) {
          long $fp = 0L;
          for (int $p = 0; $p < 32; $p++) {
            if ($counts[$p] * 2 > $n) $fp |= (1L << $p);
          }
          ${ev.value} = $fp;
        }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHashExpression {
  /** Column-API entry point for [[SimHash32]]. */
  def simhash32(hashes: Column): Column =
    graftbridge.column(SimHash32(graftbridge.expression(hashes)))
}
