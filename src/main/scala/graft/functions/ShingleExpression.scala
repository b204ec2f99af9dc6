package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a token array: for n tokens, the
  * space-joined windows t[i..i+k-1] for i in [0, n-k], de-duplicated
  * preserving first occurrence; fewer than k tokens → empty array.
  *
  * Matches `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * ...)))` exactly (UTF8String.concatWs IS concat_ws, first-occurrence
  * order IS array_distinct's), but runs as one compiled loop per row.
  * The HOF chain walks an interpreted expression tree per window and
  * allocates per element — it was the dominant per-document cost of all
  * three near-dup queries at bench scale. CodegenFallback is deliberate:
  * the work is string concatenation, so the win is the compiled loop,
  * not expression codegen.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got $t")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val seen = new LinkedHashSet[UTF8String]((n - k + 1) * 2)
    i = 0
    while (i <= n - k) {
      // concatWs allocates fresh bytes and skips nulls — concat_ws semantics
      val window = new Array[UTF8String](k)
      var j = 0
      while (j < k) { window(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleExpression {
  /** Column-API entry point for [[WordShingles]]. */
  def wordShingles(tokens: Column, k: Int = 3): Column =
    graftbridge.column(WordShingles(graftbridge.expression(tokens), k))
}
