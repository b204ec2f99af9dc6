package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column — the canonical-
  * composition step of LLM-corpus text cleaning (decomposed
  * `e` + U+0301 and composed `é` must hash/dedup/shingle identically,
  * and tokenizers see one code point, not two).
  *
  * Why a custom expression: Spark ships no normalization function at
  * all, and a Scala UDF would box every row through a serializer.
  * This stays inside whole-stage codegen; the generated code calls
  * [[NfcNormalize.normalize]], which short-circuits on the
  * already-normalized fast path (`Normalizer.isNormalized` is a scan,
  * not an allocation — for ASCII/NFC corpora, the common case at
  * 100 TB, the input UTF8String is returned untouched, zero copies).
  *
  * Cross-engine contract: java.text.Normalizer and DuckDB's utf8proc
  * both implement Unicode canonical composition (UAX #15), so the
  * q133 oracle compares byte-identical outputs via `nfc_normalize`.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($a);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and codegen. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point for [[NfcNormalize]]. */
  def nfcNormalize(c: Column): Column =
    graftbridge.column(NfcNormalize(graftbridge.expression(c)))
}
