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

/** Accent/diacritic fold of a string column: canonical decomposition
  * (NFD), then every combining mark dropped — `é`/`e`+U+0301 both
  * become `e`, `señor` → `senor`. The accent-stripping half of the
  * reference's column normalization recipe
  * (/root/reference/etl/extract.py:107-114: NFKD → ascii-ignore →
  * lower), factored out as the index/query analyzer fold of
  * [[graft.ops.Analyzer.Unicode]].
  *
  * Why a custom expression (same reasoning as [[NfcNormalize]]):
  * Spark ships no fold, a UDF would box every row, and the analyzer
  * sits on the index-build hot path. The generated code calls the
  * static kernel; pure-ASCII input (the 100 TB common case) returns
  * the input UTF8String untouched — `numBytes == numChars` is the
  * zero-allocation ASCII test.
  *
  * Cross-engine contract: DuckDB's `strip_accents` (utf8proc
  * STRIPMARK) removes the same combining-mark categories after the
  * same canonical decomposition; outputs can differ only in NFC/NFD
  * composition of characters that remain NON-alphanumeric — which
  * the analyzer's `[^a-z0-9]+` tokenizer treats as separators on
  * both engines, so token streams are identical by construction
  * (q203's oracle pins it end-to-end).
  */
case class AccentFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "accent_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"accent_fold requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    AccentFold.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AccentFold.fold($a);")

  override protected def withNewChildInternal(newChild: Expression): AccentFold =
    copy(child = newChild)
}

/** The full Unicode-analyzer tokenization as ONE single-pass codegen
  * expression: accent fold ([[AccentFold]]) → lowercase (the same
  * UTF8String op Spark's `lower` uses) → split on runs of
  * non-`[a-z0-9]` → drop empties — byte-for-byte the composed
  * `filter(split(lower(accent_fold(text)), "[^a-z0-9]+"), …)` chain,
  * WITHOUT the regex engine, the intermediate token array, or the
  * higher-order filter (a run-scanner over the lowered string IS the
  * `[^a-z0-9]+` split by definition). This is the index-build hot
  * path: the composed chain measurably regressed every per-pass
  * index-build bench gate (~+25% on q157/q160/q164/q167/q173/q179 at
  * sf0.1) and this expression is what restored them. The kernel is
  * shared with the driver-side query analyzer
  * ([[graft.ops.Analyzer.foldSplit]]) so index-side and query-side
  * analysis cannot diverge.
  */
case class AnalyzeTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "analyze_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"analyze_tokens requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    AnalyzeTokens.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AnalyzeTokens.tokens($a);")

  override protected def withNewChildInternal(newChild: Expression): AnalyzeTokens =
    copy(child = newChild)
}

object AnalyzeTokens {
  /** Static kernel shared by eval, codegen and the driver-side query
    * analyzer. Exactly lower(fold(s)) split on non-[a-z0-9] runs,
    * empties dropped.
    */
  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = AccentFold.fold(s).toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    var start = -1
    while (i < str.length) {
      val c = str.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        out += UTF8String.fromString(str.substring(start, i))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out += UTF8String.fromString(str.substring(start))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Column-API entry point for [[AnalyzeTokens]]. */
  def analyzeTokens(c: Column): Column =
    graftbridge.column(AnalyzeTokens(graftbridge.expression(c)))
}

object AccentFold {
  private def isMark(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
      t == Character.ENCLOSING_MARK
  }

  /** Static kernel shared by eval, codegen, and the driver-side query
    * analyzer ([[graft.ops.Analyzer.Unicode]] — index side and query
    * side MUST share this exact function or folded queries would miss
    * folded postings).
    */
  def fold(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // pure ASCII: nothing to fold
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (!isMark(c)) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column-API entry point for [[AccentFold]]. */
  def accentFold(c: Column): Column =
    graftbridge.column(AccentFold(graftbridge.expression(c)))
}
