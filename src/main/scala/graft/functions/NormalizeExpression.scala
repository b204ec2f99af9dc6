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
  * (NFD), every combining mark dropped, then canonical RE-composition
  * (NFC) — `é`/`e`+U+0301 both become `e`, `señor` → `senor`, and
  * scripts whose NFD explodes into base letters come back whole
  * (Hangul syllables decompose into Jamo; without the recompose a
  * folded `한` would be three Jamo code points while DuckDB's
  * utf8proc-based `strip_accents` returns the recomposed syllable —
  * verified divergence, now pinned equal). Japanese dakuten/handakuten
  * are combining marks under NFD, so `が` folds to `か` — exactly what
  * utf8proc STRIPMARK and Lucene's ICUFoldingFilter do; the conflation
  * is the standard fold trade-off. The accent-stripping half of the
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
  * STRIPMARK) removes the same combining-mark categories and
  * recomposes, so fold outputs are byte-identical across engines
  * (q203/q207 oracles pin it end-to-end).
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
  * UTF8String op Spark's `lower` uses) → a script-aware run scanner —
  * WITHOUT the regex engine, an intermediate token array, or a
  * higher-order filter. This is the index-build hot path: the
  * composed expression chain measurably regressed every per-pass
  * index-build bench gate (~+25% on q157/q160/q164/q167/q173/q179 at
  * sf0.1) and this expression is what restored them. The kernel is
  * shared with the driver-side query analyzer
  * ([[graft.ops.Analyzer.foldSplit]]) so index-side and query-side
  * analysis cannot diverge.
  *
  * Token alphabet (round 13 — the original `[a-z0-9]`-only alphabet
  * silently destroyed every non-Latin script):
  *  - NON-CJK: maximal runs of Unicode letters/digits
  *    (`Character.isLetterOrDigit` over code points — `\p{L}\p{Nd}`
  *    in RE2 terms) become one token each; everything else separates.
  *    Cyrillic, Greek, Arabic, Hebrew, accented Latin all tokenize.
  *    The Greek final sigma lowercases to the medial form (ς → σ, the
  *    Lucene GreekLowerCaseFilter rule) — Java's full case mapping is
  *    position-sensitive while utf8proc's is not, and the σ-everywhere
  *    form is what makes index-side ≡ oracle-side byte-exact.
  *  - CJK (Han, Hiragana, Katakana, Hangul scripts): space-less
  *    scripts can't word-tokenize by separator, so a maximal
  *    same-class run emits OVERLAPPING CHARACTER BIGRAMS — `東京都` →
  *    `東京`, `京都` — the Lucene CJKAnalyzer strategy (a lone CJK
  *    char emits itself). Bigrams occupy consecutive positions, so
  *    phrase/proximity semantics carry over unchanged.
  *  - ASCII stays on a branch-predictable fast path (the 100 TB
  *    common case): for pure-ASCII text the output is byte-identical
  *    to the pre-round-13 `[^a-z0-9]+` split, which is what keeps
  *    every existing ASCII fixture and oracle unchanged. Indexes
  *    recorded as `unicode` whose corpus carried non-ASCII text were
  *    EMPTY-analyzed before this round (zero postings) — they need a
  *    rebuild, not a compat shim.
  *
  * Cross-engine: DuckDB replays the exact stream as non-CJK split on
  * `[^\p{L}\p{Nd}]+` (CJK runs blanked first) + per-run bigram
  * emission via `range()`/`substr` — q207's oracle pins it end-to-end.
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

  import Character.UnicodeScript

  /** The bigram-emitting script class (see the class doc): the four
    * space-less-or-mixed CJK scripts Lucene's CJKAnalyzer bigrams.
    * Only consulted for code points ≥ 128 — ASCII never pays the
    * script lookup.
    */
  private def isCjk(cp: Int): Boolean = {
    val sc = UnicodeScript.of(cp)
    sc == UnicodeScript.HAN || sc == UnicodeScript.HIRAGANA ||
      sc == UnicodeScript.KATAKANA || sc == UnicodeScript.HANGUL
  }

  /** Static kernel shared by eval, codegen and the driver-side query
    * analyzer: lower(fold(s)), then non-CJK letter/digit runs as
    * whole tokens (final sigma normalized medial) and CJK runs as
    * overlapping character bigrams. One pass, code-point iteration
    * (supplementary-plane Han is two chars).
    */
  def tokens(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = AccentFold.fold(s).toLowerCase.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = -1    // pending non-CJK letter/digit run start
    var cjkStart = -1 // pending CJK run start
    def emitWord(end: Int): Unit = if (start >= 0) {
      // ς → σ: Java lowercases a word-final sigma to the final form,
      // utf8proc to the medial — normalize to medial (the Lucene
      // GreekLowerCaseFilter rule; String.replace returns `this`
      // unchanged when the char is absent, so non-Greek pays nothing)
      out += UTF8String.fromString(
        str.substring(start, end).replace('ς', 'σ'))
      start = -1
    }
    def emitCjk(end: Int): Unit = if (cjkStart >= 0) {
      val run = str.substring(cjkStart, end)
      // code-point boundaries of the run
      val bounds = scala.collection.mutable.ArrayBuffer[Int](0)
      var p = 0
      while (p < run.length) {
        p = run.offsetByCodePoints(p, 1)
        bounds += p
      }
      val n = bounds.length - 1
      if (n == 1) out += UTF8String.fromString(run)
      else {
        var j = 0
        while (j < n - 1) {
          out += UTF8String.fromString(run.substring(bounds(j), bounds(j + 2)))
          j += 1
        }
      }
      cjkStart = -1
    }
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c < 128) { // ASCII fast path — plain char, no code-point
        // machinery, no script lookup (the 100 TB common case)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          emitCjk(i)
          if (start < 0) start = i
        } else { emitWord(i); emitCjk(i) }
        i += 1
      } else {
        val cp = str.codePointAt(i)
        if (isCjk(cp)) {
          emitWord(i)
          if (cjkStart < 0) cjkStart = i
        } else if (Character.isLetterOrDigit(cp)) {
          emitCjk(i)
          if (start < 0) start = i
        } else { emitWord(i); emitCjk(i) }
        i += Character.charCount(cp)
      }
    }
    emitWord(str.length)
    emitCjk(str.length)
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
    // recompose (NFC): Hangul must come back from its Jamo
    // decomposition — utf8proc's strip_accents recomposes, and the
    // cross-engine fold contract is byte-identity (see the class doc)
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  /** Column-API entry point for [[AccentFold]]. */
  def accentFold(c: Column): Column =
    graftbridge.column(AccentFold(graftbridge.expression(c)))
}
