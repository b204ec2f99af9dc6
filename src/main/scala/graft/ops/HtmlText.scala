package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction — the step every crawl-derived
  * corpus runs before any quality/dedup work (C4 strips pages to
  * text; RefinedWeb's `trafilatura` stage does the same job). This is
  * the regex-core of that extraction: drop non-content BLOCKS whole
  * (script/style payloads are code, nav/header/footer/aside are
  * boilerplate chrome), strip the remaining markup, unescape the
  * five ubiquitous entities, and normalize whitespace.
  *
  * Scale design (100 TB): every step is `regexp_replace`/`replace`
  * inside whole-stage codegen — zero shuffles, embarrassingly
  * parallel, no DOM is ever materialized (a DOM parse per page is
  * the classic extraction bottleneck; the block-regex form is what
  * C4's original pipeline used). All patterns are RE2-compatible so
  * the DuckDB oracle applies the IDENTICAL regexes: non-greedy
  * `.*?` + inline `(?s)`, no backreferences, no lookaround.
  */
object HtmlText {

  /** Tags whose entire CONTENT is dropped, not just the markup. */
  val blockTags: Seq[String] =
    Seq("script", "style", "nav", "header", "footer", "aside")

  /** Entity unescape order — `&amp;` LAST, so the escaped forms of
    * other entities (`&amp;lt;`) correctly surface as literal text
    * (`&lt;`), never double-unescape.
    */
  val entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&nbsp;" -> " ", "&amp;" -> "&")

  private def dropBlock(c: Column, tag: String): Column =
    regexp_replace(c, s"(?s)<$tag[^>]*>.*?</$tag>", " ")

  /** `<title>` text of a page ('' when absent). */
  def title(html: Column): Column =
    regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1)

  /** Extracted text: block-drop → tag-strip → entity-unescape →
    * whitespace-collapse → trim.
    */
  def extractText(html: Column): Column = {
    val noBlocks = blockTags.foldLeft(html)(dropBlock)
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val unescaped = entities.foldLeft(noTags) {
      case (c, (from, to)) => replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Anchor count of the raw page (link density is the classic
    * boilerplate signal — Kohlschütter et al., "Boilerplate detection
    * using shallow text features", WSDM 2010). Exact replace-count
    * arithmetic, no regex extraction buffer.
    */
  def linkCount(html: Column): Column =
    ((length(html) - length(regexp_replace(html, "<a ", ""))) / 3)
      .cast("bigint")

  /** The same steps as DuckDB SQL over a column expression `h` —
    * kept adjacent to the Scala so the two stay in lockstep.
    */
  def duckExtract(h: String): String = {
    val noBlocks = blockTags.foldLeft(h) { (acc, tag) =>
      s"regexp_replace($acc, '(?s)<$tag[^>]*>.*?</$tag>', ' ', 'g')"
    }
    val noTags = s"regexp_replace($noBlocks, '<[^>]+>', ' ', 'g')"
    val unescaped = entities.foldLeft(noTags) { case (acc, (from, to)) =>
      s"replace($acc, '$from', '$to')"
    }
    s"trim(regexp_replace($unescaped, '\\s+', ' ', 'g'))"
  }

  def duckTitle(h: String): String =
    s"regexp_extract($h, '(?s)<title[^>]*>(.*?)</title>', 1)"

  def duckLinkCount(h: String): String =
    s"CAST((length($h) - length(regexp_replace($h, '<a ', '', 'g'))) // 3 AS BIGINT)"
}
