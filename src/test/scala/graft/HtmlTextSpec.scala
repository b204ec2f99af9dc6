package graft

import org.apache.spark.sql.functions._

import graft.ops.HtmlText

/** HTML text extraction: block dropping, entity order, and bounded
  * behavior on hostile (malformed) markup.
  */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlText.extractText(col("h"))).head.getString(0)

  test("drops script/style/nav/footer content whole, keeps body text") {
    val h = "<html><head><style>p{}</style></head><body>" +
      "<nav><a href=\"/\">Home</a></nav><p>keep me</p>" +
      "<script>drop();</script><footer>legal</footer></body></html>"
    assert(extract(h) == "keep me")
  }

  test("unescapes entities with &amp; last (no double-unescape)") {
    // literal '&lt;' written escaped in the page must surface as the
    // TEXT '&lt;', not as '<'
    assert(extract("<p>a &amp;lt; b &lt;c&gt; &quot;d&quot;</p>")
      == "a &lt; b <c> \"d\"")
  }

  test("malformed markup stays bounded: unclosed blocks drop to end-of-tag only") {
    // an unclosed <script> has no </script> — the block regex cannot
    // match, the tag-strip removes just the markup, payload survives
    // as text (bounded behavior, no hang/exception)
    assert(extract("<script>orphan(); <p>x</p>") == "orphan(); x")
    // nested same-tag blocks: non-greedy match ends at the FIRST
    // closer; the dangling closer is stripped as a plain tag
    assert(extract("<nav>a <nav>b</nav> c</nav> d") == "c d")
  }

  test("title and link count read the raw page") {
    val df = Seq("<html><head><title>T1</title></head>" +
        "<body><a href=\"/x\">x</a> <a href=\"/y\">y</a></body></html>")
      .toDF("h")
    val r = df.select(HtmlText.title(col("h")).as("t"),
      HtmlText.linkCount(col("h")).as("n")).head
    assert(r.getString(0) == "T1" && r.getLong(1) == 2L)
  }

  test("extraction is zero-exchange (pure expression work)") {
    // string form: AQE wraps the plan, TreeNode.collect would miss
    // Exchange children pre-execution
    val plan = Seq("<p>x</p>").toDF("h")
      .select(HtmlText.extractText(col("h")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
