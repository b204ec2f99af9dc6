package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Short-document regression for the substring-window family: Spark's
  * sequence(1, 0) steps DOWN to [1, 0], so the un-guarded window
  * extraction calls slice(t, 0, winLen) and throws "SQL array indices
  * start at 1" on any doc shorter than the window. Current testdata's
  * minimum doc length is exactly 10 tokens — this pins the guard so a
  * driver regeneration with shorter docs cannot crash q142/q146.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("substringDedupRewrite survives docs shorter than the window") {
    val dup = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "tiny doc"),                      // 2 tokens < winLen=10
      (2L, s"$dup tail two"),                // shares a 12-token span
      (3L, s"head one $dup"),
      (4L, "")).toDF("doc_id", "text")
    val out = TextQueries.substringDedupRewrite(docs, 10)
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // short docs: no windows, nothing removed, text intact
    assert(byId(1L) == ((2L, 0L, "tiny doc")))
    // the duplicated span is removed from both carriers
    assert(byId(2L)._2 == 12L && byId(2L)._3 == "tail two")
    assert(byId(3L)._2 == 12L && byId(3L)._3 == "head one")
  }

  test("q142 diagnostics shape survives short docs (inline guard)") {
    // same guarded expression as q142's inline copy
    val docs = Seq((1L, "a b"), (2L, (1 to 11).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val wins = docs.select(col("doc_id"), explode(expr(
      """if(size(t) >= 10,
        |  transform(sequence(1, size(t) - 9),
        |    i -> substring(md5(concat_ws(' ', slice(t, i, 10))), 1, 16)),
        |  array())""".stripMargin)).as("wh"))
    val got = wins.groupBy(col("doc_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(1L))      // no windows for the 2-token doc
    assert(got(2L) == 2L)          // 11 tokens -> 2 overlapping windows
  }
}
