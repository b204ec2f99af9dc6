package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQueries.windowChunks

/** Sliding-window chunker: coverage, overlap and tail properties, plus
  * the zero-exchange plan contract.
  */
class WindowChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, w: Int, s: Int) =
    windowChunks(Seq((1L, text)).toDF("doc_id", "text"), w, s)
      .orderBy("chunk_idx")
      .select("start_tok", "end_tok", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

  test("w=4 s=2 over 9 tokens: starts step by stride, tail is short, all covered") {
    val c = chunksOf("a b c d e f g h i", 4, 2)
    assert(c.toSeq == Seq(
      (1L, 4L, "a b c d"), (3L, 6L, "c d e f"), (5L, 8L, "e f g h"),
      (7L, 9L, "g h i")))
    // coverage: every token position 1..9 in at least one [start, end]
    assert((1L to 9L).forall(p => c.exists(x => x._1 <= p && p <= x._2)))
    // overlap between consecutive full windows = w - s
    assert(c.sliding(2).filter(_.length == 2)
      .forall { case Array(x, y) => x._2 - y._1 + 1 >= 1 })
  }

  test("short doc yields exactly one whole-doc chunk") {
    assert(chunksOf("a b", 4, 2).toSeq == Seq((1L, 2L, "a b")))
    assert(chunksOf("a b c d", 4, 2).toSeq == Seq((1L, 4L, "a b c d")))
  }

  test("stride must be positive and below the window") {
    assertThrows[IllegalArgumentException](chunksOf("a", 4, 4))
    assertThrows[IllegalArgumentException](chunksOf("a", 4, 0))
  }

  test("chunking is zero-exchange") {
    val plan = windowChunks(Seq((1L, "a b c")).toDF("doc_id", "text"), 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
