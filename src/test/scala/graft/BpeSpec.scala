package graft

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Distributed BPE trainer/apply vs a sequential reference
  * implementation (classic Sennrich et al. greedy BPE): the TRAIN side
  * is outside q149's DuckDB oracle (iterative argmax is not
  * closed-form SQL), so this spec is its correctness gate.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference ----

  private def refSyms(word: String): List[String] =
    word.map(_.toString).toList :+ "</w>"

  /** One greedy left-to-right merge pass (the textbook definition). */
  private def refMergePass(syms: List[String], l: String, r: String)
      : List[String] = {
    val out = ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refApply(word: String,
                       merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(refSyms(word)) { case (s, (l, r)) =>
      refMergePass(s, l, r)
    }

  /** Sequential trainer: pair counts weighted by word counts, winner =
    * (count desc, l, r), stop below minFreq.
    */
  private def refTrain(words: Map[String, Long], numMerges: Int,
                       minFreq: Long = 2L): Seq[(String, String)] = {
    var state = words.map { case (w, c) => (refSyms(w), c) }.toList
    val merges = ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, c) <- state; Seq(a, b) <- syms.sliding(2))
        counts((a, b)) += c
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minFreq =>
          merges += ((l, r))
          state = state.map { case (s, c0) => (refMergePass(s, l, r), c0) }
        case _ => done = true
      }
    }
    merges.toSeq
  }

  // ---- specs ----

  test("string merge pass == textbook greedy pass (incl. run chains)") {
    // pairs over repeated symbols are where naive replace goes wrong:
    // the shared border space of the double-space encoding must let
    // back-to-back occurrences both merge, but never re-merge output
    val cases = Seq(
      ("aaaa", "a", "a"),      // runs: aa aa
      ("aaa", "a", "a"),       // odd run: aa a
      ("abab", "a", "b"),      // adjacent pair occurrences
      ("xabay", "a", "b"),     // mid-word single
      ("banana", "a", "n"),    // interleaved
      ("aba", "b", "a"))
    for ((w, l, r) <- cases) {
      val got = Seq(w).toDF("word")
        .select(split(trim(Bpe.mergePass(Bpe.initState(col("word")), l, r)),
          "  ").as("t"))
        .collect()(0).getSeq[String](0).toList
      assert(got == refMergePass(refSyms(w), l, r), s"word=$w pair=($l,$r)")
    }
  }

  test("multi-round apply == reference on every corpus word") {
    val corpus = Seq("low", "lower", "lowest", "newer", "newest", "wider",
      "widest", "new", "aaaa", "banana")
    val words = corpus.flatMap(w => Seq.fill(3)(w))
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merges = refTrain(counts, 12)
    assert(merges.nonEmpty)
    val got = corpus.toDF("word")
      .select(col("word"), Bpe.segment(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    for (w <- corpus) assert(got(w) == refApply(w, merges), s"word=$w")
  }

  test("distributed train == sequential reference train") {
    // skewed counts force frequency-driven merges; ties force the
    // (l, r) lexicographic tie-break in both implementations
    val docs = Seq(
      (1L, "low low low lower lower newest"),
      (2L, "newer newer newest widest wide wide"),
      (3L, "low newer lowest widest aaaa aaaa"),
      (4L, "banana banana bandana low lower"))
      .toDF("doc_id", "text")
    val wordCounts = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = refTrain(wordCounts, 16)
    val got = Bpe.train(spark, docs, numMerges = 16)
    assert(got == expect)
  }

  test("driver-byte cap: over-budget vocab falls back to the " +
      "distributed loop with identical merges") {
    val docs = Seq(
      (1L, "low low low lower lower newest"),
      (2L, "newer newer newest widest wide wide"))
      .toDF("doc_id", "text")
    val local = Bpe.train(spark, docs, numMerges = 12)
    // a 1-byte state budget rejects ANY vocab → distributed loop;
    // the merge list must be bit-identical (the local loop's contract)
    val fellBack = Bpe.train(spark, docs, numMerges = 12,
      maxDriverStateBytes = 1L)
    assert(fellBack == local)
    // the estimate is monotone in word bytes and non-trivial: a long
    // word charges more than a short one, and the budget derives from
    // the driver heap, not a row count
    val short = Bpe.estimatedStateBytes(Iterator(("ab", 1L)))
    val long = Bpe.estimatedStateBytes(Iterator(("a" * 1000, 1L)))
    assert(long > short && long >= 6000L)
    assert(Bpe.driverStateBudget > 0L &&
      Bpe.driverStateBudget <= Runtime.getRuntime.maxMemory)
  }

  test("train/save/load/lexicon/encode round-trip, OOV falls back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_spec")
      .toString
    val docs = Seq(
      (1L, "seed seed seeds feed feeds"),
      (2L, "seed feed seeds seeds deed"))
      .toDF("doc_id", "text")
    val merges = Bpe.train(spark, docs, numMerges = 8)
    Bpe.saveMerges(spark, merges, s"$dir/merges")
    val back = Bpe.loadMerges(spark, s"$dir/merges")
    assert(back == merges)

    val lex = Bpe.lexicon(Bpe.wordCounts(docs).select("word"), back)
    // encode a batch containing an OOV word ("deeds" never occurs):
    // the lexicon misses it and the doc-local merge fold takes over —
    // the result must equal the reference apply under the same merges
    val batch = Seq((9L, "seed deeds feeds")).toDF("doc_id", "text")
    val out = Bpe.encode(batch, lex, back).collect()(0)
    val toks = out.getAs[Seq[String]]("tokens").toList
    val expectToks = List("seed", "deeds", "feeds")
      .flatMap(w => refApply(w, merges))
    assert(toks == expectToks)
    assert(out.getAs[Long]("n_words") == 3L)
    assert(out.getAs[Long]("n_tokens") == expectToks.length.toLong)
  }
}
