package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AccentFold
import graft.ops.{Analyzer, InvertedIndex}

/** The index/query analyzer chain ([[graft.ops.Analyzer]]): raw
  * cased/punctuated/accented text must index AND query under ONE
  * shared analysis — the pins are (1) the driver-side query analyzer
  * is byte-equal to the in-plan Column analyzer over adversarial
  * inputs, (2) an index over raw text answers folded queries across
  * every search path with results identical to a Whitespace index
  * over pre-analyzed text (index-side ≡ query-side), (3) phrase
  * positions are exact over the analyzed stream (punctuation
  * expansion, stopword slots retained), (4) stopword semantics
  * (dl counts slots, queries drop, phrases refuse), (5) the recorded
  * policy survives addBatch/delete and pre-analyzer rows read as
  * Whitespace.
  */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/ix"

  private val nasty = Seq(
    "Spark, Query! MERGE...",
    "séñor Café — naïve résumé",
    "éclair vs éclair", // decomposed and composed agree
    "state-of-the-art (2024)",
    "  doubled  spaces\tand\ttabs ",
    "“quoted” … ellipsis… №42",
    "ALL CAPS and MiXeD CaSe",
    "12three45 mix3d tok3ns",
    "", "!!!", "é")

  test("driver-side foldSplit is byte-equal to the in-plan Column " +
      "analyzer over adversarial inputs") {
    val az = Analyzer.Unicode()
    val fromPlan = nasty.toDF("text")
      .select(az.slots(col("text")).as("t")).as[Seq[String]]
      .collect().toSeq
    val fromDriver = nasty.map(Analyzer.foldSplit)
    assert(fromPlan == fromDriver)
    // spot-check the folds themselves
    assert(Analyzer.foldSplit("séñor Café!") ==
      Seq("senor", "cafe"))
    assert(Analyzer.foldSplit("éclair") ==
      Analyzer.foldSplit("éclair"))
    assert(AccentFold.fold(UTF8String.fromString("ascii stays")).toString
      == "ascii stays")
  }

  test("a raw-text Unicode index equals a Whitespace index over " +
      "pre-analyzed text, across every search path") {
    val raw = Seq(
      (1L, "Spark Query! The MERGE plan; Spark again."),
      (2L, "café Spark — señor Query merge spark"),
      (3L, "nothing relevant here at all"),
      (4L, "Query MERGE query merge QUERY"),
      (5L, "spark")).toDF("doc_id", "text")
    // pre-analyzed twin: fold/tokenize on the driver, re-join by " "
    val preRows = raw.collect().map(r =>
      (r.getLong(0), Analyzer.foldSplit(r.getString(1)).mkString(" ")))
      .toSeq.toDF("doc_id", "text")
    val uniDir = tmp("az_uni")
    val wsDir = tmp("az_ws")
    InvertedIndex.build(spark, raw, uniDir) // Unicode is the default
    InvertedIndex.build(spark, preRows, wsDir, Analyzer.Whitespace)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toSeq)
    // search: folded, cased, punctuated queries all hit
    val expect = rows(InvertedIndex.search(spark, wsDir,
      Seq("spark", "query", "merge"), 10))
    assert(rows(InvertedIndex.search(spark, uniDir,
      Seq("Spark,", "QUERY", "mérge"), 10)) == expect)
    assert(expect.map(_.head).contains(1L))
    // maxscore + proximity + boolean agree with their whitespace twins
    assert(rows(InvertedIndex.maxScoreSearch(spark, uniDir,
        Seq("SPARK", "Query"), 5)) ==
      rows(InvertedIndex.maxScoreSearch(spark, wsDir,
        Seq("spark", "query"), 5)))
    assert(rows(InvertedIndex.proximitySearch(spark, uniDir,
        Seq("Spark!", "Query?"), 5)) ==
      rows(InvertedIndex.proximitySearch(spark, wsDir,
        Seq("spark", "query"), 5)))
    assert(rows(InvertedIndex.booleanSearch(spark, uniDir,
        must = Seq("MERGE"), should = Seq("Spark"),
        mustNot = Seq("señor"), k = 5)) ==
      rows(InvertedIndex.booleanSearch(spark, wsDir,
        must = Seq("merge"), should = Seq("spark"),
        mustNot = Seq("senor"), k = 5)))
    // batched search analyzes in-plan
    val queries = Seq((10L, "Spark,"), (10L, "QUERY"), (11L, "CafÉ"))
      .toDF("query_id", "term")
    val queriesWs = Seq((10L, "spark"), (10L, "query"), (11L, "cafe"))
      .toDF("query_id", "term")
    assert(rows(InvertedIndex.searchBatch(spark, uniDir, queries, 5)) ==
      rows(InvertedIndex.searchBatch(spark, wsDir, queriesWs, 5)))
    // phrase: punctuated word expands to consecutive analyzed slots
    assert(rows(InvertedIndex.phraseSearch(spark, uniDir,
        Seq("The", "MERGE"))) ==
      rows(InvertedIndex.phraseSearch(spark, wsDir, Seq("the", "merge"))))
  }

  test("script-aware tokenization: Cyrillic/Greek/Arabic/accented " +
      "runs tokenize, CJK runs emit Lucene-style bigrams, Hangul " +
      "recomposes, final sigma normalizes medial") {
    // non-Latin alphabetic scripts tokenize as whole folded runs —
    // the pre-round-13 alphabet analyzed ALL of these to empty
    assert(Analyzer.foldSplit("Привет, МОСКВА!") == Seq("привет", "москва"))
    assert(Analyzer.foldSplit("Ελλάδα καφέ") == Seq("ελλαδα", "καφε"))
    assert(Analyzer.foldSplit("مرحبا بالعالم") == Seq("مرحبا", "بالعالم"))
    // Greek final sigma → medial (the Lucene GreekLowerCaseFilter
    // rule — Java's position-sensitive lowercase would emit ς)
    assert(Analyzer.foldSplit("ΟΔΟΣ οδός") == Seq("οδοσ", "οδοσ"))
    // CJK bigrams: a run of n chars emits n-1 overlapping bigrams; a
    // lone char emits itself; script changes break runs
    assert(Analyzer.foldSplit("東京都") == Seq("東京", "京都"))
    assert(Analyzer.foldSplit("東") == Seq("東"))
    assert(Analyzer.foldSplit("abc東京都def") ==
      Seq("abc", "東京", "京都", "def"))
    // note らが → らか inside the bigrams: the dakuten is a combining
    // mark under NFD, stripped by the fold (see the が pin below)
    assert(Analyzer.foldSplit("カタカナ ひらがな") ==
      Seq("カタ", "タカ", "カナ", "ひら", "らか", "かな"))
    // Hangul folds through NFD-Jamo and RECOMPOSES (utf8proc parity);
    // syllables bigram like the other CJK scripts
    assert(Analyzer.foldSplit("한국어") == Seq("한국", "국어"))
    // dakuten conflates under the fold (utf8proc/ICUFolding parity)
    assert(Analyzer.foldSplit("が") == Seq("か"))
    // digits — ASCII and non-ASCII Nd — are token characters
    assert(Analyzer.foldSplit("第3章") == Seq("第", "3", "章"))
    // symbols and punctuation of any script separate; a symbol-only
    // text analyzes to ZERO tokens (surfaced by the corpus counter)
    assert(Analyzer.foldSplit("※ ✦ ❖ …") == Seq.empty)
    // ASCII is byte-compatible with the pre-round-13 alphabet
    assert(Analyzer.foldSplit("State-of-the-Art (2024)") ==
      Seq("state", "of", "the", "art", "2024"))
  }

  test("a multi-script index serves folded queries across search " +
      "paths; the zero-token counter accumulates and survives the " +
      "lifecycle") {
    val dir = tmp("az_script")
    InvertedIndex.build(spark, Seq(
      (1L, "МОСКВА завтра 東京都"),
      (2L, "москва сегодня"),
      (3L, "καφές στην Ελλάδα"),
      (4L, "※ ✦ ❖"), // zero-token: counted, never indexed
      (5L, "plain ascii text")).toDF("doc_id", "text"), dir)
    def c() = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    assert(c().getAs[Long]("zero_token_docs") == 1L)
    assert(c().getAs[Long]("n_docs") == 4L)
    // folded Cyrillic query hits both case variants
    assert(InvertedIndex.search(spark, dir, Seq("Москва!"), 5)
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // CJK query term bigrams against the indexed bigrams — phrase
    // adjacency holds (東京 then 京都 are consecutive slots)
    assert(InvertedIndex.search(spark, dir, Seq("東京"), 5)
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(InvertedIndex.phraseSearch(spark, dir, Seq("東京", "京都"))
      .collect().map(_.getLong(0)).toSet == Set(1L))
    // Greek accent fold: καφές → καφεσ (final sigma medial)
    assert(InvertedIndex.search(spark, dir, Seq("ΚΑΦΈΣ"), 5)
      .collect().map(_.getLong(0)).toSet == Set(3L))
    // addBatch accumulates the counter; delete preserves it
    assert(InvertedIndex.addBatch(spark, Seq(
      (6L, "новый документ"), (7L, "•••")).toDF("doc_id", "text"), dir, 1L))
    assert(c().getAs[Long]("zero_token_docs") == 2L)
    assert(InvertedIndex.delete(spark, dir,
      Seq(2L).toDF("doc_id")) == 1L)
    assert(c().getAs[Long]("zero_token_docs") == 2L)
    // rollback preserves the lifetime counter too
    InvertedIndex.rollback(spark, dir, 0L)
    assert(c().getAs[Long]("zero_token_docs") == 2L)
    assert(InvertedIndex.search(spark, dir, Seq("москва"), 5)
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "doc 2 stays deleted across the rollback")
  }

  test("phrase positions are exact over the analyzed stream") {
    val dir = tmp("az_phrase")
    InvertedIndex.build(spark, Seq(
      (1L, "Hello, World! Hello World again"),
      (2L, "Hello there... World"),
      (3L, "a state-of-the-art system"),
      (4L, "state of the art")).toDF("doc_id", "text"), dir)
    val hw = InvertedIndex.phraseSearch(spark, dir, Seq("hello", "world"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hw == Map(1L -> 2L), "two adjacent hello-world starts in doc 1")
    // one raw hyphenated word = a 4-slot phrase; matches doc 3 AND the
    // spelled-out doc 4 (identical analyzed streams)
    val sota = InvertedIndex.phraseSearch(spark, dir,
      Seq("State-of-the-Art")).collect().map(_.getLong(0)).toSet
    assert(sota == Set(3L, 4L))
  }

  test("stopword set: dl counts slots, queries drop them, phrases " +
      "refuse them, positions keep slots") {
    val dir = tmp("az_stop")
    val az = Analyzer.Unicode(stopwords = Seq("the", "a"))
    InvertedIndex.build(spark, Seq(
      (1L, "The quick brown fox"),
      (2L, "quick the fox")).toDF("doc_id", "text"), dir, az)
    // dl counts stopword SLOTS: doc 1 has 4 slots, doc 2 has 3
    val c = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    assert(c.getAs[Long]("n_docs") == 2L && c.getAs[Long]("sum_dl") == 7L)
    assert(c.getAs[String]("analyzer") == "unicode")
    assert(c.getAs[scala.collection.Seq[String]]("stopwords").toSeq ==
      Seq("a", "the"))
    // stopwords produce no postings
    assert(spark.read.parquet(s"$dir/postings")
      .filter(col("term").isin("the", "a")).count() == 0L)
    // a query containing a stopword scores only its content terms
    val r = InvertedIndex.search(spark, dir, Seq("THE", "Quick"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r.keySet == Set(1L, 2L) && r.values.toSet == Set(1L),
      "n_terms must be 1 — 'the' dropped from the query")
    // positions retain stopword slots: quick(2) brown(3) adjacent in
    // doc 1; quick(1) fox(3) NOT adjacent in doc 2
    assert(InvertedIndex.phraseSearch(spark, dir, Seq("quick", "brown"))
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(InvertedIndex.phraseSearch(spark, dir, Seq("quick", "fox"))
      .collect().isEmpty)
    // a stopword INSIDE a phrase is refused loudly
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.phraseSearch(spark, dir, Seq("quick", "the", "fox"))
    }
    assert(e.getMessage.contains("stopword"))
    // a query that analyzes entirely away is refused loudly
    val e2 = intercept[IllegalArgumentException] {
      InvertedIndex.search(spark, dir, Seq("The", "a"), 5)
    }
    assert(e2.getMessage.contains("no indexable terms"))
  }

  test("the recorded policy survives addBatch and delete; " +
      "deleteByQuery analyzes its clauses") {
    val dir = tmp("az_life")
    InvertedIndex.build(spark,
      Seq((1L, "Alpha! Beta?"), (2L, "beta gamma")).toDF("doc_id", "text"),
      dir)
    // addBatch reads the recorded analyzer — raw cased text folds
    assert(InvertedIndex.addBatch(spark,
      Seq((3L, "ALPHA — Gamma;")).toDF("doc_id", "text"), dir, 1L))
    assert(InvertedIndex.search(spark, dir, Seq("alpha"), 5)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // deleteByQuery with a cased/punctuated clause
    assert(InvertedIndex.deleteByQuery(spark, dir, Seq("Alpha,")) == 2L)
    assert(InvertedIndex.search(spark, dir, Seq("GAMMA"), 5)
      .collect().map(_.getLong(0)).toSet == Set(2L),
      "doc 3 deleted; folded search still serves the survivor")
    // the corpus row kept its analyzer fields through the delete
    val c = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    assert(c.getAs[String]("analyzer") == "unicode")
  }

  test("pre-analyzer corpus rows read as Whitespace — verbatim " +
      "matching, byte-compat") {
    val dir = tmp("az_legacy")
    InvertedIndex.build(spark,
      Seq((1L, "Spark, rocks"), (2L, "spark rocks")).toDF("doc_id", "text"),
      dir, Analyzer.Whitespace)
    // simulate a pre-analyzer on-disk row: drop the analyzer fields
    val c0 = graft.etl.Load.readTable(spark, s"$dir/corpus").get
      .drop("analyzer", "stopwords")
    graft.etl.Load.replaceTable(spark, c0, s"$dir/corpus")
    // verbatim token "Spark," matches doc 1 only; no folding anywhere
    assert(InvertedIndex.search(spark, dir, Seq("Spark,"), 5)
      .collect().map(_.getLong(0)).toSet == Set(1L))
    assert(InvertedIndex.search(spark, dir, Seq("spark"), 5)
      .collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("normalize: split(normalize(text)) IS the analyzed stream; " +
      "Whitespace is the identity; stopword slots drop") {
    val az = Analyzer.Unicode()
    val rows = nasty.toDF("text").select(
      split(az.normalize(col("text")), " ").as("viaNorm"),
      az.slots(col("text")).as("direct"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (viaNorm, direct) =>
      // the sole divergence: an empty stream re-joins to "" which
      // splits to [""] — downstream machinery filters length>0, so
      // compare the non-empty streams
      assert(viaNorm.filter(_.nonEmpty) == direct.filter(_.nonEmpty))
    }
    // Whitespace normalize is the IDENTITY — byte-compat, plan included
    val ws = Analyzer.Whitespace
    val kept = Seq("a  b", " x\ty ", "").toDF("t")
      .select(ws.normalize(col("t"))).as[String].collect().toSeq
    assert(kept == Seq("a  b", " x\ty ", ""))
    // a stopword set drops its tokens from the normalized stream (the
    // model stack counts indexed tokens only)
    val stopped = Analyzer.Unicode(Seq("the"))
    assert(Seq("The Spark, the END").toDF("t")
      .select(split(stopped.normalize(col("t")), " ")).as[Seq[String]]
      .head() == Seq("spark", "end"))
  }

  test("model-sidecar save/load round-trips; a missing sidecar reads " +
      "as Whitespace") {
    val root = java.nio.file.Files
      .createTempDirectory("az_sidecar").toString
    Analyzer.save(spark, Analyzer.Unicode(Seq("the", "a")), s"$root/m1")
    val back = Analyzer.load(spark, s"$root/m1")
    assert(back == Analyzer.Unicode(Seq("a", "the")),
      "kind and the (sorted) stopword set round-trip")
    Analyzer.save(spark, Analyzer.Whitespace, s"$root/m2")
    assert(Analyzer.load(spark, s"$root/m2") == Analyzer.Whitespace)
    // a model persisted before analyzers reached the model stack has
    // no sidecar — it tokenized raw whitespace
    assert(Analyzer.load(spark, s"$root/nope") == Analyzer.Whitespace)
  }

  test("BPE and Vocab under the unicode analyzer ≡ whitespace over " +
      "the pre-analyzed twin") {
    import graft.ops.{Bpe, Vocab}
    val az = Analyzer.Unicode()
    val raw = Seq((1L, "Héllo, héllo! WORLD."), (2L, "world; héllo—world"))
    val ana = raw.map { case (i, t) =>
      (i, Analyzer.foldSplit(t).mkString(" ")) }
    // word counts agree
    val wcU = Bpe.wordCounts(raw.toDF("doc_id", "text"), az)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val wcW = Bpe.wordCounts(ana.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(wcU == wcW && wcU == Set(("hello", 3L), ("world", 3L)))
    // trained merges and the encode stream agree
    val mU = Bpe.train(spark, raw.toDF("doc_id", "text"), 8, az = az)
    val mW = Bpe.train(spark, ana.toDF("doc_id", "text"), 8)
    assert(mU == mW)
    val lex = Bpe.lexicon(
      Bpe.wordCounts(raw.toDF("doc_id", "text"), az).select(col("word")), mU)
    val encU = Bpe.encode(raw.toDF("doc_id", "text"), lex, mU, az)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val encW = Bpe.encode(ana.toDF("doc_id", "text"), lex, mW)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(encU == encW)
    // Vocab: ids assigned over analyzed words; encode follows
    val vDir = java.nio.file.Files
      .createTempDirectory("az_vocab").toString + "/v"
    Vocab.train(spark, raw.toDF("doc_id", "text"), vDir, 16, az)
    val vocab = graft.etl.Load.readTable(spark, vDir).get
    val idsU = Vocab.encode(raw.toDF("doc_id", "text"), vocab, az)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val idsW = Vocab.encode(ana.toDF("doc_id", "text"), vocab)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(idsU == idsW)
  }
}
