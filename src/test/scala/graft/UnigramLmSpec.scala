package graft

import org.apache.spark.sql.functions._

import graft.ops.UnigramLm

/** Distributed unigram-LM (Kudo 2018) trainer/apply vs a sequential
  * reference Viterbi: the TRAIN side (hard EM) is outside the DuckDB
  * oracle (iterative re-estimation is not closed-form SQL), so this
  * spec is its correctness gate; the APPLY tie-break rule
  * (max score, then fewest tokens, then byte-wise largest path) is
  * pinned here because the oracle replays it and any drift would
  * surface as a cross-engine hash mismatch.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequential reference Viterbi ----

  /** Textbook DP with the exact production tie-break: maximize
    * (score, -ntoks, path-string) left to right.
    */
  private def refViterbi(word: String, pieces: Map[String, Long])
      : (Seq[String], Long) = {
    val n = word.length
    val NegInf = Long.MinValue / 4
    // best(i) = (score, -ntoks, path) reaching position i
    val best = Array.fill[(Long, Int, String)](n + 1)((NegInf, 0, ""))
    best(0) = (0L, 0, "")
    for (i <- 1 to n; s <- 0 until i) {
      val piece = word.substring(s, i)
      pieces.get(piece).foreach { lp =>
        if (best(s)._1 > NegInf) {
          val cand = (best(s)._1 + lp, best(s)._2 - 1,
            best(s)._3 + " " + piece)
          val cur = best(i)
          val better = cand._1 > cur._1 ||
            (cand._1 == cur._1 && (cand._2 > cur._2 ||
              (cand._2 == cur._2 && cand._3 > cur._3)))
          if (better) best(i) = cand
        }
      }
    }
    require(best(n)._1 > NegInf, s"no segmentation for $word")
    (best(n)._3.trim.split(" ").toSeq, -best(n)._2.toLong)
  }

  private def piecesDf(p: Map[String, Long]) =
    p.toSeq.sortBy(_._1).toDF("piece", "lp_micro")

  test("viterbiLexicon equals the sequential reference DP") {
    val pieces = Map(
      "s" -> -4000000L, "p" -> -4000000L, "a" -> -3000000L,
      "r" -> -3500000L, "k" -> -4200000L, "spark" -> -9000000L,
      "sp" -> -6000000L, "ar" -> -5500000L, "ark" -> -7000000L)
    val words = Seq("spark", "park", "ss", "a").toDF("word")
    val got = UnigramLm.viterbiLexicon(words, piecesDf(pieces))
      .select("word", "toks", "n_toks").as[(String, Seq[String], Long)]
      .collect().map { case (w, t, n) => (w, (t, n)) }.toMap
    for (w <- Seq("spark", "park", "ss", "a")) {
      val (toks, n) = refViterbi(w, pieces)
      assert(got(w) == ((toks, n)), s"word $w: ${got(w)} vs ($toks, $n)")
    }
    // "spark" as one piece (-9.0) beats sp+ar+k (-15.7) and chars
    assert(got("spark")._1 == Seq("spark"))
  }

  test("tie-breaks: fewer tokens, then byte-wise largest path") {
    // two exact-score segmentations of "ab": [ab] (-8) and [a, b]
    // (-4 + -4 = -8) — fewer tokens must win
    val p1 = Map("a" -> -4000000L, "b" -> -4000000L, "ab" -> -8000000L)
    val r1 = UnigramLm.viterbiLexicon(Seq("ab").toDF("word"), piecesDf(p1))
      .select("toks").as[Seq[String]].head()
    assert(r1 == Seq("ab"), s"fewer-tokens tie-break broke: $r1")
    // "abc": [ab, c] and [a, bc] tie on score AND token count —
    // byte-wise largest path (" ab c" < " a bc" is false: ' ' < 'b';
    // compare " a bc" vs " ab c": position 2 ' ' vs 'b' → " ab c"
    // is larger) must win, matching the oracle's ORDER BY path DESC
    val p2 = Map("a" -> -4000000L, "bc" -> -6000000L,
      "ab" -> -4000000L, "c" -> -6000000L, "b" -> -9000000L)
    val r2 = UnigramLm.viterbiLexicon(Seq("abc").toDF("word"), piecesDf(p2))
      .select("toks").as[Seq[String]].head()
    val ref = refViterbi("abc", p2)._1
    assert(r2 == ref && r2 == Seq("ab", "c"),
      s"path tie-break broke: $r2 vs ref $ref")
  }

  test("train keeps every character, prunes to vocab, and covers") {
    val docs = Seq(
      (1L, "spark spark spark merge sort"),
      (2L, "spark merge merge table scan"),
      (3L, "sort table spark row row")).toDF("doc_id", "text")
    val pieces = UnigramLm.train(spark, docs, vocabSize = 6,
      maxPieceLen = 5, emRounds = 3, seedSize = 50)
    val ps = pieces.select("piece").as[String].collect().toSet
    val chars = Set("s", "p", "a", "r", "k", "m", "e", "g", "o", "t",
      "b", "l", "c", "n", "w")
    assert(chars.subsetOf(ps), s"missing chars: ${chars -- ps}")
    assert(ps.count(_.length > 1) <= 6)
    // frequent whole words should be learned as single pieces and the
    // lexicon must cover every corpus word
    val lex = UnigramLm.viterbiLexicon(
      graft.ops.Bpe.wordCounts(docs).select("word"), pieces)
    val seg = lex.select("word", "toks").as[(String, Seq[String])]
      .collect().toMap
    assert(seg.keySet == Set("spark", "merge", "sort", "table", "scan",
      "row"))
    assert(seg("spark") == Seq("spark"),
      s"5x-frequent 'spark' not learned whole: ${seg("spark")}")
  }

  test("save/load round-trips and encode counts add up") {
    val docs = Seq(
      (1L, "spark merge spark"),
      (2L, "sort spark"),
      (3L, "merge sort sort")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("unigram_spec").toString
    val trained = UnigramLm.train(spark, docs, vocabSize = 4,
      maxPieceLen = 5, emRounds = 2, seedSize = 30)
    UnigramLm.savePieces(spark, trained, s"$dir/pieces")
    val loaded = UnigramLm.loadPieces(spark, s"$dir/pieces")
    assert(loaded.as[(String, Long)].collect().toSet ==
      trained.as[(String, Long)].collect().toSet)
    val lex = UnigramLm.viterbiLexicon(
      graft.ops.Bpe.wordCounts(docs).select("word"), loaded)
    val enc = UnigramLm.encode(docs, lex)
      .select("doc_id", "n_words", "n_tokens", "tokens")
      .as[(Long, Long, Long, Seq[String])].collect()
      .map(r => (r._1, r)).toMap
    assert(enc(1L)._2 == 3L) // three words
    // n_tokens equals the flattened token count, tokens in word order
    for ((_, (_, nw, nt, toks)) <- enc) {
      assert(toks.size.toLong == nt && nw > 0)
    }
    val segSpark = lex.filter(col("word") === "spark")
      .select("toks").as[Seq[String]].head()
    assert(enc(2L)._4.startsWith(lex.filter(col("word") === "sort")
      .select("toks").as[Seq[String]].head()))
    assert(enc(2L)._4.endsWith(segSpark))
  }

  test("viterbi determinism: repeated runs are bit-identical") {
    val docs = Seq((1L, "spark merge sort table scan row spark"))
      .toDF("doc_id", "text")
    val pieces = UnigramLm.train(spark, docs, vocabSize = 8,
      maxPieceLen = 6, emRounds = 2, seedSize = 40)
    val words = graft.ops.Bpe.wordCounts(docs).select("word")
    val a = UnigramLm.viterbiLexicon(words, pieces)
      .orderBy("word").collect().toSeq
    val b = UnigramLm.viterbiLexicon(words, pieces)
      .orderBy("word").collect().toSeq
    assert(a == b)
  }
}
