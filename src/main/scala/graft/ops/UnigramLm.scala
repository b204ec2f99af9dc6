package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Distributed unigram-LM subword tokenizer (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece unigram model),
  * with the same TRAIN / APPLY warehouse split as [[Bpe]]. This is the
  * A/B partner production pipelines compare BPE against: instead of a
  * ranked merge list, the trained state is a PIECE TABLE
  * (piece, lp_micro) — integer micro-unit log-probabilities — and
  * APPLY is exact Viterbi segmentation (the max-probability
  * decomposition of each word into pieces).
  *
  * Training is hard (Viterbi) EM over a substring seed vocabulary:
  * the E-step segments every distinct word under the current piece
  * probabilities, the M-step re-estimates each piece's probability
  * from its usage count (word-count weighted), and a final prune keeps
  * the single characters (coverage guarantee: every word stays
  * segmentable) plus the top multi-character pieces. Hard EM instead
  * of lattice forward-backward keeps every step an exact integer
  * aggregate and is the documented deterministic variant; the
  * probability ranking it converges to is what the oracle-facing
  * artifact (the persisted piece table) pins.
  *
  * Scale shape — identical to [[Bpe]]: the corpus is shuffled exactly
  * ONCE ([[Bpe.wordCounts]]); seeding, every EM round, and the final
  * lexicon all operate on the cached DISTINCT-WORD frame, so cost
  * scales with vocabulary size and word length, never corpus rows.
  * Candidate matches are an EQUI-join of per-(word, end, len)
  * substrings against the broadcast piece table — a broadcast hash
  * join linear in vocab × word-length × maxPieceLen, never a
  * nested-loop predicate scan.
  *
  * Cross-engine replayable APPLY. Viterbi here is a single
  * `aggregate` fold over the word's positions with an
  * array-of-structs accumulator: best[i] = max over pieces ending at
  * i of best[start] + lp_micro, where "max" is Spark's struct
  * ordering over (score, -n_tokens, path) — ties break to fewer
  * tokens, then the byte-wise LARGEST path string. All-integer
  * scores, so a DuckDB oracle replays the identical DP from the
  * persisted piece table alone with position-unrolled CTEs and
  * `ORDER BY sc DESC, nt DESC, path DESC` per step
  * ([[graft.queries.TextQueries]] generates that SQL).
  *
  * Persisted artifacts:
  *  - pieces:  (rank, piece, lp_micro) — the tokenizer's entire
  *    trained state; lp_micro = round(ln(P(piece)) * 1e6).
  *  - lexicon: (word, toks, n_toks) — Viterbi segmentations of the
  *    corpus vocabulary; encode = broadcast join + doc-local flatten.
  */
object UnigramLm {

  /** Scores below this sentinel mark an unreachable DP cell. */
  private val NegInf = -(1L << 50)

  /** Candidate piece matches of every word position: one row per
    * (word, end, start, piece, lp_micro) where
    * word[start+1..end] == piece — lp_micro null when the substring is
    * not a piece. Built as an EQUI-join on the extracted substring so
    * the broadcast piece table is hash-probed, not nested-loop
    * scanned; LEFT join so every word keeps at least one row (a word
    * with no matching piece must reach the loud-failure path
    * downstream, not silently vanish from the lexicon).
    */
  def matches(words: DataFrame, pieces: DataFrame,
              maxPieceLen: Int): DataFrame = words
    .select(col("word"),
      explode(sequence(lit(1), length(col("word")))).as("end"))
    .select(col("word"), col("end"),
      explode(sequence(lit(1), least(lit(maxPieceLen), col("end"))))
        .as("plen"))
    .select(col("word"), col("end"), (col("end") - col("plen")).as("start"),
      col("word").substr(col("end") - col("plen") + lit(1), col("plen"))
        .as("piece"))
    .join(broadcast(pieces.select(col("piece"), col("lp_micro"))),
      Seq("piece"), "left")

  /** Exact Viterbi segmentation of a one-column `word` frame under the
    * piece table: (word, toks, n_toks, score_micro). One `aggregate`
    * fold per word — plan depth is constant in word length, and the
    * whole pass is vocab-sized. Words with an unreachable final
    * position (impossible while the piece table keeps all single
    * characters) fail loudly.
    */
  def viterbiLexicon(words: DataFrame, pieces: DataFrame,
                     maxPieceLen: Int = 8): DataFrame = {
    // collect_list skips nulls, and the LEFT-joined matches keep every
    // word's (end, plen) rows — so every input word lands here with
    // its (possibly empty) match list, and the ONE groupBy below is
    // the op's only exchange: no second coverage join needed.
    val ms = matches(words, pieces, maxPieceLen)
      .groupBy(col("word"))
      .agg(collect_list(when(col("lp_micro").isNotNull,
        struct(col("end"), col("start"), col("lp_micro"), col("piece"))))
        .as("ms"))
    val entry = (sc: Column, nt: Column, path: Column) =>
      struct(sc.as("sc"), nt.as("nt"), path.as("path"))
    val wl = length(col("word"))
    // acc[j] = best (score, -ntoks, path) reaching position j (0-based
    // array index = position); fold positions 1..len left to right.
    val init = concat(
      array(entry(lit(0L), lit(0), lit(""))),
      transform(sequence(lit(1), wl),
        _ => entry(lit(NegInf), lit(0), lit(""))))
    val dp = aggregate(
      sequence(lit(1), wl),
      init,
      (acc, i) => transform(acc, (e, j) =>
        when(j === i, coalesce(
          array_max(transform(
            filter(col("ms"), m =>
              m.getField("end") === i &&
                element_at(acc, m.getField("start") + 1)
                  .getField("sc") > NegInf),
            m => entry(
              element_at(acc, m.getField("start") + 1).getField("sc") +
                m.getField("lp_micro"),
              element_at(acc, m.getField("start") + 1).getField("nt") -
                lit(1),
              concat(
                element_at(acc, m.getField("start") + 1).getField("path"),
                lit(" "), m.getField("piece"))))),
          e)).otherwise(e)))
    val best = element_at(dp, wl + 1)
    ms.select(col("word"),
        when(best.getField("sc") <= NegInf,
          raise_error(concat(lit("unigram viterbi: word '"), col("word"),
            lit("' has no segmentation — it contains a character that " +
              "never appeared in the corpus the piece table was " +
              "trained on (single-char coverage spans the TRAINING " +
              "split's characters only); train on a corpus covering " +
              "the apply vocabulary's characters"))))
          .otherwise(best).as("b"))
      .select(col("word"),
        split(ltrim(col("b").getField("path")), " ").as("toks"),
        (-col("b").getField("nt")).cast(LongType).as("n_toks"),
        col("b").getField("sc").as("score_micro"))
  }

  /** Substring seed vocabulary over the corpus word counts: ALL single
    * characters (coverage) plus the `seedSize` most frequent
    * multi-character substrings up to `maxPieceLen`, each scored by
    * its word-count-weighted occurrence frequency. Returns
    * (piece, freq).
    */
  def seedVocab(wordCounts: DataFrame, maxPieceLen: Int,
                seedSize: Int): DataFrame = {
    val subs = wordCounts
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("end"))
      .select(col("word"), col("cnt"), col("end"),
        explode(sequence(lit(1), least(lit(maxPieceLen), col("end"))))
          .as("plen"))
      .select(
        col("word").substr(col("end") - col("plen") + lit(1), col("plen"))
          .as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece"))
      .limit(seedSize)
    chars.unionByName(multi)
  }

  /** Train a unigram-LM piece table by hard (Viterbi) EM. Returns the
    * final (piece, lp_micro) frame, vocab-sized. Deterministic: every
    * selection orders by (count desc, piece); single-character pieces
    * are never pruned and keep a usage floor of 1 so log stays finite
    * and every word remains segmentable.
    */
  def train(spark: SparkSession, docs: DataFrame, vocabSize: Int,
            maxPieceLen: Int = 8, emRounds: Int = 4,
            seedSize: Int = 2000,
            az: Analyzer = Analyzer.Whitespace): DataFrame = {
    val wc = Bpe.wordCounts(docs, az).cache()
    try {
      val words = wc.select(col("word"))
      // initial probabilities from raw substring frequencies
      def toLp(freqs: DataFrame): DataFrame = {
        val total = freqs.agg(sum(col("freq")).as("tot"))
        freqs.crossJoin(broadcast(total)) // 1-row total
          .select(col("piece"),
            round(log(col("freq").cast(DoubleType) /
              col("tot").cast(DoubleType)) * 1e6, 0).cast(LongType)
              .as("lp_micro"))
      }
      var pieces = toLp(seedVocab(wc, maxPieceLen, seedSize))
        .localCheckpoint()
      for (round <- 1 to emRounds) {
        val lastRound = round == emRounds
        // E-step: Viterbi usage counts under the current model,
        // weighted by word count — a vocab-sized pass.
        val usage = viterbiLexicon(words, pieces, maxPieceLen)
          .join(wc, Seq("word"))
          .select(explode(col("toks")).as("piece"), col("cnt"))
          .groupBy(col("piece")).agg(sum(col("cnt")).as("used"))
        // M-step: re-estimate; chars keep a floor of 1, unused
        // multi-char pieces drop, and the LAST round prunes to
        // vocabSize (chars always survive).
        val scored = pieces.select(col("piece"))
          .join(usage, Seq("piece"), "left")
          .select(col("piece"),
            when(length(col("piece")) === 1,
              greatest(coalesce(col("used"), lit(0L)), lit(1L)))
              .otherwise(coalesce(col("used"), lit(0L))).as("freq"))
          .filter(col("freq") > 0)
        val kept =
          if (!lastRound) scored
          else scored.filter(length(col("piece")) === 1).unionByName(
            scored.filter(length(col("piece")) > 1)
              .orderBy(col("freq").desc, col("piece"))
              .limit(vocabSize))
        // localCheckpoint truncates the per-round plan growth (the
        // Bpe.train remat precedent) — state is vocab-sized.
        pieces = toLp(kept).localCheckpoint()
      }
      pieces
    } finally {
      wc.unpersist()
      ()
    }
  }

  /** Persist the piece table as a warehouse table, ranked by
    * probability (lp desc) then piece.
    */
  def savePieces(spark: SparkSession, pieces: DataFrame,
                 dir: String): Long =
    // rank assigned on the driver from the sorted collect (the piece
    // table is vocabSize-bounded by train's last-round prune) — no
    // single-partition row_number window; the LocalRelation then
    // writes driver-side through replaceTable's local fast path
    Load.replaceTable(spark,
      graft.ops.Relational.withLocalRank(spark,
          pieces.orderBy(col("lp_micro").desc, col("piece")), "rank")
        .select(col("rank"), col("piece"), col("lp_micro")),
      dir)

  /** Read a persisted piece table back: (piece, lp_micro). */
  def loadPieces(spark: SparkSession, dir: String): DataFrame =
    Load.readTable(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no piece table at $dir — train first"))
      .select(col("piece"), col("lp_micro"))

  /** Encode (doc_id, text) against a precomputed Viterbi lexicon:
    * per doc (n_words, n_tokens, tokens in order). The lexicon is
    * expected to cover the corpus vocabulary (it is built from the
    * same corpus' distinct words); a missing word fails loudly rather
    * than silently dropping tokens.
    */
  def encode(docs: DataFrame, lex: DataFrame,
             az: Analyzer = Analyzer.Whitespace): DataFrame = docs
    .select(col("doc_id"),
      posexplode(split(az.normalize(col("text")), " "))
        .as(Seq("pos", "word")))
    .filter(length(col("word")) > 0)
    .join(broadcast(lex.select(col("word"), col("toks"))), Seq("word"),
      "left")
    .select(col("doc_id"), col("pos"),
      when(col("toks").isNull,
        raise_error(concat(lit("unigram encode: word '"), col("word"),
          lit("' missing from the lexicon"))))
        .otherwise(col("toks")).as("toks"))
    .groupBy(col("doc_id"))
    .agg(
      count(lit(1)).as("n_words"),
      sum(size(col("toks"))).cast(LongType).as("n_tokens"),
      flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
}
