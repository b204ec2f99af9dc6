package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.AnalyzeTokens

/** Text analysis policy of an [[InvertedIndex]] — the Lucene analyzer
  * contract: ONE definition of "what is a token", recorded in the
  * index's corpus row at build time and applied IDENTICALLY on the
  * index side ([[InvertedIndex.postings]]) and the query side of every
  * search path. An index whose queries analyze differently from its
  * postings silently misses matches — the classic broken-search bug —
  * so the query paths never take an analyzer parameter: they read the
  * recorded policy back from the corpus row.
  *
  * Two policies:
  *  - [[Analyzer.Whitespace]] — split on single spaces, verbatim
  *    tokens. For PRE-TOKENIZED corpora (the driver fixtures, any
  *    upstream-normalized pipeline) and for byte-compat with indexes
  *    built before analyzers existed (a corpus row without an
  *    `analyzer` column reads as whitespace).
  *  - [[Analyzer.Unicode]] — accent fold (NFD, combining marks
  *    dropped, NFC recompose — [[graft.functions.AccentFold]]) →
  *    lowercase → SCRIPT-AWARE tokenization ([[graft.functions
  *    .AnalyzeTokens]]): non-CJK Unicode letter/digit runs become
  *    whole tokens (Cyrillic, Greek, Arabic, Hebrew and accented
  *    Latin all index — the original `[a-z0-9]` alphabet silently
  *    empty-analyzed every non-Latin script), CJK runs (Han/
  *    Hiragana/Katakana/Hangul) emit overlapping character bigrams
  *    (the Lucene CJKAnalyzer strategy — space-less scripts cannot
  *    word-split), plus an optional stopword set. The reference's own
  *    normalization recipe (/root/reference/etl/extract.py:107-114)
  *    applied to document text: `"Spark,"`, `"SPARK"` and `"spárk"`
  *    all index and query as `spark`; `"МОСКВА"` and `"москва"` as
  *    `москва`; `"東京都"` as the bigrams `東京`,`京都`. ASCII text
  *    tokenizes byte-identically to the pre-round-13 alphabet. This
  *    is the DEFAULT for new indexes — raw text is the common case,
  *    pre-tokenized the exception.
  *
  * Position semantics under Unicode: positions are 1-based offsets in
  * the ANALYZED token stream with stopword slots RETAINED (a stopword
  * occupies its position but produces no posting) — so phrase
  * adjacency reflects the original text, the Lucene StopFilter
  * position-increment rule. `dl` counts every analyzed slot, stopwords
  * included (BM25 length = document length, not index size).
  *
  * Cross-engine exactness: the Column pipeline and [[analyzeTerms]]
  * share [[graft.functions.AccentFold.fold]] + UTF8String lowercasing
  * + the [[graft.functions.AnalyzeTokens]] scanner, and DuckDB
  * replays the whole analysis — fold as `strip_accents`, non-CJK
  * tokens as a `[^\p{L}\p{Nd}]+` split (CJK runs blanked first, final
  * sigma normalized medial), CJK bigrams via `range()`/`substr` per
  * extracted run — q203 (Latin) and q207 (Cyrillic/Greek/CJK) pin the
  * equality end-to-end.
  */
sealed trait Analyzer {
  /** Policy id recorded in the corpus row. */
  def kind: String

  /** Stopword set (empty for whitespace), recorded in the corpus row
    * sorted so the stored row is deterministic.
    */
  def stopwords: Seq[String]

  /** The analyzed token-slot array of a text column: positions index
    * this array (1-based), `dl` is its size. May contain stopwords —
    * [[isIndexed]] decides which slots produce postings.
    */
  def slots(text: Column): Column

  /** Whether an analyzed slot produces a posting row. */
  def isIndexed(term: Column): Column

  /** Driver-side query analysis: fold + tokenize each input term
    * exactly as [[slots]] does, DROPPING stopwords (the Lucene
    * query-side StopFilter: a stopword contributes no postings, so it
    * cannot score). A term carrying punctuation may analyze to several
    * tokens. Whitespace is the identity.
    */
  def analyzeTerms(terms: Seq[String]): Seq[String]

  /** Query analysis for PHRASES: stopwords are REFUSED loudly rather
    * than dropped — dropping one would silently change which positions
    * count as adjacent, and the index holds no postings to match the
    * slot the stopword occupies.
    */
  def analyzePhrase(words: Seq[String]): Seq[String]

  /** The analyzed TEXT of `text` under this policy: the indexed token
    * stream re-joined by single spaces — the normalization pre-step
    * the MODEL stack (NaiveBayes, Dsir, Bpe, UnigramLm, Vocab and the
    * CorpusIngest stages) runs before its whitespace tokenization, so
    * ONE recorded policy governs model features exactly as it governs
    * index postings. Analyzed tokens contain no spaces by
    * construction, so `split(normalize(text), " ")` IS the analyzed
    * token stream and the downstream whitespace machinery (token
    * explodes, n-gram windows, WeightedTokenSum folds, BPE word
    * counts) needs no other change. [[Analyzer.Whitespace]] is the
    * IDENTITY — pre-tokenized corpora and every pre-analyzer
    * persisted model stay byte-compatible, plan included.
    */
  def normalize(text: Column): Column

  /** The NON-EMPTY indexed tokens of `text` as an array — equal to
    * `filter(split(normalize(text), " "), length > 0)` by construction
    * (analyzed tokens contain no spaces), minus the join+resplit
    * roundtrip [[normalize]] pays on the Unicode path. The model
    * stack's filtered tokenizers (NB counts, DSIR features, BPE/Vocab/
    * UnigramLm words) consume this; [[normalize]] stays the contract
    * where a STRING is required (HashedNgramScore) or where the
    * unfiltered split's semantics are pinned (NaiveBayes.score's
    * raw-under-unicode ≡ twin-under-whitespace equivalence).
    */
  def tokens(text: Column): Column
}

object Analyzer {

  /** Split on single spaces, verbatim tokens — pre-tokenized corpora
    * and pre-analyzer on-disk indexes. `slots` is exactly the
    * pre-analyzer expression (split on " ", empty slots retained and
    * counted in dl), so legacy indexes and plans are byte-identical.
    */
  case object Whitespace extends Analyzer {
    val kind = "whitespace"
    val stopwords: Seq[String] = Nil
    def slots(text: Column): Column = split(text, " ")
    def isIndexed(term: Column): Column = length(term) > 0
    def analyzeTerms(terms: Seq[String]): Seq[String] = terms
    def analyzePhrase(words: Seq[String]): Seq[String] = words
    def normalize(text: Column): Column = text
    def tokens(text: Column): Column =
      filter(split(text, " "), t => length(t) > 0)
  }

  /** Accent fold → lowercase → script-aware tokenize (Unicode
    * letter/digit runs; CJK bigrams) → drop empties, with an optional
    * stopword set. See the trait doc for position and stopword
    * semantics.
    */
  final case class Unicode(stopwords: Seq[String] = Nil) extends Analyzer {
    val kind = "unicode"
    private val stopSet = stopwords.toSet

    def slots(text: Column): Column = AnalyzeTokens.analyzeTokens(text)

    def isIndexed(term: Column): Column =
      if (stopwords.isEmpty) length(term) > 0
      else length(term) > 0 && !term.isin(stopwords.sorted: _*)

    def analyzeTerms(terms: Seq[String]): Seq[String] =
      terms.flatMap(foldSplit).filterNot(stopSet)

    def analyzePhrase(words: Seq[String]): Seq[String] = {
      val toks = words.flatMap(foldSplit)
      val stopped = toks.filter(stopSet)
      require(stopped.isEmpty,
        s"phrase contains stopwords ${stopped.distinct.mkString(", ")} — " +
          "the index holds no postings for their slots; rephrase the " +
          "query or rebuild without a stopword set")
      toks
    }

    def normalize(text: Column): Column =
      concat_ws(" ", filter(slots(text), t => isIndexed(t)))
    def tokens(text: Column): Column =
      filter(slots(text), t => isIndexed(t))
  }

  /** Driver-side twin of [[Unicode.slots]] minus the stopword step —
    * the SAME [[graft.functions.AnalyzeTokens]] kernel the Column
    * pipeline runs, so index-side and query-side analysis can never
    * diverge.
    */
  def foldSplit(s: String): Seq[String] =
    AnalyzeTokens.tokens(UTF8String.fromString(s))
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq

  /** Reconstruct the recorded policy from corpus-row fields. */
  def of(kind: String, stopwords: Seq[String]): Analyzer = kind match {
    case Whitespace.kind => Whitespace
    case "unicode" => Unicode(stopwords)
    case other => sys.error(s"unknown analyzer kind '$other' — this " +
      "index was written by a newer library version")
  }

  /** Persist a MODEL's analysis policy as a one-row sidecar table at
    * `dir` (kind STRING, stopwords ARRAY<STRING>) — the model-stack
    * twin of the inverted index's corpus-row recording: train writes
    * it once, and every apply/extend path reads the policy back
    * instead of taking an analyzer parameter, so a model can never be
    * scored or extended under a tokenization different from the one
    * its statistics were counted with.
    */
  def save(spark: org.apache.spark.sql.SparkSession, az: Analyzer,
           dir: String): Unit = {
    import spark.implicits._
    graft.etl.Load.replaceTable(spark,
      Seq((az.kind, az.stopwords.sorted)).toDF("kind", "stopwords"),
      dir)
    ()
  }

  /** Read a model's recorded policy back; a model WITHOUT the sidecar
    * (persisted before analyzers reached the model stack) tokenized
    * by raw whitespace — [[Whitespace]], byte-compatible.
    */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): Analyzer =
    graft.etl.Load.readTable(spark, dir).map { df =>
      val r = df.head()
      of(r.getAs[String]("kind"),
        Option(r.getAs[scala.collection.Seq[String]]("stopwords"))
          .map(_.toSeq).getOrElse(Nil))
    }.getOrElse(Whitespace)
}
