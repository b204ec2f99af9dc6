package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Fasttext-style linear document classifier with a TRAIN / APPLY
  * split — the quality/language gate every production corpus pipeline
  * runs (CCNet classifies against Wikipedia, GPT-3/LLaMA filter
  * CommonCrawl with a linear classifier over reference text; see
  * Wenzek et al., "CCNet", LREC 2020 and Brown et al., 2020 App. A).
  * The model here is multinomial Naive Bayes reduced to its linear
  * form: per-token log-likelihood-ratio weights plus a log-prior, so
  * APPLY is one dot product between a document's token counts and a
  * broadcast weight table.
  *
  * Cross-engine exactness (the q141 "consume the model" rule): weights
  * are persisted as INTEGER MICRO-UNITS (round(1e6·w) as BIGINT).
  * Scoring then sums bigints — associativity-free, so Spark's
  * unordered partial aggregation and DuckDB's single-threaded fold
  * produce bit-identical margins no matter the merge order. The only
  * floating-point work (ln) happens once, at train time, inside ONE
  * engine; the oracle reads the persisted weights/meta parquet and
  * never re-derives a logarithm.
  *
  * Incremental maintenance: NB's sufficient statistics are ADDITIVE
  * (per-token class counts + class doc counts), so [[extend]] folds a
  * labeled batch into the persisted counts and re-derives the weights
  * exactly — extend(batch) ≡ retraining on corpus ∪ batch, bit for
  * bit (NaiveBayesSpec pins the parity). That is the production
  * "update the gate nightly" shape: the fold shuffles vocab-sized
  * count rows, never the historical corpus.
  *
  * Scale design (100 TB):
  *  - TRAIN is one shuffle: explode tokens → groupBy(token) with
  *    map-side partial counts; class totals ride the same pass as a
  *    1-row aggregate. The vocabulary is capped top-V (count desc,
  *    token asc — deterministic), so the model is V rows ≈ KBs; the
  *    FULL count table (the extend state) is corpus-vocabulary-sized,
  *    the same class of compressed stat as q137's vocab.
  *  - APPLY is ZERO shuffles: the V-row model becomes a map literal
  *    (driver-bounded collect, the centroid-broadcast pattern) and
  *    scoring is pure expression work — `aggregate` over the token
  *    array inside whole-stage codegen. Every document scores
  *    map-side; no join, no exchange.
  */
object NaiveBayes {

  /** Non-empty tokens of `text` under the model's recorded analysis
    * policy: the analyzer normalizes (fold/tokenize/stopword — the
    * identity for Whitespace, so pre-analyzer models are
    * byte-compatible, plan included) and the whitespace split then
    * IS the analyzed token stream (Analyzer.normalize's contract).
    */
  private def toks(az: Analyzer)(c: Column): Column = az.tokens(c)

  /** (token, cnt_pos, cnt_neg) of a labeled frame — the mergeable
    * sufficient statistics. One shuffle, map-side combined.
    */
  private def tokenCounts(labeled: DataFrame, az: Analyzer): DataFrame =
    labeled
      .select(explode(toks(az)(col("text"))).as("token"), col("label"))
      .groupBy(col("token")).agg(
        sum(when(col("label"), 1L).otherwise(0L)).as("cnt_pos"),
        sum(when(col("label"), 0L).otherwise(1L)).as("cnt_neg"))

  /** (n_pos_docs, n_neg_docs) of a labeled frame. */
  private def docCounts(labeled: DataFrame): (Long, Long) = {
    val d = labeled.agg(
      sum(when(col("label"), 1L).otherwise(0L)),
      sum(when(col("label"), 0L).otherwise(1L))).head()
    (d.getLong(0), d.getLong(1))
  }

  /** Derive and persist the model from count statistics: `dir`/counts
    * (full merge state), `dir`/weights (top-V scoring rows:
    * token, cnt_pos, cnt_neg, weight_micro), `dir`/meta (1 row:
    * n_pos_docs, n_neg_docs, tot_pos, tot_neg, vocab_v, prior_micro).
    * Laplace-smoothed multinomial NB:
    * w(t) = ln((c_pos(t)+1)/(tot_pos+V)) − ln((c_neg(t)+1)/(tot_neg+V)),
    * prior = ln(n_pos_docs) − ln(n_neg_docs), both stored ×1e6 rounded.
    */
  private def fitFromCounts(spark: SparkSession, counts0: DataFrame,
                            nPos: Long, nNeg: Long, dir: String,
                            vocabCap: Int): Unit = {
    // a single-class batch would drive ln(0) = -Inf through the prior
    // and persist a garbage model with no error — fail loudly instead
    require(nPos > 0 && nNeg > 0,
      s"NaiveBayes: both classes need >=1 document (got pos=$nPos, neg=$nNeg)")
    // cached AND materialized by the totals agg below BEFORE any table
    // swap: (a) the count frame feeds the totals, the top-V cut and
    // the state write — uncached, each consumer re-runs the full
    // corpus explode (measured 168 s → 1 cached pass at 1M docs);
    // (b) in the extend path counts0 READS dir/counts, the very table
    // replaceTable swaps below — the q136 eager-before-merge contract
    val counts = counts0.cache()
    // class token totals over the WHOLE corpus (standard multinomial
    // denominator) — one 1-row aggregate over the cached counts
    val t = counts.agg(sum(col("cnt_pos")).as("tot_pos"),
      sum(col("cnt_neg")).as("tot_neg")).head()
    val (totPos, totNeg) = (t.getLong(0), t.getLong(1))
    // top-V vocabulary, deterministic tie-break; V feeds the smoothing
    // denominator so it must be the REALIZED vocab size, not the cap
    val vocab = counts.orderBy(col("cnt_pos").+(col("cnt_neg")).desc,
      col("token")).limit(vocabCap)
    val v = vocab.count()
    val weights = vocab.select(col("token"), col("cnt_pos"), col("cnt_neg"),
      round((log((col("cnt_pos") + 1) / (lit(totPos) + lit(v))) -
             log((col("cnt_neg") + 1) / (lit(totNeg) + lit(v)))) * 1e6, 0)
        .cast(LongType).as("weight_micro"))
    // WRITE ORDER MATTERS: weights and meta derive from the cached
    // `counts`, whose lineage (in the extend path) READS dir/counts.
    // Spark caching is best-effort — if cached blocks are evicted
    // mid-write, the consumer recomputes from lineage — so the
    // dir/counts swap must come LAST: any recompute during the
    // weights/meta writes then still reads the PRE-swap counts table
    // instead of silently folding the batch in twice.
    // one file: the weights table is vocabCap-bounded by construction,
    // and a single-file model table serves through the driver-side
    // read path (a 32-part spray of a KB-scale model paid 64 footer
    // opens there and a parallel-scan job otherwise)
    Load.replaceTable(spark, weights.coalesce(1), s"$dir/weights")
    val priorMicro =
      math.round((math.log(nPos.toDouble) - math.log(nNeg.toDouble)) * 1e6)
    import spark.implicits._
    Load.replaceTable(spark,
      Seq((nPos, nNeg, totPos, totNeg, v, priorMicro))
        .toDF("n_pos_docs", "n_neg_docs", "tot_pos", "tot_neg",
          "vocab_v", "prior_micro"),
      s"$dir/meta")
    Load.replaceTable(spark, counts, s"$dir/counts")
    counts.unpersist()
    ()
  }

  /** Train from scratch on a labeled frame (`text` STRING, `label`
    * BOOLEAN — true = positive class), overwriting the model at `dir`.
    * The analysis policy is RECORDED in the model's `analyzer`
    * sidecar (the index corpus-row pattern): [[extend]] and [[score]]
    * read it back, so the model's statistics and every later apply
    * tokenize identically. Default Whitespace — pre-tokenized
    * corpora and every existing fixture, byte-compatible.
    */
  def train(spark: SparkSession, labeled: DataFrame, dir: String,
            vocabCap: Int,
            analyzer: Analyzer = Analyzer.Whitespace): Unit = {
    // sidecar FIRST: a crash mid-train must never leave statistics
    // counted under one policy beside a sidecar defaulting to another
    Analyzer.save(spark, analyzer, s"$dir/analyzer")
    val (nPos, nNeg) = docCounts(labeled)
    fitFromCounts(spark, tokenCounts(labeled, analyzer), nPos, nNeg, dir,
      vocabCap)
  }

  /** Fold a labeled batch into the persisted model — EXACTLY the model
    * [[train]] would produce on corpus ∪ batch (additive sufficient
    * statistics + weights re-derived from the merged integers), at
    * O(batch + vocab) cost: the batch pays its own token explode, the
    * merge shuffles count rows, and the historical corpus is never
    * re-read.
    */
  def extend(spark: SparkSession, labeled: DataFrame, dir: String,
             vocabCap: Int): Unit = {
    val old = Load.readTable(spark, s"$dir/counts").getOrElse(
      sys.error(s"NaiveBayes.extend: no model at $dir/counts"))
    val meta = Load.readTable(spark, s"$dir/meta").get
      .select(col("n_pos_docs"), col("n_neg_docs")).head()
    // the batch tokenizes under the policy RECORDED at train time —
    // an extend analyzing differently would split one token across
    // two spellings and silently corrupt the additive statistics
    val az = Analyzer.load(spark, s"$dir/analyzer")
    val merged = old.union(tokenCounts(labeled, az))
      .groupBy(col("token")).agg(
        sum(col("cnt_pos")).as("cnt_pos"),
        sum(col("cnt_neg")).as("cnt_neg"))
    val (bPos, bNeg) = docCounts(labeled)
    fitFromCounts(spark, merged,
      meta.getLong(0) + bPos, meta.getLong(1) + bNeg, dir, vocabCap)
  }

  /** Score a (doc_id, text, …) frame against the persisted model at
    * `dir`. Zero shuffles: the V-row weights table collapses to a
    * broadcast-embedded hash table (bounded by vocabCap — the
    * centroid-collect pattern) and the whole scoring fold is ONE
    * codegen'd traversal of the token array
    * ([[graft.functions.WeightedTokenSum]] — the Column-API
    * formulation paid an O(V) literal-map scan per lookup and three
    * array walks; measured 12.8 s → see BASELINE for the expression
    * figure at 1M docs). OOV tokens contribute 0 (neutral — they
    * carry no evidence either way under the shared smoothing mass).
    * Output adds: n_tokens, n_hits (in-vocab tokens), margin_micro
    * (prior + Σ weight_micro, exact BIGINT), pred_pos.
    */
  // ---------------------------------------------------------------
  // Multiclass extension — language identification (the CCNet / crawl
  // pipeline first stage: a char-n-gram linear classifier; Cavnar &
  // Trenkle 1994 established character n-grams as THE language-ID
  // feature, fastText langid is the production descendant). Same
  // design rules as the binary model: additive integer sufficient
  // statistics (extendMulti ≡ retrain, bit for bit), integer
  // micro-unit weights persisted once, APPLY with zero exchanges —
  // one WeightedTokenSum fold per class over the same token array,
  // argmax with a deterministic (score desc, label asc) tie-break.
  // ---------------------------------------------------------------

  /** Char n-grams of `c` (spaces included — they carry word-boundary
    * signal), the language-ID feature stream. Empty array when the
    * string is shorter than n. Pure codegen expression work.
    */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** (token, label, cnt) — the mergeable multiclass sufficient
    * statistics of a (tokens ARRAY<STRING>, label STRING) frame. One
    * shuffle, map-side combined.
    */
  private def tokenCountsMulti(labeled: DataFrame): DataFrame = labeled
    .select(explode(col("tokens")).as("token"), col("label"))
    .groupBy(col("token"), col("label"))
    .agg(count(lit(1)).as("cnt"))

  /** (label, n_docs) of a labeled frame — driver rows, |labels|-bounded. */
  private def docCountsMulti(labeled: DataFrame): Seq[(String, Long)] =
    labeled.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)

  /** Derive and persist the multiclass model from count statistics:
    * `dir`/counts (full merge state: token, label, cnt), `dir`/weights
    * (top-V vocabulary × every class: token, label, cnt, weight_micro
    * — the class-absent cells EXIST with cnt 0, carrying the smoothed
    * floor ln(1/(tot_c+V))), `dir`/meta (one row per class: label,
    * n_docs, tot_toks, vocab_v, prior_micro). Laplace-smoothed
    * multinomial NB: w_c(t) = ln((cnt_c(t)+1)/(tot_c+V)),
    * prior_c = ln(n_docs_c) — argmax is invariant to the shared
    * total-docs constant, so it is left out. All stored ×1e6 rounded;
    * OOV tokens contribute 0 in every class at APPLY (the binary
    * model's documented neutral-evidence convention).
    */
  private def fitFromCountsMulti(spark: SparkSession, counts0: DataFrame,
                                 nDocs: Seq[(String, Long)], dir: String,
                                 vocabCap: Int): Unit = {
    require(nDocs.size >= 2,
      s"NaiveBayes multiclass: need >=2 classes, got ${nDocs.map(_._1)}")
    require(nDocs.forall(_._2 > 0),
      s"NaiveBayes multiclass: every class needs >=1 document: $nDocs")
    val counts = counts0.cache()
    val tots: Map[String, Long] = counts.groupBy(col("label"))
      .agg(sum(col("cnt")).as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    import spark.implicits._
    // top-V vocabulary by TOTAL count across classes, deterministic
    // tie-break; V = the realized size (feeds the smoothing mass).
    // Collected ONCE to the driver (V <= vocabCap — bounded) so the
    // sort-limit aggregation job doesn't run twice (once for V, once
    // when the weights materialize)
    val vocabTokens = counts.groupBy(col("token"))
      .agg(sum(col("cnt")).as("tot_tok"))
      .orderBy(col("tot_tok").desc, col("token"))
      .limit(vocabCap).select(col("token")).as[String].collect().toSeq
    val vocab = vocabTokens.toDF("token")
    val v = vocabTokens.size.toLong
    val labelTots = nDocs.map { case (l, _) => (l, tots.getOrElse(l, 0L)) }
      .toDF("label", "tot")
    val weights = vocab.crossJoin(broadcast(labelTots))
      .join(counts, Seq("token", "label"), "left")
      .select(col("token"), col("label"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        round(log((coalesce(col("cnt"), lit(0L)) + 1).cast(DoubleType) /
          (col("tot") + lit(v)).cast(DoubleType)) * 1e6, 0)
          .cast(LongType).as("weight_micro"))
    // same write-order contract as the binary fit: counts swap LAST so
    // an extend-path cache recompute still reads the PRE-swap table
    // one file — same vocabCap bound as the binary fit
    Load.replaceTable(spark, weights.coalesce(1), s"$dir/weights")
    Load.replaceTable(spark,
      nDocs.map { case (l, n) =>
        (l, n, tots.getOrElse(l, 0L), v,
          math.round(math.log(n.toDouble) * 1e6))
      }.toDF("label", "n_docs", "tot_toks", "vocab_v", "prior_micro"),
      s"$dir/meta")
    Load.replaceTable(spark, counts, s"$dir/counts")
    counts.unpersist()
    ()
  }

  /** Train a multiclass model from scratch on a (tokens ARRAY<STRING>,
    * label STRING) frame, overwriting the model at `dir`.
    */
  def trainMulti(spark: SparkSession, labeled: DataFrame, dir: String,
                 vocabCap: Int): Unit =
    fitFromCountsMulti(spark, tokenCountsMulti(labeled),
      docCountsMulti(labeled), dir, vocabCap)

  /** Fold a labeled batch into the persisted multiclass model —
    * EXACTLY the model [[trainMulti]] would produce on corpus ∪ batch
    * (additive integer statistics, weights re-derived), at
    * O(batch + vocab) cost. A class first seen in the batch joins the
    * model; historical documents are never re-read.
    */
  def extendMulti(spark: SparkSession, labeled: DataFrame, dir: String,
                  vocabCap: Int): Unit = {
    val old = Load.readTable(spark, s"$dir/counts").getOrElse(
      sys.error(s"NaiveBayes.extendMulti: no model at $dir/counts"))
    val merged = old.union(tokenCountsMulti(labeled))
      .groupBy(col("token"), col("label"))
      .agg(sum(col("cnt")).as("cnt"))
    val oldDocs = Load.readTable(spark, s"$dir/meta").get
      .select(col("label"), col("n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchDocs = docCountsMulti(labeled).toMap
    val nDocs = (oldDocs.keySet ++ batchDocs.keySet).toSeq.sorted
      .map(l => l -> (oldDocs.getOrElse(l, 0L) + batchDocs.getOrElse(l, 0L)))
    fitFromCountsMulti(spark, merged, nDocs, dir, vocabCap)
  }

  /** Score a frame carrying a `tokens` ARRAY<STRING> column against
    * the persisted multiclass model: adds `pred_label`, `best_micro`
    * (the winning class's prior + Σ weights) and `runnerup_micro` —
    * best − runnerup is the decision margin a curation gate thresholds
    * on. Zero exchanges: one [[graft.functions.WeightedTokenSum]] fold
    * per class over the same token array (|classes| is small — 5
    * languages = 5 codegen'd traversals), argmax via an integer struct
    * min over (−score, label): ties break to the LEXICALLY SMALLEST
    * label, deterministically, in any engine.
    */
  def scoreMulti(spark: SparkSession, docs: DataFrame,
                 dir: String): DataFrame = {
    val w = Load.readTable(spark, s"$dir/weights").getOrElse(
      sys.error(s"NaiveBayes.scoreMulti: no model at $dir/weights"))
      .select(col("label"), col("token"), col("weight_micro"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    val priors = Load.readTable(spark, s"$dir/meta").get
      .select(col("label"), col("prior_micro")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val scored = priors.foldLeft(docs) { case (df, (l, p)) =>
      df.withColumn(s"__s_$l", graft.functions.WeightedTokenSum
        .weightedTokenSum(col("tokens"), w(l), p)
        .getField("margin_micro"))
    }
    val entries = array(priors.map { case (l, _) =>
      struct((-col(s"__s_$l")).as("neg"), lit(l).as("label"))
    }: _*)
    val ranked = array_sort(entries)
    scored
      .withColumn("pred_label",
        element_at(ranked, 1).getField("label"))
      .withColumn("best_micro", -element_at(ranked, 1).getField("neg"))
      .withColumn("runnerup_micro", -element_at(ranked, 2).getField("neg"))
      .drop(priors.map(p => s"__s_${p._1}"): _*)
  }

  def score(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val w = Load.readTable(spark, s"$dir/weights").getOrElse(
      sys.error(s"NaiveBayes.score: no model at $dir/weights"))
      .select(col("token"), col("weight_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val priorMicro = Load.readTable(spark, s"$dir/meta").get
      .select(col("prior_micro")).head().getLong(0)
    // score under the RECORDED policy (identity for Whitespace — the
    // pre-analyzer plan, byte-identical)
    val az = Analyzer.load(spark, s"$dir/analyzer")
    docs
      .withColumn("__s", graft.functions.WeightedTokenSum
        .weightedTokenSum(split(az.normalize(col("text")), " "),
          w.toMap, priorMicro))
      .withColumn("n_tokens", col("__s.n_tokens"))
      .withColumn("n_hits", col("__s.n_hits"))
      .withColumn("margin_micro", col("__s.margin_micro"))
      .withColumn("pred_pos", col("margin_micro") > 0)
      .drop("__s")
  }
}
