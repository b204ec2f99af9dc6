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
  * Scale design (100 TB):
  *  - TRAIN is one shuffle: explode tokens → groupBy(token) with
  *    map-side partial counts; class totals ride the same pass as a
  *    1-row aggregate. The vocabulary is capped top-V (count desc,
  *    token asc — deterministic), so the model is V rows ≈ KBs.
  *  - APPLY is ZERO shuffles: the V-row model becomes a map literal
  *    (driver-bounded collect, the centroid-broadcast pattern) and
  *    scoring is pure expression work — `aggregate` over the token
  *    array inside whole-stage codegen. Every document scores
  *    map-side; no join, no exchange.
  */
object NaiveBayes {

  /** Non-empty whitespace tokens of `text`. */
  private def toks(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Train on a labeled frame (`text` STRING, `label` BOOLEAN — true =
    * positive class) and persist two warehouse tables:
    * `dir`/weights (token, cnt_pos, cnt_neg, weight_micro) and
    * `dir`/meta (1 row: n_pos_docs, n_neg_docs, tot_pos, tot_neg,
    * vocab_v, prior_micro). Laplace-smoothed multinomial NB:
    * w(t) = ln((c_pos(t)+1)/(tot_pos+V)) − ln((c_neg(t)+1)/(tot_neg+V)),
    * prior = ln(n_pos_docs) − ln(n_neg_docs), both stored ×1e6 rounded.
    */
  def train(spark: SparkSession, labeled: DataFrame, dir: String,
            vocabCap: Int): Unit = {
    val tok = labeled
      .select(explode(toks(col("text"))).as("token"), col("label"))
    // cached: the (token, 2 counts) frame feeds BOTH the class totals
    // and the top-V cut — without the cache each consumer re-runs the
    // full corpus explode (measured 168 s → 1 cached pass at 1M docs)
    val counts = tok.groupBy(col("token")).agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("cnt_pos"),
      sum(when(col("label"), 0L).otherwise(1L)).as("cnt_neg")).cache()
    // class token totals over the WHOLE corpus (standard multinomial
    // denominator), doc counts for the prior — one 1-row aggregate
    val t = counts.agg(sum(col("cnt_pos")).as("tot_pos"),
        sum(col("cnt_neg")).as("tot_neg")).head()
    val (totPos, totNeg) = (t.getLong(0), t.getLong(1))
    val d = labeled.agg(
        sum(when(col("label"), 1L).otherwise(0L)),
        sum(when(col("label"), 0L).otherwise(1L))).head()
    val (nPos, nNeg) = (d.getLong(0), d.getLong(1))
    // top-V vocabulary, deterministic tie-break; V feeds the smoothing
    // denominator so it must be the REALIZED vocab size, not the cap
    val vocab = counts.orderBy(col("cnt_pos").+(col("cnt_neg")).desc,
        col("token")).limit(vocabCap)
    val v = vocab.count()
    val weights = vocab.select(col("token"), col("cnt_pos"), col("cnt_neg"),
      round((log((col("cnt_pos") + 1) / (lit(totPos) + lit(v))) -
             log((col("cnt_neg") + 1) / (lit(totNeg) + lit(v)))) * 1e6, 0)
        .cast(LongType).as("weight_micro"))
    Load.replaceTable(spark, weights, s"$dir/weights")
    val priorMicro =
      math.round((math.log(nPos.toDouble) - math.log(nNeg.toDouble)) * 1e6)
    import spark.implicits._
    Load.replaceTable(spark,
      Seq((nPos, nNeg, totPos, totNeg, v, priorMicro))
        .toDF("n_pos_docs", "n_neg_docs", "tot_pos", "tot_neg",
          "vocab_v", "prior_micro"),
      s"$dir/meta")
    counts.unpersist()
  }

  /** Score a (doc_id, text, …) frame against the persisted model at
    * `dir`. Zero shuffles: the V-row weights table collapses to a map
    * literal (bounded by vocabCap — the centroid-collect pattern) and
    * the margin is an integer `aggregate` over the token array in
    * codegen. OOV tokens contribute 0 (neutral — they carry no
    * evidence either way under the shared smoothing mass).
    * Output adds: n_tokens, n_hits (in-vocab tokens), margin_micro
    * (prior + Σ weight_micro, exact BIGINT), pred_pos.
    */
  def score(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val w = Load.readTable(spark, s"$dir/weights").getOrElse(
      sys.error(s"NaiveBayes.score: no model at $dir/weights"))
      .select(col("token"), col("weight_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val priorMicro = Load.readTable(spark, s"$dir/meta").get
      .select(col("prior_micro")).head().getLong(0)
    val wmap = typedlit(w.toMap)
    val tokens = toks(col("text"))
    docs
      .withColumn("n_tokens", size(tokens).cast(LongType))
      .withColumn("n_hits",
        size(filter(tokens, t => element_at(wmap, t).isNotNull))
          .cast(LongType))
      .withColumn("margin_micro",
        aggregate(tokens, lit(priorMicro),
          (acc, t) => acc + coalesce(element_at(wmap, t), lit(0L))))
      .withColumn("pred_pos", col("margin_micro") > 0)
  }
}
