package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** DSIR — Data Selection with Importance Resampling (Xie et al.,
  * NeurIPS 2023): select pretraining data whose hashed-n-gram
  * distribution matches a high-quality TARGET corpus. The published
  * estimator is two bag-of-hashed-ngram models (target p, raw q) over
  * B hash buckets; a document's importance is
  * log w(x) = Σ_f count_f(x) · (ln p_f − ln q_f), and the top-weighted
  * pool is kept. This is the third classifier-style curation gate next
  * to the NB quality gate (q154) and the bigram-LM perplexity filter
  * (q138) — DSIR is the one that needs no labels on the pool side,
  * only a target corpus to match.
  *
  * TRAIN / APPLY split on the q137/q154 warehouse pattern:
  *  - TRAIN counts hashed features of target and raw in one shuffle
  *    each (explode → groupBy(bucket), map-side combined), densifies to
  *    ALL B buckets (so smoothing-only buckets carry their true
  *    log-ratio — there is no OOV at scoring time: every feature hashes
  *    into [0, B)), and persists `dir`/model (bucket, cnt_target,
  *    cnt_raw, lr_micro) + `dir`/meta. Laplace-smoothed log-ratio
  *    lr(b) = ln((c_t(b)+1)/(tot_t+B)) − ln((c_r(b)+1)/(tot_r+B)),
  *    stored as INTEGER MICRO-UNITS — ln runs once, at train, in ONE
  *    engine; the oracle consumes the persisted parquet (the q141
  *    consume-the-model rule) and scoring sums bigints, so the margin
  *    is exact under any partial-aggregation order.
  *  - APPLY is ZERO exchanges: the B-row model rides as a reference
  *    HashMap inside [[graft.functions.WeightedTokenSum]] (one codegen
  *    pass over the feature array; the Column `element_at`-on-literal
  *    form is an O(B) scan per lookup), and every document scores
  *    map-side.
  *  - SELECT is the deterministic resampling variant: per-source rank
  *    by (score desc, md5 tiebreak) and keep floor(n_source·fracPct/100)
  *    (integer-exact via rank·100 ≤ n·pct, matching [[selectTop]]) — one
  *    window shuffle PARTITIONED BY source, never a global sort. The
  *    paper's Gumbel-top-k draws noise from ln(−ln(u)); a per-shard
  *    deterministic top-k keeps the source mixture, scales (group
  *    state is O(1) per row), and is exactly replayable cross-engine.
  *
  * Features are unigrams + bigrams of whitespace tokens hashed with the
  * cross-engine-stable md5 bucket (`conv(substr(md5(f),1,8),16,10) % B`
  * ≡ DuckDB `CAST('0x' || substr(md5(f),1,8) AS BIGINT) % B`). Bucket
  * ids travel as STRINGS so the scorer reuses WeightedTokenSum's
  * UTF8String hash table unchanged.
  *
  * Scale (100 TB): train shuffles (corpus-token → B)-bounded partial
  * counts; the model is B rows ≈ KBs (driver-bounded collect, the
  * centroid pattern); scoring is scan-speed expression work; selection
  * is one per-source window. Nothing is corpus-sized on the driver.
  */
object Dsir {

  /** Non-empty whitespace tokens. */
  private def toks(c: Column): Column =
    filter(split(c, " "), t => length(t) > 0)

  /** Hashed unigram+bigram feature buckets of `text`, as an
    * array<string> of decimal bucket ids in [0, buckets). The bigram
    * list is guarded for <2-token docs — `sequence(1, 0)` steps DOWN
    * in Spark and would index `t[0]`.
    */
  def featureBuckets(text: Column, buckets: Int): Column = {
    val t = toks(text)
    val bi = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    transform(concat(t, bi), f =>
      (conv(substring(md5(f), 1, 8), 16, 10).cast(LongType) % buckets)
        .cast(StringType))
  }

  /** Per-bucket feature counts of a (text) frame: (bucket, `name`). */
  private def bucketCounts(df: DataFrame, buckets: Int,
                           name: String): DataFrame = df
    .select(explode(featureBuckets(col("text"), buckets)).as("bucket"))
    .groupBy(col("bucket")).agg(count(lit(1)).as(name))

  /** Train the importance model: persists `dir`/model with EXACTLY
    * `buckets` rows (bucket BIGINT, cnt_target, cnt_raw, lr_micro) and
    * `dir`/meta (tot_target, tot_raw, buckets). `target` and `raw` need
    * a `text` column.
    */
  def train(spark: SparkSession, target: DataFrame, raw: DataFrame,
            dir: String, buckets: Int): Unit = {
    val dense = spark.range(buckets).select(
        col("id").cast(StringType).as("bucket"))
      .join(bucketCounts(target, buckets, "cnt_target"), Seq("bucket"), "left")
      .join(bucketCounts(raw, buckets, "cnt_raw"), Seq("bucket"), "left")
      .select(col("bucket").cast(LongType).as("bucket"),
        coalesce(col("cnt_target"), lit(0L)).as("cnt_target"),
        coalesce(col("cnt_raw"), lit(0L)).as("cnt_raw"))
      .cache()
    val t = dense.agg(sum(col("cnt_target")), sum(col("cnt_raw"))).head()
    val (totT, totR) = (t.getLong(0), t.getLong(1))
    val model = dense.select(col("bucket"), col("cnt_target"), col("cnt_raw"),
      round((log((col("cnt_target") + 1) / (lit(totT) + lit(buckets))) -
             log((col("cnt_raw") + 1) / (lit(totR) + lit(buckets)))) * 1e6, 0)
        .cast(LongType).as("lr_micro"))
    Load.replaceTable(spark, model, s"$dir/model")
    import spark.implicits._
    Load.replaceTable(spark,
      Seq((totT, totR, buckets.toLong))
        .toDF("tot_target", "tot_raw", "buckets"),
      s"$dir/meta")
    dense.unpersist()
    ()
  }

  /** Score a (…, text) frame against the persisted model: adds
    * n_feats (unigrams + bigrams) and lr_micro (Σ lr over ALL
    * features, exact BIGINT — the model is dense over [0, B), so every
    * feature finds its bucket row). Zero exchanges.
    */
  def score(spark: SparkSession, docs: DataFrame, dir: String): DataFrame = {
    val meta = Load.readTable(spark, s"$dir/meta").getOrElse(
      sys.error(s"Dsir.score: no model at $dir/meta")).head()
    val buckets = meta.getAs[Long]("buckets").toInt
    val w = Load.readTable(spark, s"$dir/model").get
      .select(col("bucket").cast(StringType), col("lr_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    docs
      .withColumn("__s", graft.functions.WeightedTokenSum.weightedTokenSum(
        featureBuckets(col("text"), buckets), w, 0L))
      .withColumn("n_feats", col("__s.n_tokens"))
      .withColumn("lr_micro", col("__s.margin_micro"))
      .drop("__s")
  }

  /** Deterministic per-source importance selection over a scored
    * frame: keep the floor(n·fracPct/100) highest-lr docs of each
    * `srcCol` group (integer-exact via rank·100 ≤ n·pct — no
    * division in either engine), md5-of-id tie-break (unbiased — not
    * first-N). Adds sel_rank and is_selected.
    */
  def selectTop(scored: DataFrame, srcCol: String, idCol: String,
                fracPct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(srcCol)).orderBy(
      col("lr_micro").desc, md5(col(idCol).cast(StringType)).asc)
    scored
      .withColumn("sel_rank", row_number().over(w).cast(LongType))
      .withColumn("is_selected", col("sel_rank") * 100 <=
        count(lit(1)).over(Window.partitionBy(col(srcCol))) * fracPct)
  }
}
