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

  /** Non-empty tokens under the model's analysis policy —
    * Analyzer.normalize then the whitespace split (identity chain for
    * Whitespace: pre-analyzer models byte-compatible, plan included).
    */
  private def toks(az: Analyzer)(c: Column): Column = az.tokens(c)

  /** Unigram+bigram feature strings of `text`. The bigram list is
    * guarded for <2-token docs — `sequence(1, 0)` steps DOWN in Spark
    * and would index `t[0]`.
    */
  private def featArray(text: Column, az: Analyzer): Column = {
    val t = toks(az)(text)
    val bi = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    concat(t, bi)
  }

  /** Hashed feature buckets of `text`, as an array<string> of decimal
    * bucket ids in [0, buckets) — the CROSS-ENGINE (md5) path the
    * DuckDB oracles replay.
    */
  def featureBuckets(text: Column, buckets: Int,
                     az: Analyzer = Analyzer.Whitespace): Column =
    transform(featArray(text, az), f =>
      (conv(substring(md5(f), 1, 8), 16, 10).cast(LongType) % buckets)
        .cast(StringType))

  /** PRODUCTION bucket path: xxhash64 instead of md5 — one 64-bit mix
    * per feature against md5's full 128-bit digest + hex + base
    * conversion, which is the dominant cost of a scan-speed scorer at
    * corpus scale (the Stress A/B records the ratio). NOT replayable
    * by the DuckDB oracle (no xxhash64 there), so oracle-gated queries
    * keep md5 and this path is spec-gated: same dense-model algebra,
    * only the bucket hash differs. The hash KIND is recorded in the
    * model's meta at train time and [[score]] follows the recorded
    * kind — a model can never be scored under the wrong hash.
    */
  def featureBucketsFast(text: Column, buckets: Int,
                         az: Analyzer = Analyzer.Whitespace): Column =
    transform(featArray(text, az), f =>
      pmod(xxhash64(f), lit(buckets.toLong)).cast(StringType))

  private def bucketsOf(text: Column, buckets: Int, fast: Boolean,
                        az: Analyzer): Column =
    if (fast) featureBucketsFast(text, buckets, az)
    else featureBuckets(text, buckets, az)

  /** The hash kind recorded in a model's meta row. Models persisted
    * before the kind was recorded have no `hash` column — they were
    * trained under md5 (the only hash that existed then), so default
    * to it instead of throwing on load.
    */
  private def metaHash(meta: org.apache.spark.sql.Row): String =
    if (meta.schema.fieldNames.contains("hash"))
      meta.getAs[String]("hash")
    else "md5"

  /** Per-bucket feature counts of a (text) frame: (bucket, `name`). */
  private def bucketCounts(df: DataFrame, buckets: Int, name: String,
                           fast: Boolean, az: Analyzer): DataFrame = df
    .select(explode(bucketsOf(col("text"), buckets, fast, az)).as("bucket"))
    .groupBy(col("bucket")).agg(count(lit(1)).as(name))

  /** Train the importance model: persists `dir`/model with EXACTLY
    * `buckets` rows (bucket BIGINT, cnt_target, cnt_raw, lr_micro) and
    * `dir`/meta (tot_target, tot_raw, buckets). `target` and `raw` need
    * a `text` column. The analysis policy is RECORDED in the model's
    * `analyzer` sidecar — [[extend]] and [[score]] follow it, like the
    * hash kind. Default Whitespace: pre-analyzer models and every
    * existing fixture, byte-compatible.
    */
  def train(spark: SparkSession, target: DataFrame, raw: DataFrame,
            dir: String, buckets: Int, fast: Boolean = false,
            analyzer: Analyzer = Analyzer.Whitespace): Unit = {
    // sidecar FIRST — the NaiveBayes.train crash-ordering rationale
    Analyzer.save(spark, analyzer, s"$dir/analyzer")
    fitFromCounts(spark,
      bucketCounts(target, buckets, "bt", fast, analyzer),
      bucketCounts(raw, buckets, "br", fast, analyzer),
      baseCounts = None, dir, buckets, fast)
  }

  /** Fold batches of target and/or raw documents into the persisted
    * model — EXACTLY what [[train]] on (target ∪ targetBatch,
    * raw ∪ rawBatch) would produce, bit for bit (bucket counts are
    * additive sufficient statistics, the log-ratio re-derives from
    * the merged integers), at O(batch + buckets) cost: the batches
    * pay their own feature explode, the merge joins B-row count
    * frames, and the historical corpora are never re-read. The batch
    * features are hashed with the kind RECORDED in meta, so an
    * md5-trained model extends under md5 and a fast-trained one
    * under xxhash64.
    */
  def extend(spark: SparkSession, targetBatch: DataFrame,
             rawBatch: DataFrame, dir: String): Unit = {
    val meta = Load.readTable(spark, s"$dir/meta").getOrElse(
      sys.error(s"Dsir.extend: no model at $dir/meta")).head()
    val buckets = meta.getAs[Long]("buckets").toInt
    val fast = metaHash(meta) == "xxhash64"
    // the batch analyzes under the RECORDED policy — like the hash
    // kind, a mismatch would silently corrupt the additive counts
    val az = Analyzer.load(spark, s"$dir/analyzer")
    val old = Load.readTable(spark, s"$dir/model").getOrElse(
      sys.error(s"Dsir.extend: no model at $dir/model"))
      .select(col("bucket"), col("cnt_target"), col("cnt_raw"))
    fitFromCounts(spark,
      bucketCounts(targetBatch, buckets, "bt", fast, az),
      bucketCounts(rawBatch, buckets, "br", fast, az),
      baseCounts = Some(old), dir, buckets, fast)
  }

  /** Derive and persist the model from (batch) bucket counts plus an
    * optional base count table. The merged dense counts are EXACTLY
    * `buckets` rows, so they are collected ONCE (the model IS the
    * driver-sized artifact — [[score]] already collects it) and the
    * totals + log-ratios derive on the driver: one corpus-scale job,
    * no cache (a cache-rebuild failure at 100M docs surfaced as a
    * Spark-internal NPE in CachedRDDBuilder's error path that masked
    * the real fault), and the persisted writes have NO lineage over
    * the base table — a recompute during the dir/model swap is
    * structurally impossible, not just ordered away (the NB
    * write-order lesson, strengthened). The log-ratio replicates the
    * engine formula bit-exactly: Double division, `math.log`, and
    * HALF_UP rounding at 1e6 via BigDecimal — the same ladder
    * Spark's `round((log(a)-log(b))*1e6, 0)` executes — so models
    * written before and after this change are byte-identical.
    */
  private def fitFromCounts(spark: SparkSession, batchT: DataFrame,
                            batchR: DataFrame,
                            baseCounts: Option[DataFrame], dir: String,
                            buckets: Int, fast: Boolean): Unit = {
    val base = baseCounts.getOrElse(
      spark.range(buckets).select(col("id").as("bucket"),
        lit(0L).as("cnt_target"), lit(0L).as("cnt_raw")))
    val dense = base
      .join(batchT.withColumn("bucket", col("bucket").cast(LongType)),
        Seq("bucket"), "left")
      .join(batchR.withColumn("bucket", col("bucket").cast(LongType)),
        Seq("bucket"), "left")
      .select(col("bucket"),
        (col("cnt_target") + coalesce(col("bt"), lit(0L))).as("cnt_target"),
        (col("cnt_raw") + coalesce(col("br"), lit(0L))).as("cnt_raw"))
      .collect()                       // exactly `buckets` rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    require(dense.length == buckets,
      s"Dsir: merged counts have ${dense.length} rows, expected $buckets")
    val totT = dense.iterator.map(_._2).sum
    val totR = dense.iterator.map(_._3).sum
    def lrMicro(ct: Long, cr: Long): Long = {
      val x = (math.log((ct + 1).toDouble / (totT + buckets).toDouble) -
        math.log((cr + 1).toDouble / (totR + buckets).toDouble)) * 1e6
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    }
    import spark.implicits._
    Load.replaceTable(spark,
      dense.toSeq.map { case (b, ct, cr) => (b, ct, cr, lrMicro(ct, cr)) }
        .toDF("bucket", "cnt_target", "cnt_raw", "lr_micro"),
      s"$dir/model")
    Load.replaceTable(spark,
      Seq((totT, totR, buckets.toLong, if (fast) "xxhash64" else "md5"))
        .toDF("tot_target", "tot_raw", "buckets", "hash"),
      s"$dir/meta")
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
    // follow the hash kind the model was TRAINED under (recorded in
    // meta) — scoring under the other hash would be silent garbage —
    // and the recorded analysis policy, for the same reason
    val fast = metaHash(meta) == "xxhash64"
    val az = Analyzer.load(spark, s"$dir/analyzer")
    if (fast) {
      // FUSED path: the model is dense over [0, B), so it rides as a
      // flat long[] and the whole tokenize→hash→lookup→sum fold is
      // one codegen pass over the raw text bytes (HashedNgramScore —
      // no per-feature bucket strings, no hash table; the Stress A/B
      // records the wall delta vs the md5 Column formulation)
      val arr = new Array[Long](buckets)
      Load.readTable(spark, s"$dir/model").get
        .select(col("bucket"), col("lr_micro"))
        .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      docs
        .withColumn("__s", graft.functions.HashedNgramScore
          .hashedNgramScore(az.normalize(col("text")), buckets, arr, 0L))
        .withColumn("n_feats", col("__s.n_feats"))
        .withColumn("lr_micro", col("__s.lr_micro"))
        .drop("__s")
    } else {
      // FUSED md5 path (the oracle-exact hash): same dense-model fold
      // as the fast path, one codegen pass over the normalized text —
      // the Column formulation allocated a feature string, a 32-hex
      // digest string and a decimal bucket string per feature just to
      // probe a UTF8String hash table (Md5NgramScore doc; DsirSpec
      // pins the equivalence)
      val arr = new Array[Long](buckets)
      Load.readTable(spark, s"$dir/model").get
        .select(col("bucket"), col("lr_micro"))
        .collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
      docs
        .withColumn("__s", graft.functions.Md5NgramScore
          .md5NgramScore(az.normalize(col("text")), buckets, arr, 0L))
        .withColumn("n_feats", col("__s.n_feats"))
        .withColumn("lr_micro", col("__s.lr_micro"))
        .drop("__s")
    }
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
