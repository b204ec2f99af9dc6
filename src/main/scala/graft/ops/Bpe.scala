package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Distributed byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") with
  * a TRAIN / APPLY split — the subword upgrade of [[Vocab]]'s
  * word-level tokenizer, and the tokenizer a production LLM pipeline
  * actually counts with.
  *
  * Scale shape. Training touches the corpus exactly ONCE: the
  * [[wordCounts]] groupBy is the only corpus-scale shuffle. Every merge
  * round after that operates on the cached DISTINCT-WORD frame (word,
  * cnt) — pair counting and the argmax scale with the word-vocabulary
  * size and word length, never with corpus row count, so doubling the
  * corpus changes only the one bootstrap shuffle. Per round, exactly
  * one 1-row argmax crosses to the driver (the k×dim-model precedent).
  *
  * Cross-engine replayable by construction. A word's segmentation
  * state is ONE string: symbols joined by a double space, with a
  * double-space border ("  h  e  y  </w>  "). Applying the merge
  * (l, r) is then the plain string replacement
  * " l  r " → " lr " — both Spark and DuckDB scan left-to-right
  * non-overlapping, which is exactly BPE's greedy merge pass, and the
  * shared single border space between adjacent occurrences makes
  * back-to-back pairs merge identically in both engines. The APPLY is
  * therefore a fold of codegen'd string replaces (no UDF, no
  * higher-order aggregate), and a DuckDB oracle can re-derive the full
  * segmentation lexicon from the persisted merges table with a
  * recursive CTE over merge ranks.
  *
  * Persisted artifacts (the q137 warehouse pattern):
  *  - merges:  (rank, left_sym, right_sym, merged) — the ranked merge
  *    list; the tokenizer's entire trained state.
  *  - lexicon: (word, toks) — precomputed segmentations (the tokenizer
  *    cache); encode = broadcast join + doc-local flatten.
  */
object Bpe {

  /** (word, cnt) of the corpus — the single corpus-scale shuffle.
    * `az` is the analysis policy the words tokenize under
    * (Analyzer.normalize then the whitespace split — identity chain
    * for the Whitespace default, so pre-analyzer tokenizers are
    * byte-compatible, plan included). The tokenizer has no persisted
    * meta table of its own — its merges table IS a bare parquet dir —
    * so the policy travels as a parameter and warehouse callers
    * (CorpusIngest) record it in their own sidecar and thread it
    * through train and encode alike.
    */
  def wordCounts(docs: DataFrame,
                 az: Analyzer = Analyzer.Whitespace): DataFrame = docs
    .select(explode(split(az.normalize(col("text")), " ")).as("word"))
    .filter(length(col("word")) > 0)
    .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Initial segmentation state of a word: every character a symbol,
    * plus the word-end marker. "hey" → "  h  e  y  </w>  ".
    */
  def initState(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "), lit("</w>  "))

  /** One greedy left-to-right merge pass of (l, r) over a state
    * string: " l  r " → " lr ". Codegen'd string replace.
    */
  def mergePass(state: Column, l: String, r: String): Column =
    replace(state, lit(s" $l  $r "), lit(s" $l$r "))

  /** Fold a ranked merge list over a word's initial state — the full
    * BPE apply as nested codegen'd replaces.
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(initState(word)) { case (s, (l, r)) => mergePass(s, l, r) }

  /** Subword tokens of a word under `merges`: array of symbols. */
  def segment(word: Column, merges: Seq[(String, String)]): Column =
    split(trim(applyMerges(word, merges)), "  ")

  /** Train up to `numMerges` merges on `docs`. Deterministic: the
    * round's winner is (pair count desc, left, right); training stops
    * early when the best pair's weighted count drops below `minFreq`.
    * Returns the ranked merge list.
    *
    * The corpus is touched exactly ONCE (the [[wordCounts]] shuffle);
    * everything after operates on the distinct-word frame. When that
    * frame fits the driver (≤ `maxDriverVocab` rows — the standard
    * production shape: BPE trainers run single-process over
    * aggregated word counts, e.g. the HuggingFace/SentencePiece
    * trainers), the merge loop runs LOCALLY: each distributed round
    * costs a full Spark job (vocab-sized aggregate + a 1-row argmax
    * collect), so an M-merge train pays M job round-trips of fixed
    * scheduling cost for KB-scale data — the local loop removes all
    * of them and is bit-identical (same greedy left-to-right merge
    * pass on the same double-space state string, same
    * (count desc, left, right) winner with UTF8String byte order —
    * Spark's string ordering). Above the cap (a 100 TB crawl's word
    * vocabulary) the distributed loop below runs unchanged.
    *
    * Distributed round cost is CONSTANT in the round number: the
    * segmentation state rides along as a column of the cached
    * distinct-word frame and each round applies only the NEWEST merge
    * to it (one codegen'd replace), instead of re-folding the full
    * merge list from the raw word — the re-fold makes round k pay k
    * replaces, turning an M-merge train into O(M²·vocab) string work.
    * The state column's expression lineage grows by one replace per
    * round, so every `rematEvery` rounds the frame is rematerialized
    * to parquet (a vocab-sized write, never corpus-sized), truncating
    * the plan before nested-expression depth bites at production merge
    * counts.
    */
  /** Driver-heap budget for [[trainLocal]]'s resident state, and the
    * per-word estimate charged against it: the padded state string
    * (≈ 3·|word| + 8 chars, 2 bytes each in the JVM) plus tuple/array
    * and per-round pair-map overhead. An eighth of the heap leaves the
    * rest to Spark's own driver structures.
    */
  private[graft] def driverStateBudget: Long =
    Runtime.getRuntime.maxMemory / 8

  private[graft] def estimatedStateBytes(
      words: Iterator[(String, Long)]): Long =
    words.map { case (w, _) => (3L * w.length + 8) * 2 + 120L }.sum

  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            minFreq: Long = 2L, rematEvery: Int = 32,
            az: Analyzer = Analyzer.Whitespace,
            maxDriverVocab: Int = 4000000,
            maxDriverStateBytes: Long = driverStateBudget)
      : Seq[(String, String)] = {
    // one bounded probe: the word frame either fits the driver (cap+1
    // rows at most cross — the row cap is the pre-collect backstop,
    // the BYTE budget below the real driver-memory guard) or the
    // overflow row sends training down the distributed loop. Either
    // way the corpus-scale shuffle runs once.
    val probe = wordCounts(docs, az).limit(maxDriverVocab + 1).collect()
    if (probe.length <= maxDriverVocab) {
      val wordCnts = probe.map(r => (r.getString(0), r.getLong(1)))
      // rows were never the right unit (round-14 verdict): 4M long
      // words is driver-OOM territory on a small driver while 4M short
      // words is fine on this one. Charge estimated resident bytes
      // against the driver-derived budget; over it, the distributed
      // loop runs unchanged.
      if (estimatedStateBytes(wordCnts.iterator) <= maxDriverStateBytes)
        return trainLocal(wordCnts, numMerges, minFreq)
    }
    trainDistributed(spark, docs, numMerges, minFreq, rematEvery, az)
  }

  /** Driver-side merge loop — bit-identical to the distributed rounds
    * (see [[train]]): state strings, greedy replace pass, winner order
    * all replicated, with ties broken by UTF8String byte comparison
    * (exactly Spark's string sort order).
    */
  private def trainLocal(wordCnts: Array[(String, Long)], numMerges: Int,
                         minFreq: Long): Seq[(String, String)] = {
    import org.apache.spark.unsafe.types.UTF8String
    // initState replicated: Spark's regexp_replace runs java.util.regex
    // with no flags — use the same engine and pattern verbatim
    val initRe = java.util.regex.Pattern.compile("(.)")
    val states = wordCnts.map { case (w, c) =>
      ("  " + initRe.matcher(w).replaceAll("$1  ") + "</w>  ", c)
    }
    val merges = ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.length < numMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var i = 0
      while (i < states.length) {
        val (st, cnt) = states(i)
        // split(trim(state), "  ") replicated (java String.split on the
        // same regex; symbols never contain spaces)
        val syms = st.trim.split("  ", -1)
        var j = 0
        while (j < syms.length - 1) {
          counts.merge((syms(j), syms(j + 1)), cnt,
            java.lang.Long.sum(_, _))
          j += 1
        }
        i += 1
      }
      // argmax by (pcnt desc, l asc, r asc), strings compared as
      // UTF8String bytes — exactly Spark's two-column sort order
      var bestL: String = null
      var bestR: String = null
      var bestCnt = Long.MinValue
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        val better = c > bestCnt || (c == bestCnt && {
          val dl = UTF8String.fromString(e.getKey._1)
            .compareTo(UTF8String.fromString(bestL))
          dl < 0 || (dl == 0 && UTF8String.fromString(e.getKey._2)
            .compareTo(UTF8String.fromString(bestR)) < 0)
        })
        if (better) {
          bestCnt = c; bestL = e.getKey._1; bestR = e.getKey._2
        }
      }
      if (bestL == null || bestCnt < minFreq) done = true
      else {
        val (l, r) = (bestL, bestR)
        merges += ((l, r))
        val from = s" $l  $r "
        val to = s" $l$r "
        var k = 0
        while (k < states.length) {
          // String.replace = left-to-right non-overlapping literal
          // replace, the same contract as Spark's `replace`
          states(k) = (states(k)._1.replace(from, to), states(k)._2)
          k += 1
        }
      }
    }
    merges.toSeq
  }

  private def trainDistributed(spark: SparkSession, docs: DataFrame,
                               numMerges: Int, minFreq: Long,
                               rematEvery: Int,
                               az: Analyzer): Seq[(String, String)] = {
    val rematDir = java.nio.file.Files
      .createTempDirectory("graft_bpe_train").toString
    // `base` is the frame that actually holds the cache; `words` is
    // base plus at most `rematEvery-1` uncached replace layers
    var base = wordCounts(docs, az)
      .select(col("word"), col("cnt"), initState(col("word")).as("state"))
      .cache()
    var words = base
    try {
      val merges = ArrayBuffer.empty[(String, String)]
      var done = false
      while (!done && merges.length < numMerges) {
        // pairs = adjacent symbols of the CURRENT state column
        val syms = split(trim(col("state")), "  ")
        val pairs = words
          .select(col("cnt"), explode(zip_with(
            slice(syms, lit(1), size(syms) - 1),
            slice(syms, lit(2), size(syms) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("pcnt"))
          .orderBy(col("pcnt").desc, col("l"), col("r"))
          .limit(1).collect() // exactly ONE row per round crosses over
        pairs.headOption match {
          case Some(row) if row.getAs[Long]("pcnt") >= minFreq =>
            val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
            merges += ((l, r))
            val next = words.withColumn("state",
              mergePass(col("state"), l, r))
            if (merges.length % rematEvery == 0) {
              val snap = s"$rematDir/round_${merges.length}"
              next.write.mode("overwrite").parquet(snap)
              base.unpersist()
              base = spark.read.parquet(snap).cache()
              words = base
            } else words = next
          case _ => done = true
        }
      }
      merges.toSeq
    } finally {
      base.unpersist()
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(rematDir))
      ()
    }
  }

  /** Persist the ranked merge list as a warehouse table. */
  def saveMerges(spark: SparkSession, merges: Seq[(String, String)],
                 dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val rows = merges.zipWithIndex.map { case ((l, r), i) =>
      org.apache.spark.sql.Row(i + 1, l, r, l + r)
    }
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left_sym", StringType, nullable = false),
      StructField("right_sym", StringType, nullable = false),
      StructField("merged", StringType, nullable = false)))
    Load.replaceTable(spark,
      spark.createDataFrame(rows.asJava, schema).coalesce(1), dir)
  }

  /** Read a persisted merges table back into rank order. */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    Load.readTable(spark, dir).getOrElse(
      throw new IllegalStateException(s"no merges table at $dir — train first"))
      .orderBy(col("rank")).collect() // bounded: numMerges rows
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq

  /** Segmentation lexicon over a one-column `word` frame: (word, toks).
    * The tokenizer cache — encode against it is a broadcast join.
    */
  def lexicon(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    words.select(col("word"), segment(col("word"), merges).as("toks"))

  /** Encode (doc_id, text) against a persisted lexicon frame: per doc
    * (n_words, n_tokens, toks flattened in token order). Words missing
    * from the lexicon fall back to the doc-local merge fold — the
    * production OOV path; with a corpus-wide lexicon it never fires.
    */
  def encode(docs: DataFrame, lex: DataFrame,
             merges: Seq[(String, String)],
             az: Analyzer = Analyzer.Whitespace): DataFrame = docs
    .select(col("doc_id"),
      posexplode(split(az.normalize(col("text")), " "))
        .as(Seq("pos", "word")))
    .filter(length(col("word")) > 0)
    .join(broadcast(lex.select(col("word"), col("toks"))), Seq("word"), "left")
    .select(col("doc_id"), col("pos"),
      coalesce(col("toks"), segment(col("word"), merges)).as("toks"))
    .groupBy(col("doc_id"))
    .agg(
      count(lit(1)).as("n_words"),
      sum(size(col("toks"))).cast(LongType).as("n_tokens"),
      flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        x => x.getField("toks"))).as("tokens"))
}
