package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Persisted-vocabulary tokenization with a TRAIN / APPLY split — the
  * production form of q134's in-query vocab: production tokenization
  * trains a vocabulary once and applies it everywhere, so ids must be
  * STABLE across vocabulary growth (a re-ranked vocab would silently
  * re-map every previously encoded corpus). The vocab is a warehouse
  * table (word, tok_id, cnt):
  *
  *  - [[train]] bootstraps it from a corpus — frequency-ranked top-V,
  *    id = rank (1-based; 0 is reserved for <unk>);
  *  - [[extend]] admits NEW words under NEW ids (max_id + freq-rank
  *    among the additions) and never touches an existing word's id —
  *    the drift contract;
  *  - [[encode]] maps a document frame to id sequences by BROADCAST
  *    joining the vocab (vocab tables are top-V small by construction,
  *    so encoding is map-side at any corpus scale; order is carried by
  *    posexplode positions, never row order).
  */
object Vocab {

  /** Non-empty words of a (doc_id, text) frame under the analysis
    * policy (Analyzer.normalize then the whitespace split — identity
    * chain for Whitespace; the vocab dir is a bare table, so like
    * [[Bpe]] the policy travels as a parameter and the caller keeps
    * it consistent across train/extend/encode).
    */
  private def words(docs: DataFrame, az: Analyzer): DataFrame = docs
    .select(explode(split(az.normalize(col("text")), " ")).as("word"))
    .filter(length(col("word")) > 0)

  private def counts(docs: DataFrame, az: Analyzer): DataFrame =
    words(docs, az).groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Bootstrap the vocab table from `docs`: top-`size` words by
    * (count desc, word), tok_id = rank — assigned on the driver from
    * the limit's order (the frame is vocab-sized by construction).
    */
  def train(spark: SparkSession, docs: DataFrame, dir: String,
            size: Int, az: Analyzer = Analyzer.Whitespace): Long = {
    // tok_id = position in the (cnt desc, word) top-`size` order. The
    // TakeOrderedAndProject limit already returns rows in that exact
    // order, so ids are assigned on the driver over the vocab-sized
    // result — replacing the former unpartitioned row_number window,
    // which funneled the same rows through a single-partition
    // WindowExec (the 100 TB scale cliff flagged in round 14) and cost
    // an extra sort + exchange for ranks the limit order already held.
    val top = counts(docs, az)
      .orderBy(col("cnt").desc, col("word")).limit(size).collect()
    val vocab = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        top.toSeq.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), i + 1, r.getLong(1))
        }).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tok_id", IntegerType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType))))
    Load.replaceTable(spark, vocab, dir)
  }

  /** Admit up to `maxNew` unseen words from `docs` under fresh ids
    * starting at max(tok_id) + 1, ranked by their frequency in `docs`.
    * Existing rows are untouched (the merge's incoming side contains
    * only new words), so every previously issued id stays valid.
    */
  def extend(spark: SparkSession, docs: DataFrame, dir: String,
             maxNew: Int, az: Analyzer = Analyzer.Whitespace): Long = {
    val existing = Load.readTable(spark, dir).getOrElse(
      throw new IllegalStateException(s"no vocab table at $dir — train first"))
    val maxId = existing.agg(max(col("tok_id"))).collect()(0).getInt(0)
    // same driver-side rank assignment as [[train]]: the limit's
    // (cnt desc, word) order IS the rank — no single-partition window
    val top = counts(docs, az)
      .join(broadcast(existing.select(col("word"))), Seq("word"), "left_anti")
      .orderBy(col("cnt").desc, col("word")).limit(maxNew).collect()
    val fresh = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        top.toSeq.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row(r.getString(0), maxId + i + 1,
            r.getLong(1))
        }).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("word",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tok_id", IntegerType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType))))
    Load.upsert(spark, fresh, dir, "word")
  }

  /** Encode (doc_id, text) into per-document id sequences against a
    * vocab frame (typically `Load.readTable(spark, dir).get`): OOV
    * words map to 0; output is (doc_id, ids, n_tokens, n_oov) with
    * `ids` in token order via position sort.
    */
  def encode(docs: DataFrame, vocab: DataFrame,
             az: Analyzer = Analyzer.Whitespace): DataFrame = docs
    .select(col("doc_id"),
      posexplode(split(az.normalize(col("text")), " "))
        .as(Seq("pos", "word")))
    .filter(length(col("word")) > 0)
    .join(broadcast(vocab.select(col("word"), col("tok_id"))),
      Seq("word"), "left")
    .select(col("doc_id"), col("pos"),
      coalesce(col("tok_id"), lit(0)).as("tok_id"))
    .groupBy(col("doc_id"))
    .agg(
      transform(array_sort(collect_list(struct(col("pos"), col("tok_id")))),
        x => x.getField("tok_id")).as("ids"),
      count(lit(1)).as("n_tokens"),
      sum(when(col("tok_id") === 0, 1L).otherwise(0L)).as("n_oov"))
}
