package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Persisted inverted index with incremental maintenance + BM25
  * search — the TEXT-index member of the warehouse-index trio
  * (signature index: IncrementalDedup/q136; vector index: IVF/q148).
  * q144 computes BM25 from raw text per query; a production search
  * path builds the index ONCE and serves every query from it.
  *
  * Layout under `dir`:
  *  - `postings/bucket=B/` — (term, doc_id, tf, dl), hash-partitioned
  *    into [[Buckets]] term buckets. A search for k terms reads ≤ k
  *    bucket dirs (manual partition pruning on driver-computed bucket
  *    literals — the q136 probe trick), never the corpus.
  *  - `corpus/` — 1 row (n_docs, sum_dl), the BM25 globals.
  *
  * Maintenance contract: batches carry NEW doc_ids (the upstream
  * dedup gate's job), so [[addBatch]] is a pure APPEND of the batch's
  * postings — O(batch) work, never O(index); the corpus row merges
  * additively via the crash-safe table swap. Per-term df is NOT
  * materialized: a term's df is exactly the row count of its own
  * postings, which the search touches anyway — so df stays correct
  * under appends for free (a stale materialized df after every batch
  * is the classic search-index bug).
  *
  * Scoring follows q144's cross-engine-exact conventions: rational
  * Robertson idf (no transcendental), k1=1.2 b=0.75, and per-term
  * scores become INTEGER MICRO-UNITS before the per-doc sum, so
  * Spark's partial-aggregation order and DuckDB's fold cannot differ
  * by a ulp.
  */
object InvertedIndex {

  val Buckets = 64

  def bucketOf(term: Column): Column = pmod(hash(term), lit(Buckets))

  /** (term, doc_id, tf, dl, bucket) of a (doc_id, text) frame — one
    * shuffle (groupBy doc_id×term with map-side combine).
    */
  def postings(docs: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    docs
      .select(col("doc_id"), size(t).as("dl"),
        explode(t).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("bucket", bucketOf(col("term")))
  }

  private def corpusRow(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))

  /** Bootstrap the index from a corpus (overwrites `dir`). The
    * repartition clusters each bucket into ONE file — without it,
    * partitionBy fans every write task across all 64 dirs (tasks ×
    * buckets small files, the classic partitioned-write explosion)
    * and the pruned search pays an open per file.
    */
  def build(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    postings(docs).repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    Load.replaceTable(spark, corpusRow(docs), s"$dir/corpus")
  }

  /** Append a batch of NEW documents: postings append into their
    * bucket dirs (O(batch)), corpus globals merge additively through
    * the two-rename swap. Exactly-once under retries comes from the
    * caller's batch-id replay guard (the streaming-runner pattern) —
    * an append-shaped op cannot be made idempotent from inside.
    */
  def addBatch(spark: SparkSession, docs: DataFrame, dir: String): Unit = {
    postings(docs).repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/postings")
    val merged = Load.readTable(spark, s"$dir/corpus") match {
      case Some(old) => old.union(corpusRow(docs))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      case None => corpusRow(docs)
    }
    Load.replaceTable(spark, merged, s"$dir/corpus")
  }

  /** BM25 top-k over the persisted index. Reads ONLY the query
    * terms' bucket dirs + the 1-row corpus table; plan shape is
    * pruned-scan → per-term df window → per-doc integer sum →
    * TakeOrderedAndProject. Output: (doc_id, n_terms, bm25_micro).
    */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
             k: Int): DataFrame = {
    require(terms.nonEmpty && k > 0)
    import spark.implicits._
    val c = Load.readTable(spark, s"$dir/corpus").getOrElse(
      sys.error(s"InvertedIndex.search: no corpus table at $dir")).head()
    val (nDocs, sumDl) = (c.getAs[Long]("n_docs"), c.getAs[Long]("sum_dl"))
    val avgdl = sumDl.toDouble / nDocs
    // bucket literals computed through the SAME hash expression the
    // writer used (a |terms|-row local job — bounded)
    val buckets = terms.toDF("term").select(bucketOf(col("term")))
      .as[Int].collect().distinct.toSeq
    val wTerm = Window.partitionBy(col("term"))
    val idf = (lit(nDocs.toDouble) - col("df") + lit(0.5)) /
      (col("df") + lit(0.5))
    val norm = lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)
    spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*) &&
        col("term").isin(terms: _*))
      .withColumn("df", count(lit(1)).over(wTerm).cast(DoubleType))
      .withColumn("ts_micro",
        round(idf * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * norm) * 1e6, 0).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("ts_micro")).as("bm25_micro"))
      .orderBy(col("bm25_micro").desc, col("doc_id"))
      .limit(k)
  }
}
