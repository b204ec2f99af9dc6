package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Load
import graft.ops.Dsir

/** DSIR importance model: dense-model invariants, exact integer
  * scoring pinned to the explode+join formulation, the zero-exchange
  * APPLY contract, short-doc feature bounds, and the deterministic
  * per-source selection quota.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("dsir").toString + "/m"

  private val B = 64

  private def fit(dir: String): Unit = Dsir.train(spark,
    Seq("aa bb cc", "aa bb").toDF("text"),
    Seq("aa bb cc", "aa bb", "zz yy xx", "zz yy").toDF("text"),
    dir, buckets = B)

  test("model is dense over all B buckets and counts every feature") {
    val dir = tmp()
    fit(dir)
    val m = Load.readTable(spark, s"$dir/model").get.cache()
    assert(m.count() == B)
    assert(m.select(countDistinct(col("bucket"))).head().getLong(0) == B)
    // target: 3 + 2 unigrams, 2 + 1 bigrams = 8 features; raw doubles it
    val t = m.agg(sum(col("cnt_target")), sum(col("cnt_raw"))).head()
    assert(t.getLong(0) == 8L && t.getLong(1) == 16L)
    val meta = Load.readTable(spark, s"$dir/meta").get.head()
    assert(meta.getAs[Long]("tot_target") == 8L)
    assert(meta.getAs[Long]("tot_raw") == 16L)
    assert(meta.getAs[Long]("buckets") == B.toLong)
    // spot-check the log-ratio algebra from the persisted counts
    m.collect().foreach { r =>
      val exp = math.round((math.log((r.getAs[Long]("cnt_target") + 1d) /
        (8 + B)) - math.log((r.getAs[Long]("cnt_raw") + 1d) / (16 + B))) * 1e6)
      assert(r.getAs[Long]("lr_micro") == exp)
    }
    m.unpersist()
  }

  test("score == explode+join over the persisted model, exactly") {
    val dir = tmp()
    fit(dir)
    val docs = Seq((1L, "aa bb cc"), (2L, "zz yy"), (3L, "qq ww ee rr"))
      .toDF("doc_id", "text")
    val scored = Dsir.score(spark, docs, dir)
      .select(col("doc_id"), col("n_feats"), col("lr_micro"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val joined = docs
      .select(col("doc_id"),
        explode(Dsir.featureBuckets(col("text"), B)).as("bucket"))
      .join(Load.readTable(spark, s"$dir/model").get
        .withColumn("bucket", col("bucket").cast("string")), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(col("lr_micro")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(scored == joined)
    // target-like text scores above alien text under the dense model
    assert(scored(1L)._2 > scored(2L)._2)
  }

  test("short docs: no bigram underflow, empty text scores zero") {
    val dir = tmp()
    fit(dir)
    val out = Dsir.score(spark,
        Seq((1L, "aa"), (2L, ""), (3L, "aa bb")).toDF("doc_id", "text"), dir)
      .select(col("doc_id"), col("n_feats"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 3L))
  }

  test("APPLY is zero-exchange: scoring runs entirely map-side") {
    val dir = tmp()
    fit(dir)
    val plan = Dsir.score(spark,
        Seq((1L, "aa bb")).toDF("doc_id", "text"), dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("selectTop keeps floor(n*pct/100) per source, highest lr first") {
    val scored = Seq(
      ("s1", 1L, 50L), ("s1", 2L, 40L), ("s1", 3L, 30L), ("s1", 4L, 20L),
      ("s1", 5L, 10L),
      ("s2", 6L, 5L), ("s2", 7L, 99L), ("s2", 8L, 1L))
      .toDF("source", "doc_id", "lr_micro")
    val out = Dsir.selectTop(scored, "source", "doc_id", 50)
      .select(col("doc_id"), col("sel_rank"), col("is_selected"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    // s1: n=5, quota floor(2.5)=2 -> docs 1,2; s2: n=3, quota 1 -> doc 7
    assert(out.filter(_._2._2).keySet == Set(1L, 2L, 7L))
    assert(out(7L)._1 == 1L && out(5L)._1 == 5L)
  }
}
