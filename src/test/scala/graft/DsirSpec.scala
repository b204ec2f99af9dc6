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

  test("unicode analyzer: recorded at train, followed by score and " +
      "extend — raw punctuated text ≡ pre-analyzed text, bit for bit") {
    import graft.ops.Analyzer
    val az = Analyzer.Unicode()
    val rawT = Seq("Aa, BB! cc", "AA; bb")
    val rawR = rawT ++ Seq("Zz yy — xx?", "zz YY")
    def ana(xs: Seq[String]) = xs.map(Analyzer.foldSplit(_).mkString(" "))
    val (u, w) = (tmp(), tmp())
    Dsir.train(spark, rawT.toDF("text"), rawR.toDF("text"), u,
      buckets = B, analyzer = az)
    Dsir.train(spark, ana(rawT).toDF("text"), ana(rawR).toDF("text"), w,
      buckets = B)
    def model(dir: String) =
      Load.readTable(spark, s"$dir/model").get.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(model(u) == model(w),
      "unicode training over raw text must equal whitespace training " +
        "over the analyzed twin — same features, same buckets")
    assert(Analyzer.load(spark, s"$u/analyzer").kind == "unicode")
    // score follows the recorded policy: raw through unicode ≡
    // analyzed through whitespace (features INCLUDING bigrams align —
    // bigrams are over adjacent ANALYZED tokens)
    val rawP = Seq((1L, "Aa… BB, zz!"), (2L, "XX"))
    val got = Dsir.score(spark, rawP.toDF("doc_id", "text"), u)
      .select("doc_id", "n_feats", "lr_micro").collect().map(_.toSeq).toSeq
    val exp = Dsir.score(spark,
        rawP.map { case (i, t) => (i, Analyzer.foldSplit(t).mkString(" ")) }
          .toDF("doc_id", "text"), w)
      .select("doc_id", "n_feats", "lr_micro").collect().map(_.toSeq).toSeq
    assert(got == exp)
    // extend under the recorded policy ≡ retrain under the analyzer
    val (bt, br) = (Seq("CC, cc!"), Seq("CC cc", "yy; XX"))
    Dsir.extend(spark, bt.toDF("text"), br.toDF("text"), u)
    val full = tmp()
    Dsir.train(spark, (rawT ++ bt).toDF("text"), (rawR ++ br).toDF("text"),
      full, buckets = B, analyzer = az)
    assert(model(u) == model(full))
  }

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

  test("extend(batch) is bit-identical to retraining on corpus + batch") {
    val (whole, inc) = (tmp(), tmp())
    val (t1, r1) = (Seq("aa bb cc", "aa bb").toDF("text"),
      Seq("aa bb cc", "zz yy xx", "zz yy").toDF("text"))
    val (t2, r2) = (Seq("cc dd", "dd ee ff").toDF("text"),
      Seq("zz qq", "qq rr ss tt").toDF("text"))
    Dsir.train(spark, t1.union(t2), r1.union(r2), whole, buckets = B)
    Dsir.train(spark, t1, r1, inc, buckets = B)
    Dsir.extend(spark, t2, r2, inc)
    def model(d: String) = Load.readTable(spark, s"$d/model").get
      .select("bucket", "cnt_target", "cnt_raw", "lr_micro")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(model(inc) == model(whole))
    def meta(d: String) = Load.readTable(spark, s"$d/meta").get
      .select("tot_target", "tot_raw", "buckets", "hash")
      .as[(Long, Long, Long, String)].head()
    assert(meta(inc) == meta(whole))
  }

  test("fast (xxhash64) path: recorded in meta, zero-exchange, captures the planted dialect") {
    val dir = tmp()
    // pool: 40 docs, every 4th speaks the target dialect (t-prefixed
    // vocab), the rest an r-prefixed one; target corpus = the dialect
    val pool = spark.range(40).select(col("id").as("doc_id"),
      lit("s").as("source"),
      concat_ws(" ", (0 until 6).map { j =>
        concat(
          when(col("id") % 4 === 0, lit("t")).otherwise(lit("r")),
          pmod(col("id") * 7 + lit(j), lit(20)))
      }: _*).as("text"))
    Dsir.train(spark,
      pool.filter(col("doc_id") % 4 === 0).select(col("text")),
      pool.select(col("text")), dir, buckets = B, fast = true)
    assert(Load.readTable(spark, s"$dir/meta").get.head()
      .getAs[String]("hash") == "xxhash64")
    val scored = Dsir.score(spark, pool, dir)
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"))
    // planted-dialect capture: the 10 dialect docs are 25% of the
    // pool and score strictly on-target — a 25% quota catches exactly
    // them
    val sel = Dsir.selectTop(scored, "source", "doc_id", 25)
      .filter(col("is_selected")).select("doc_id").as[Long].collect().toSet
    assert(sel == (0L until 40L by 4).toSet)
    // extend under the fast model keeps the recorded hash kind
    Dsir.extend(spark, pool.limit(1).select(col("text")),
      pool.limit(2).select(col("text")), dir)
    assert(Load.readTable(spark, s"$dir/meta").get.head()
      .getAs[String]("hash") == "xxhash64")
  }

  test("fused fast scorer == unfused xxhash64 formulation, byte-exact") {
    val dir = tmp()
    Dsir.train(spark, Seq("aa bb cc", "dd ee").toDF("text"),
      Seq("aa bb", "zz yy xx", "café año").toDF("text"),
      dir, buckets = B, fast = true)
    // tricky shapes: multi-space gaps (bigram scratch join), single
    // token (no bigrams), empty and all-space text (no features),
    // repeats, multibyte UTF-8
    val docs = Seq(
      (1L, "aa bb cc"), (2L, "aa  bb   cc"), (3L, "single"),
      (4L, ""), (5L, "   "), (6L, "café señor años aa"),
      (7L, "a b a b a"), (8L, " leading and trailing "))
      .toDF("doc_id", "text")
    val fused = Dsir.score(spark, docs, dir)
      .select("doc_id", "n_feats", "lr_micro")
      .as[(Long, Long, Long)].collect().toSet
    // ground truth: the Column formulation this expression fuses
    val w = Load.readTable(spark, s"$dir/model").get
      .select(col("bucket").cast("string"), col("lr_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unfused = docs
      .withColumn("__s", graft.functions.WeightedTokenSum.weightedTokenSum(
        Dsir.featureBucketsFast(col("text"), B), w, 0L))
      .select(col("doc_id"), col("__s.n_tokens").as("n_feats"),
        col("__s.margin_micro").as("lr_micro"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fused == unfused)
    // and the fused plan stays exchange-free
    assert(!Dsir.score(spark, docs, dir)
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("fused md5 scorer == unfused md5 Column formulation, byte-exact") {
    import spark.implicits._
    val dir = tmp()
    val B = 64
    Dsir.train(spark, Seq("aa bb cc", "dd ee").toDF("text"),
      Seq("aa bb", "zz yy xx", "caf\u00e9 a\u00f1o").toDF("text"),
      dir, buckets = B)
    // tricky shapes: multi-space gaps (bigram scratch join), single
    // token (no bigrams), empty and all-space text (no features),
    // repeats, multibyte UTF-8
    val docs = Seq(
      (1L, "aa bb cc"), (2L, "aa  bb   cc"), (3L, "single"),
      (4L, ""), (5L, "   "), (6L, "caf\u00e9 se\u00f1or a\u00f1os aa"),
      (7L, "a b a b a"), (8L, " leading and trailing "))
      .toDF("doc_id", "text")
    val fused = Dsir.score(spark, docs, dir)
      .select("doc_id", "n_feats", "lr_micro")
      .as[(Long, Long, Long)].collect().toSet
    // ground truth: the Column ladder the expression fuses (md5 hex
    // substring parse through the string-keyed token sum)
    val w = Load.readTable(spark, s"$dir/model").get
      .select(col("bucket").cast("string"), col("lr_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unfused = docs
      .withColumn("__s", graft.functions.WeightedTokenSum.weightedTokenSum(
        Dsir.featureBuckets(col("text"), B), w, 0L))
      .select(col("doc_id"), col("__s.n_tokens").as("n_feats"),
        col("__s.margin_micro").as("lr_micro"))
      .as[(Long, Long, Long)].collect().toSet
    assert(fused == unfused)
    // and the fused plan stays exchange-free
    assert(!Dsir.score(spark, docs, dir)
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
