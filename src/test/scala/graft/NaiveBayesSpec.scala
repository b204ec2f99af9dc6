package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Load
import graft.ops.NaiveBayes

/** NB linear classifier: hand-computed micro weights on a planted
  * corpus, exact integer scoring, and the zero-shuffle APPLY contract.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("nb").toString + "/m"

  // corpus: pos = "a a b", neg = "a b b"
  // counts: a -> (2,1), b -> (1,2); tot_pos = tot_neg = 3, V = 2
  // w(a) = ln(3/5) - ln(2/5) = ln(1.5)  ->  405465 micro
  // w(b) = ln(2/5) - ln(3/5) = -ln(1.5) -> -405465 micro
  // prior = ln(1) - ln(1) = 0
  private def fit(dir: String): Unit = NaiveBayes.train(spark,
    Seq(("a a b", true), ("a b b", false)).toDF("text", "label"),
    dir, vocabCap = 16)

  test("train persists hand-computable micro weights and meta") {
    val dir = tmp()
    fit(dir)
    val w = Load.readTable(spark, s"$dir/weights").get.collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("weight_micro"))
      .toMap
    assert(w == Map("a" -> 405465L, "b" -> -405465L))
    val m = Load.readTable(spark, s"$dir/meta").get.head()
    assert(m.getAs[Long]("vocab_v") == 2L)
    assert(m.getAs[Long]("tot_pos") == 3L && m.getAs[Long]("tot_neg") == 3L)
    assert(m.getAs[Long]("prior_micro") == 0L)
  }

  test("score sums exact integer margins; OOV is neutral") {
    val dir = tmp()
    fit(dir)
    val out = NaiveBayes.score(spark,
        Seq((1L, "a a z"), (2L, "b"), (3L, "z z")).toDF("doc_id", "text"),
        dir)
      .select("doc_id", "n_tokens", "n_hits", "margin_micro", "pred_pos")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((3L, 2L, 810930L, true)))  // 2*w(a), z neutral
    assert(out(2L) == ((1L, 1L, -405465L, false)))
    assert(out(3L) == ((2L, 0L, 0L, false)))      // all-OOV: prior only
  }

  test("vocab cap keeps top-V by total count with deterministic ties") {
    val dir = tmp()
    NaiveBayes.train(spark,
      Seq(("c c a a b", true), ("b d", false)).toDF("text", "label"),
      dir, vocabCap = 2)
    // totals: a=2, b=2, c=2, d=1 -> cap 2 keeps (a, b) by token asc
    val kept = Load.readTable(spark, s"$dir/weights").get
      .select("token").as[String].collect().sorted
    assert(kept.toSeq == Seq("a", "b"))
    // realized V=2 feeds the denominator, recorded in meta
    assert(Load.readTable(spark, s"$dir/meta").get.head()
      .getAs[Long]("vocab_v") == 2L)
  }

  test("extend(batch) is bit-identical to retraining on corpus + batch") {
    val (inc, full) = (tmp(), tmp())
    val corpus = Seq(("a a b", true), ("a b b", false))
    val batch = Seq(("b c c", true), ("a c", false), ("c c c", true))
    NaiveBayes.train(spark, corpus.toDF("text", "label"), inc, 16)
    NaiveBayes.extend(spark, batch.toDF("text", "label"), inc, 16)
    NaiveBayes.train(spark, (corpus ++ batch).toDF("text", "label"), full, 16)
    def model(dir: String) = (
      Load.readTable(spark, s"$dir/weights").get.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet,
      Load.readTable(spark, s"$dir/counts").get.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      Load.readTable(spark, s"$dir/meta").get.collect()
        .map(_.toSeq).toSeq)
    assert(model(inc) == model(full))
    // and scoring through either model agrees
    val probe = Seq((1L, "a c z")).toDF("doc_id", "text")
    assert(NaiveBayes.score(spark, probe, inc).collect().map(_.toSeq).toSeq
      == NaiveBayes.score(spark, probe, full).collect().map(_.toSeq).toSeq)
  }

  test("unicode analyzer: recorded at train, followed by score AND " +
      "extend — raw punctuated text ≡ pre-analyzed text, bit for bit") {
    import graft.ops.Analyzer
    val az = Analyzer.Unicode()
    // raw cased/punctuated/accented corpus and its hand-analyzed twin
    val rawCorpus = Seq(("Héllo, WORLD! Héllo?", true), ("world; mérge.", false))
    val anaCorpus = rawCorpus.map { case (t, l) =>
      (Analyzer.foldSplit(t).mkString(" "), l) }
    val (u, w) = (tmp(), tmp())
    NaiveBayes.train(spark, rawCorpus.toDF("text", "label"), u, 16, az)
    NaiveBayes.train(spark, anaCorpus.toDF("text", "label"), w, 16)
    def model(dir: String) = (
      Load.readTable(spark, s"$dir/weights").get.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet,
      Load.readTable(spark, s"$dir/meta").get.head().toSeq)
    assert(model(u) == model(w),
      "unicode training over raw text must equal whitespace training " +
        "over the analyzed twin — same kernel, same statistics")
    // the policy is recorded and score follows it: raw text through
    // the unicode model ≡ analyzed text through the whitespace model
    assert(Analyzer.load(spark, s"$u/analyzer").kind == "unicode")
    val rawProbe = Seq((1L, "HÉLLO, wörld…"), (2L, "mérge!")).toDF("doc_id", "text")
    val anaProbe = Seq((1L, "hello world"), (2L, "merge")).toDF("doc_id", "text")
    val scoreCols = Seq("doc_id", "n_tokens", "n_hits", "margin_micro",
      "pred_pos")
    assert(NaiveBayes.score(spark, rawProbe, u)
        .select(scoreCols.map(col): _*).collect().map(_.toSeq).toSeq
      == NaiveBayes.score(spark, anaProbe, w)
        .select(scoreCols.map(col): _*).collect().map(_.toSeq).toSeq)
    // extend reads the recorded policy — extending with raw text keeps
    // extend(batch) ≡ retrain(corpus ∪ batch) under the analyzer
    val rawBatch = Seq(("Mérge, mérge: HELLO", true))
    NaiveBayes.extend(spark, rawBatch.toDF("text", "label"), u, 16)
    val full = tmp()
    NaiveBayes.train(spark, (rawCorpus ++ rawBatch).toDF("text", "label"),
      full, 16, az)
    assert(model(u) == model(full))
  }

  test("unicode scoring stays zero-exchange (normalize is pure " +
      "expression work)") {
    import graft.ops.Analyzer
    val dir = tmp()
    NaiveBayes.train(spark,
      Seq(("a, a b!", true), ("a; b b?", false)).toDF("text", "label"),
      dir, 16, Analyzer.Unicode())
    val plan = NaiveBayes.score(spark,
      Seq((1L, "a B!")).toDF("doc_id", "text"), dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("APPLY is zero-exchange: scoring runs entirely map-side") {
    val dir = tmp()
    fit(dir)
    // string-count like tools/PlanAudit: AQE wraps the plan, so
    // TreeNode.collect would miss Exchange children pre-execution
    val plan = NaiveBayes.score(spark,
      Seq((1L, "a b")).toDF("doc_id", "text"), dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  // ------------- multiclass (language-ID) extension -------------

  test("charNgrams: sliding window incl. spaces; short strings empty") {
    val r = Seq("abcd", "a bc", "ab", "").toDF("t")
      .select(NaiveBayes.charNgrams(col("t"), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("abc", "bcd"))
    assert(r(1) == Seq("a b", " bc"))
    assert(r(2) == Seq.empty && r(3) == Seq.empty)
  }

  test("multiclass: hand-computable weights, per-class floors exist") {
    val dir = tmp()
    // en = "aa aa", fr = "bb", counts: aa->(en 2), bb->(fr 1)
    // tot_en = 2, tot_fr = 1, V = 2
    NaiveBayes.trainMulti(spark,
      Seq((Seq("aa", "aa"), "en"), (Seq("bb"), "fr"))
        .toDF("tokens", "label"),
      dir, vocabCap = 16)
    val w = Load.readTable(spark, s"$dir/weights").get.collect()
      .map(r => (r.getAs[String]("token"), r.getAs[String]("label")) ->
        r.getAs[Long]("weight_micro")).toMap
    // w_en(aa) = ln(3/4), w_en(bb) = ln(1/4)  (floor row EXISTS)
    // w_fr(aa) = ln(1/3), w_fr(bb) = ln(2/3)
    assert(w == Map(
      ("aa", "en") -> math.round(math.log(3.0 / 4) * 1e6),
      ("bb", "en") -> math.round(math.log(1.0 / 4) * 1e6),
      ("aa", "fr") -> math.round(math.log(1.0 / 3) * 1e6),
      ("bb", "fr") -> math.round(math.log(2.0 / 3) * 1e6)))
    val m = Load.readTable(spark, s"$dir/meta").get.collect()
      .map(r => r.getAs[String]("label") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tot_toks"),
          r.getAs[Long]("vocab_v"), r.getAs[Long]("prior_micro")))).toMap
    assert(m("en") == ((1L, 2L, 2L, 0L)) && m("fr") == ((1L, 1L, 2L, 0L)))
  }

  test("multiclass argmax: deterministic label-asc tie-break") {
    val dir = tmp()
    // perfectly symmetric classes -> every score ties -> smallest label
    NaiveBayes.trainMulti(spark,
      Seq((Seq("x"), "b"), (Seq("x"), "a"), (Seq("x"), "c"))
        .toDF("tokens", "label"),
      dir, vocabCap = 16)
    val out = NaiveBayes.scoreMulti(spark,
      Seq(Seq("x", "y")).toDF("tokens"), dir).head()
    assert(out.getAs[String]("pred_label") == "a")
    assert(out.getAs[Long]("best_micro") ==
      out.getAs[Long]("runnerup_micro"))
  }

  test("multiclass: planted char distributions separate held-out docs") {
    val dir = tmp()
    // three "languages" over disjoint alphabets; train on 2/3, predict
    // the held-out third — real signal must separate perfectly
    def text(lang: String, seed: Int): String = {
      val alpha = lang match {
        case "aa" => "abcde"; case "bb" => "fghij"; case _ => "klmno"
      }
      (0 until 40).map(i => alpha((i * 7 + seed) % 5)).mkString
        .grouped(5).mkString(" ")
    }
    val rows = for (l <- Seq("aa", "bb", "cc"); i <- 0 until 9)
      yield (l, i, text(l, i))
    val df = rows.toDF("lang", "i", "t")
      .select(col("lang"), col("i"),
        NaiveBayes.charNgrams(col("t"), 3).as("tokens"))
    NaiveBayes.trainMulti(spark,
      df.filter(col("i") % 3 =!= 0)
        .select(col("tokens"), col("lang").as("label")),
      dir, vocabCap = 512)
    val pred = NaiveBayes.scoreMulti(spark,
      df.filter(col("i") % 3 === 0), dir)
    assert(pred.filter(col("pred_label") =!= col("lang")).count() == 0)
    // and the decision margin is strictly positive on every doc
    assert(pred.filter(col("best_micro") <= col("runnerup_micro"))
      .count() == 0)
  }

  test("extendMulti(batch) is bit-identical to retraining on the union") {
    val a = Seq((Seq("p", "q"), "en"), (Seq("q"), "fr"),
      (Seq("r", "r"), "de"))
    val b = Seq((Seq("p"), "fr"), (Seq("s", "q"), "en"),
      (Seq("t"), "zh")) // zh first seen in the batch
    val incr = tmp()
    val full = tmp()
    NaiveBayes.trainMulti(spark, a.toDF("tokens", "label"), incr, 16)
    NaiveBayes.extendMulti(spark, b.toDF("tokens", "label"), incr, 16)
    NaiveBayes.trainMulti(spark, (a ++ b).toDF("tokens", "label"), full, 16)
    def snap(d: String, t: String) =
      Load.readTable(spark, s"$d/$t").get.collect()
        .map(_.toString).sorted.toSeq
    Seq("weights", "meta", "counts").foreach { t =>
      assert(snap(incr, t) == snap(full, t), s"table $t diverged")
    }
  }
}
