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
}
