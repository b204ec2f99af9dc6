package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{AdcIngest, CorpusIngest, InvertedIndex, Release}

/** Dataset-release manifests ([[graft.ops.Release]]): one immutable
  * row pins a mutually consistent (corpus@I, text-index@J,
  * vector-index@K + model-epoch@E) snapshot plus frozen-model
  * fingerprints. The pins: (1) a release read is BIT-IDENTICAL across
  * later ingest/appends, (2) `searchAsOf` at the high-water mark ≡
  * `search`, and at an older mark ≡ what `search` served before the
  * newer batch landed (globals included), (3) deletes are NOT
  * time-traveled — a takedown drops from every release, (4) serves
  * that can no longer be exact REFUSE loudly (rollback below the pin,
  * a merge across it, a retrain past the pinned model epoch), (5) the
  * frozen models a release cites must fingerprint as recorded.
  */
class ReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private def docs(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 29 + j), lit(500)))): _*)
        .as("text"))

  private def vecs(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), j =>
        (pmod(hash(col("id") * 13 + j), lit(1000))
          .cast(org.apache.spark.sql.types.DoubleType) / 100.0)
          .cast(org.apache.spark.sql.types.FloatType)).as("embedding"))

  private val Good = "alpha beta gamma delta epsilon"
  private val Bad = "zork xult yarp qwop"

  private def crawl(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "key")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 4 === 3, lit("xx")).otherwise(lit("en"))
          .as("lang"),
        concat(lit("https://ex.com/"), col("key")).as("canon_url"),
        concat(lit("<html><head><title>t</title></head><body><p>"),
          when(col("doc_id") % 4 === 3, lit(Bad)).otherwise(lit(Good)),
          lit("</p></body></html>")).as("html"))

  private def fixture(): (String, String, String, String) = {
    val root = tmp("release")
    val (cw, ix, vw, mf) =
      (s"$root/corpus", s"$root/invidx", s"$root/adc", s"$root/releases")
    CorpusIngest.bootstrap(spark,
      crawl(Seq((0L, "A", "a0"), (1L, "A", "a1"), (2L, "B", "b2"),
        (3L, "B", "b3"))), cw,
      nbLabel = col("lang") === "en", nbSplit = lit(true),
      dsirTarget = col("lang") === "en", selectPct = 100)
    InvertedIndex.build(spark, docs(0, 400), ix)
    AdcIngest.bootstrap(spark, vecs(0, 300), vw, k = 4, m = 4, ks = 8)
    (cw, ix, vw, mf)
  }

  private val terms = Seq("w17", "w42", "w133")

  test("cut pins committed marks and fingerprints; names are " +
      "immutable; list orders") {
    val (cw, ix, vw, mf) = fixture()
    Release.cut(spark, mf, "r1", Some(cw), Some(ix), Some(vw))
    val r = Release.list(spark, mf).head()
    assert(r.getAs[String]("release") == "r1")
    assert(r.getAs[Long]("corpus_batch") == 0L)
    assert(r.getAs[Long]("text_batch") == 0L)
    assert(r.getAs[Long]("vec_batch") == 0L)
    assert(r.getAs[Long]("vec_model_epoch") == 0L)
    assert(r.getAs[Long]("nb_rows") > 0L)
    assert(r.getAs[Long]("dsir_rows") > 0L)
    // immutable: the same name refuses
    val e = intercept[IllegalArgumentException] {
      Release.cut(spark, mf, "r1", Some(cw))
    }
    assert(e.getMessage.contains("immutable"))
    Release.cut(spark, mf, "r2", Some(cw))
    assert(Release.list(spark, mf).select("release").as[String]
      .collect().toSeq == Seq("r1", "r2"))
    Release.check(spark, mf, "r1") // frozen models fingerprint clean
  }

  test("a release read is bit-identical across later ingest and " +
      "appends; searchAsOf parity with search") {
    val (cw, ix, vw, mf) = fixture()
    // what serving looked like at cut time
    val corpusAt0 = CorpusIngest.read(spark, cw)
      .collect().map(_.toSeq).toSet
    val searchAt0 = InvertedIndex.search(spark, ix, terms, 30)
      .collect().map(_.toSeq).toSeq
    val vecsAt0 = AdcIngest.index(spark, vw).collect().map(_.toSeq).toSet
    Release.cut(spark, mf, "r1", Some(cw), Some(ix), Some(vw))
    // searchAsOf at the high-water mark ≡ search, globals included
    assert(InvertedIndex.searchAsOf(spark, ix, terms, 30, 0L)
      .collect().map(_.toSeq).toSeq == searchAt0)
    // the world moves on
    assert(CorpusIngest.ingest(spark,
      crawl(Seq((10L, "A", "a10"), (11L, "B", "b11"))), cw, 1L))
    InvertedIndex.addBatch(spark, docs(400, 460), ix, 1L)
    AdcIngest.append(spark, vecs(300, 340), vw, 1L)
    // the release still serves exactly the cut-time snapshot
    assert(Release.readCorpus(spark, mf, "r1")
      .collect().map(_.toSeq).toSet == corpusAt0)
    assert(Release.searchText(spark, mf, "r1", terms, 30)
      .collect().map(_.toSeq).toSeq == searchAt0)
    assert(Release.readVectors(spark, mf, "r1")
      .collect().map(_.toSeq).toSet == vecsAt0)
    // while a fresh cut sees the new generations
    Release.cut(spark, mf, "r2", Some(cw), Some(ix), Some(vw))
    assert(Release.readCorpus(spark, mf, "r2").count()
      > corpusAt0.size.toLong)
    assert(Release.readVectors(spark, mf, "r2").count()
      == vecsAt0.size.toLong + 40L)
  }

  test("deletes are NOT time-traveled: a takedown drops from every " +
      "release; everything else stays bit-identical") {
    val (cw, ix, vw, mf) = fixture()
    Release.cut(spark, mf, "r1", Some(cw), Some(ix), Some(vw))
    val pre = Release.searchText(spark, mf, "r1", terms, 30)
      .collect().map(_.toSeq).toSeq
    val preCorpus = Release.readCorpus(spark, mf, "r1")
      .collect().map(_.toSeq).toSet
    val victims = pre.map(_.head.asInstanceOf[Long]).take(2)
    InvertedIndex.delete(spark, ix, victims.toDF("doc_id"))
    CorpusIngest.delete(spark, cw, Seq(0L).toDF("doc_id"))
    val postSearch = Release.searchText(spark, mf, "r1", terms, 30)
      .collect().map(_.toSeq).toSeq
    assert(postSearch.map(_.head.asInstanceOf[Long])
      .intersect(victims).isEmpty,
      "taken-down docs must not serve from historical releases")
    val postCorpus = Release.readCorpus(spark, mf, "r1")
      .collect().map(_.toSeq).toSet
    assert(postCorpus ==
      preCorpus.filterNot(_.head.asInstanceOf[Long] == 0L))
  }

  test("serves that can no longer be exact refuse loudly; check() " +
      "catches a changed frozen model") {
    val (cw, ix, vw, mf) = fixture()
    InvertedIndex.addBatch(spark, docs(400, 430), ix, 1L)
    InvertedIndex.addBatch(spark, docs(430, 460), ix, 2L)
    AdcIngest.append(spark, vecs(300, 320), vw, 1L)
    CorpusIngest.ingest(spark, crawl(Seq((10L, "A", "a10"))), cw, 1L)
    Release.cut(spark, mf, "r1", Some(cw), Some(ix), Some(vw))
    // corpus rollback below the pin → the snapshot no longer exists
    CorpusIngest.rollback(spark, cw, 0L)
    intercept[IllegalArgumentException] {
      Release.readCorpus(spark, mf, "r1")
    }
    // a tiered merge folding the pinned boundary away → refuse
    // (generations 1+2 merge under id 1; the pin at batch=2 survives,
    // but a pin at batch=1 would sit INSIDE the merged run)
    Release.cut(spark, mf, "rIx1", None, Some(ix), None)
    // pin text_batch=2 == high-water mark: still serevable after merge
    InvertedIndex.tieredCompact(spark, ix)
    assert(Release.searchText(spark, mf, "rIx1", terms, 10).count() > 0)
    // but an as-of INSIDE the merged run refuses
    intercept[IllegalArgumentException] {
      InvertedIndex.searchAsOf(spark, ix, terms, 10, 1L)
    }
    // vector retrain → new model epoch → the pinned encodings are gone
    AdcIngest.retrain(spark, vecs(0, 320), vw, k = 4, m = 4, ks = 8)
    val e = intercept[IllegalArgumentException] {
      Release.readVectors(spark, mf, "r1")
    }
    assert(e.getMessage.contains("epoch"))
    // a frozen model changed under a cited release → check() fails
    graft.ops.NaiveBayes.extend(spark,
      Seq(("alpha beta", true), ("qwop zork", false)).toDF("text", "label"),
      s"$cw/nb", 256)
    val f = intercept[IllegalArgumentException] {
      Release.check(spark, mf, "r1")
    }
    assert(f.getMessage.contains("nb"))
  }
}
