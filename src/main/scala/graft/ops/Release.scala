package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Load

/** Dataset-release manifests — the reproducibility capstone the
  * time-travel family builds toward (corpus `readAsOf`, vector
  * `readAsOf`, text `searchAsOf`): ONE atomically-committed manifest
  * row pinning a MUTUALLY CONSISTENT snapshot across warehouses —
  * (corpus@I, text-index@J, vector-index@K + model-epoch@E) plus
  * integer fingerprints of every frozen model (NB, DSIR, BPE merges,
  * langid) — the artifact a training run actually cites. "We trained
  * on release 2026-08" then means: one name → every component served
  * as-of its pinned generation, bit-identical to what the cut
  * observed, refused loudly where that is no longer possible.
  *
  * Contracts:
  *  - IMMUTABLE: [[cut]] refuses an existing name — a release is never
  *    re-pointed; cut a new name. The manifest lands through the
  *    staged two-rename swap every warehouse table uses.
  *  - CONSISTENT: the marks are each component's COMMITTED high-water
  *    state at cut time (the exactly-once guards make those marks the
  *    same thing every reader saw), and the serving verbs go through
  *    the components' own as-of reads, inheriting their refusal rules:
  *    a cut inside a tiered-merge run, a rollback below the pin, or a
  *    vector retrain past the pinned model epoch all REFUSE rather
  *    than serve different bytes (`reencoded_through` rule).
  *  - DELETES ARE NOT TIME-TRAVELED: a takedown applies to historical
  *    releases too (the house `readAsOf` rule) — a release read today
  *    is the pinned snapshot minus documents deleted since; everything
  *    else is bit-identical (ReleaseSpec pins it).
  *  - REPLAYABLE: every recorded mark and fingerprint is a count or an
  *    integer micro-unit sum over a persisted parquet table, so an
  *    external engine re-derives the whole manifest row from the trees
  *    alone (the q210 oracle does).
  *
  * Scale: a cut is a handful of 1-row/metadata reads plus
  * model-table-bounded aggregates (KBs — never a corpus scan); the
  * manifest is |releases| rows; serving is partition-pruned as-of
  * reads, O(pinned data) like any other read.
  */
object Release {

  /** (rows, micro-sum) fingerprint of a persisted model table — the
    * cheapest cross-engine-replayable integrity pin: model weights are
    * integer micro-units by the catalog-wide exactness rule, so
    * (count, Σ micro) is exact in any engine and any row order.
    * (0, 0) when the table is absent (an optional model, e.g. langid).
    */
  private def fingerprint(spark: SparkSession, dir: String,
                          microCol: String): (Long, Long) =
    Load.readTable(spark, dir).map { df =>
      val r = df.agg(count(lit(1)),
        coalesce(sum(col(microCol)), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }.getOrElse((0L, 0L))

  private def manifestRow(spark: SparkSession, manifest: String,
                          name: String): org.apache.spark.sql.Row = {
    val rows = Load.readTable(spark, manifest).getOrElse(
        sys.error(s"Release: no manifest at $manifest"))
      .filter(col("release") === name).collect()
    require(rows.nonEmpty,
      s"Release: no release '$name' in $manifest")
    rows.head
  }

  /** Cut release `name`: capture every component's committed marks and
    * model fingerprints into one immutable manifest row. At least one
    * component must be given; absent components record dir "" and
    * marks -1. The corpus warehouse's frozen models (nb, dsir, merges,
    * langid) fingerprint from their persisted tables.
    */
  def cut(spark: SparkSession, manifest: String, name: String,
          corpus: Option[String] = None, textIndex: Option[String] = None,
          vectorIndex: Option[String] = None): Unit = {
    require(name.nonEmpty, "a release needs a name")
    require(corpus.nonEmpty || textIndex.nonEmpty || vectorIndex.nonEmpty,
      "a release needs at least one component")
    val existing = Load.readTable(spark, manifest)
    existing.foreach { df =>
      require(df.filter(col("release") === name).isEmpty,
        s"Release: '$name' already exists in $manifest — releases are " +
          "immutable; cut a new name")
    }
    val (cDir, cBatch, cEpoch) = corpus.map { d =>
      val b = CorpusIngest.lastBatch(spark, d)
      require(b >= 0, s"Release.cut: no corpus warehouse at $d")
      (d, b, CorpusIngest.delEpoch(spark, d))
    }.getOrElse(("", -1L, -1L))
    val (nbF, dsF, mgF, liF) = corpus.map { d =>
      (fingerprint(spark, s"$d/nb/weights", "weight_micro"),
        fingerprint(spark, s"$d/dsir/model", "lr_micro"),
        fingerprint(spark, s"$d/merges", "rank"),
        fingerprint(spark, s"$d/langid/weights", "weight_micro"))
    }.getOrElse(((0L, 0L), (0L, 0L), (0L, 0L), (0L, 0L)))
    val (tDir, tBatch, tEpoch) = textIndex.map { d =>
      val b = InvertedIndex.lastBatch(spark, d)
      require(b >= 0, s"Release.cut: no inverted index at $d")
      (d, b, InvertedIndex.delEpoch(spark, d))
    }.getOrElse(("", -1L, -1L))
    val (vDir, vBatch, vEpoch, vModel) = vectorIndex.map { d =>
      val b = AdcIngest.lastBatch(spark, d)
      require(b >= 0, s"Release.cut: no vector warehouse at $d")
      (d, b, AdcIngest.delEpoch(spark, d), AdcIngest.modelEpoch(spark, d))
    }.getOrElse(("", -1L, -1L, -1L))
    import spark.implicits._
    val row = Seq((name,
      cDir, cBatch, cEpoch,
      nbF._1, nbF._2, dsF._1, dsF._2, mgF._1, mgF._2, liF._1, liF._2,
      tDir, tBatch, tEpoch,
      vDir, vBatch, vEpoch, vModel))
      .toDF("release",
        "corpus_dir", "corpus_batch", "corpus_epoch",
        "nb_rows", "nb_micro", "dsir_rows", "dsir_micro",
        "merges_rows", "merges_micro", "langid_rows", "langid_micro",
        "text_dir", "text_batch", "text_epoch",
        "vec_dir", "vec_batch", "vec_epoch", "vec_model_epoch")
    val merged = existing.map(_.unionByName(row)).getOrElse(row)
    Load.replaceTable(spark, merged.coalesce(1), manifest)
    ()
  }

  /** All releases, oldest name first. */
  def list(spark: SparkSession, manifest: String): DataFrame =
    Load.readTable(spark, manifest).getOrElse(
        sys.error(s"Release: no manifest at $manifest"))
      .orderBy(col("release"))

  /** The pinned corpus of release `name`: every packed row batches
    * 0..pin landed, minus documents deleted SINCE (takedowns are not
    * time-traveled). Refuses when the warehouse rolled back below the
    * pin — the snapshot no longer exists.
    */
  def readCorpus(spark: SparkSession, manifest: String,
                 name: String): DataFrame = {
    val r = manifestRow(spark, manifest, name)
    require(r.getAs[String]("corpus_dir").nonEmpty,
      s"Release: '$name' pins no corpus component")
    CorpusIngest.readAsOf(spark, r.getAs[String]("corpus_dir"),
      r.getAs[Long]("corpus_batch"))
  }

  /** BM25 search against the pinned text index of release `name` —
    * postings and globals as of the pinned generation, minus
    * tombstones committed since. Inherits `searchAsOf`'s refusals
    * (rollback below the pin, a tiered merge across it).
    */
  def searchText(spark: SparkSession, manifest: String, name: String,
                 terms: Seq[String], k: Int): DataFrame = {
    val r = manifestRow(spark, manifest, name)
    require(r.getAs[String]("text_dir").nonEmpty,
      s"Release: '$name' pins no text-index component")
    InvertedIndex.searchAsOf(spark, r.getAs[String]("text_dir"), terms, k,
      r.getAs[Long]("text_batch"))
  }

  /** The pinned compressed vector index of release `name`. REFUSES a
    * cross-epoch serve: after a retrain the surviving rows are
    * re-encoded under a NEW model epoch — byte-different codes nobody
    * historically served under this release — so the model epoch must
    * still equal the pinned one (on top of readAsOf's own
    * `reencoded_through` floor rule).
    */
  def readVectors(spark: SparkSession, manifest: String,
                  name: String): DataFrame = {
    val r = manifestRow(spark, manifest, name)
    val d = r.getAs[String]("vec_dir")
    require(d.nonEmpty, s"Release: '$name' pins no vector component")
    val nowEpoch = AdcIngest.modelEpoch(spark, d)
    require(nowEpoch == r.getAs[Long]("vec_model_epoch"),
      s"Release: '$name' pinned model epoch " +
        s"${r.getAs[Long]("vec_model_epoch")} but $d is now at epoch " +
        s"$nowEpoch — the index was retrained since; the pinned " +
        "encodings no longer exist")
    AdcIngest.readAsOf(spark, d, r.getAs[Long]("vec_batch"))
  }

  /** Integrity check: the frozen models a release cites must still
    * fingerprint exactly as recorded — a retrained/extended model
    * under an existing release name silently changes what "trained on
    * release X" means, so it fails loudly here. Returns unit;
    * mismatches throw with the offending model named.
    */
  def check(spark: SparkSession, manifest: String, name: String): Unit = {
    val r = manifestRow(spark, manifest, name)
    val d = r.getAs[String]("corpus_dir")
    if (d.nonEmpty) {
      val now = Seq(
        ("nb", fingerprint(spark, s"$d/nb/weights", "weight_micro"),
          (r.getAs[Long]("nb_rows"), r.getAs[Long]("nb_micro"))),
        ("dsir", fingerprint(spark, s"$d/dsir/model", "lr_micro"),
          (r.getAs[Long]("dsir_rows"), r.getAs[Long]("dsir_micro"))),
        ("merges", fingerprint(spark, s"$d/merges", "rank"),
          (r.getAs[Long]("merges_rows"), r.getAs[Long]("merges_micro"))),
        ("langid", fingerprint(spark, s"$d/langid/weights", "weight_micro"),
          (r.getAs[Long]("langid_rows"), r.getAs[Long]("langid_micro"))))
      now.foreach { case (m, got, want) =>
        require(got == want,
          s"Release.check('$name'): model '$m' fingerprints $got but " +
            s"the manifest recorded $want — the frozen model changed " +
            "under a cited release")
      }
    }
  }
}
