package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{AdcIngest, InvertedIndex, SegmentCompaction}

/** Size-tiered segment merging (SegmentCompaction + the per-index
  * tieredCompact hooks): the pure merge policy, the settled-tree
  * byte-identity guarantee, search parity across merges, crash healing
  * at every protocol window, and the rollback interplay (cuts on
  * surviving generation boundaries allowed, cuts inside a merged tree
  * refused) — plus the meta-first rollback crash window fix.
  */
class SegmentCompactionSpec extends SparkSpec {
  import spark.implicits._

  // ---- pure policy ----

  test("mergeSet: unsettled tail merges, settled barrier protects") {
    // big bootstrap + two small appends: bootstrap settled, tail merges
    assert(SegmentCompaction.mergeSet(
      Seq((0L, 4000L), (1L, 200L), (2L, 200L)), 4.0, 2) == Seq(1L, 2L))
    // single candidate below minMerge: no-op
    assert(SegmentCompaction.mergeSet(
      Seq((0L, 4000L), (1L, 200L)), 4.0, 2).isEmpty)
    // nothing settled (similar sizes): everything merges
    assert(SegmentCompaction.mergeSet(
      Seq((0L, 100L), (1L, 100L), (2L, 100L)), 4.0, 2) ==
      Seq(0L, 1L, 2L))
    // a mid-stream settled generation is the barrier even when the
    // bootstrap is small: candidates are strictly newer than it
    assert(SegmentCompaction.mergeSet(
      Seq((0L, 1L), (1L, 1000L), (2L, 50L), (3L, 50L)), 4.0, 2) ==
      Seq(2L, 3L))
    // single generation / empty tree: no-op
    assert(SegmentCompaction.mergeSet(Seq((0L, 100L)), 4.0, 2).isEmpty)
    assert(SegmentCompaction.mergeSet(Seq.empty, 4.0, 2).isEmpty)
    // a merged-and-grown tail re-merges while under ratio × the new
    // tail, and settles once it crosses it
    assert(SegmentCompaction.mergeSet(
      Seq((0L, 4000L), (1L, 700L), (3L, 200L)), 4.0, 2) ==
      Seq(1L, 3L))
    assert(SegmentCompaction.mergeSet(
      Seq((0L, 4000L), (1L, 900L), (3L, 200L)), 4.0, 2).isEmpty)
  }

  // ---- fixtures ----

  private def docs(from: Long, until: Long) =
    spark.range(from, until).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 29 + j), lit(500)))): _*)
        .as("text"))

  private def vecs(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), j =>
        (pmod(hash(col("id") * 13 + j), lit(1000)).cast(DoubleType) / 100.0)
          .cast(FloatType)).as("embedding"))

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/w"

  private def hadoopFs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fileStamps(dir: String): Set[(String, Long, Long)] =
    SegmentCompaction.fileStamps(spark, dir)

  private def searchRows(dir: String): Seq[Seq[Any]] =
    InvertedIndex.search(spark, dir, Seq("w17", "w42", "w133"), 50)
      .collect().toSeq.map(_.toSeq)

  private def adcRows(dir: String): Map[Long, (Long, Seq[Int], Double)] =
    AdcIngest.index(spark, dir).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cluster_id"),
          r.getAs[Seq[Int]]("codes"),
          r.getAs[Double]("vn")))
    }.toMap

  // ---- inverted index lifecycle ----

  test("invidx tieredCompact: settled bootstrap byte-identical, " +
      "search parity, high-water mark survives") {
    val dir = tmp("tiered_ix")
    InvertedIndex.build(spark, docs(0, 4000), dir)
    InvertedIndex.addBatch(spark, docs(4000, 4200), dir, 1L)
    // one small append: single candidate, policy must not fire
    assert(InvertedIndex.tieredCompact(spark, dir, ratio = 4.0).isEmpty)
    assert(InvertedIndex.segmentCount(spark, dir) == 2)
    InvertedIndex.addBatch(spark, docs(4200, 4400), dir, 2L)
    val before = searchRows(dir)
    val bootstrapBefore = fileStamps(s"$dir/postings/batch=0")
    val merged = InvertedIndex.tieredCompact(spark, dir, ratio = 4.0)
    assert(merged == Seq(1L, 2L))
    // the settled bootstrap was never opened or rewritten
    assert(fileStamps(s"$dir/postings/batch=0") == bootstrapBefore)
    assert(InvertedIndex.segmentCount(spark, dir) == 2) // dirs {0, 1}
    assert(SegmentCompaction.genSizes(spark, s"$dir/postings")
      .map(_._1) == Seq(0L, 1L))
    // pure physical move: search identical across the merge
    assert(searchRows(dir) == before)
    // exactly-once guard untouched: replay refused, next id lands
    assert(InvertedIndex.lastBatch(spark, dir) == 2L)
    assert(!InvertedIndex.addBatch(spark, docs(4200, 4400), dir, 2L))
    // 150 docs: the merged {1,2} tail (400 docs of postings) is under
    // ratio 4 × this append, so the next policy call re-merges it —
    // 100 docs would land exactly ON the 4:1 boundary
    assert(InvertedIndex.addBatch(spark, docs(4400, 4550), dir, 3L))
    assert(SegmentCompaction.genSizes(spark, s"$dir/postings")
      .map(_._1) == Seq(0L, 1L, 3L))
    // merged-and-grown tail below the ratio of the new tail: re-merges
    assert(InvertedIndex.tieredCompact(spark, dir, ratio = 4.0) ==
      Seq(1L, 3L))
    assert(InvertedIndex.lastBatch(spark, dir) == 3L)
  }

  // ---- crash windows of the tiered protocol ----

  test("tiered crash healing: every protocol window restores or discards") {
    val dir = tmp("tiered_crash")
    InvertedIndex.build(spark, docs(0, 4000), dir)
    InvertedIndex.addBatch(spark, docs(4000, 4200), dir, 1L)
    InvertedIndex.addBatch(spark, docs(4200, 4400), dir, 2L)
    val want = searchRows(dir)
    val tree = s"$dir/postings"
    val fs = hadoopFs(dir)
    val aside = new Path(s"$tree.__tiered_old")
    def writeManifest(ids: Seq[Long]): Unit = {
      fs.mkdirs(aside)
      val out = fs.create(new Path(aside, "_MANIFEST"), true)
      try out.write(ids.mkString(",").getBytes("UTF-8"))
      finally out.close()
    }
    // window A: aside exists, manifest not yet written → discard
    fs.mkdirs(aside)
    SegmentCompaction.recover(spark, tree)
    assert(!fs.exists(aside) && searchRows(dir) == want)
    // window B: manifest written, lowest id moved aside, rest not →
    // restore
    writeManifest(Seq(1L, 2L))
    assert(fs.rename(new Path(s"$tree/batch=1"), new Path(aside, "batch=1")))
    SegmentCompaction.recover(spark, tree)
    assert(!fs.exists(aside) && searchRows(dir) == want)
    // window C: all merged ids moved aside, commit rename not done →
    // restore
    writeManifest(Seq(1L, 2L))
    assert(fs.rename(new Path(s"$tree/batch=1"), new Path(aside, "batch=1")))
    assert(fs.rename(new Path(s"$tree/batch=2"), new Path(aside, "batch=2")))
    SegmentCompaction.recover(spark, tree)
    assert(!fs.exists(aside) && searchRows(dir) == want)
    // window D: merge committed, aside remnants not yet deleted →
    // discard remnants, never resurrect (batch=2's rows already live
    // inside the merged batch=1)
    val merged = InvertedIndex.tieredCompact(spark, dir, ratio = 4.0)
    assert(merged == Seq(1L, 2L))
    writeManifest(Seq(1L, 2L))
    fs.mkdirs(new Path(aside, "batch=2")) // leftover aside'd dir
    SegmentCompaction.recover(spark, tree)
    assert(!fs.exists(aside))
    assert(SegmentCompaction.genSizes(spark, tree).map(_._1) ==
      Seq(0L, 1L))
    assert(searchRows(dir) == want)
    // a fresh build never inherits stale remnants
    writeManifest(Seq(1L, 2L))
    InvertedIndex.build(spark, docs(0, 100), dir)
    assert(!fs.exists(aside))
  }

  // ---- ADC warehouse lifecycle + rollback interplay ----

  test("adc tieredCompact: parity, rollback boundary semantics") {
    val dir = tmp("tiered_adc")
    AdcIngest.bootstrap(spark, vecs(0, 3000), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(3000, 3150), dir, 1L)
    AdcIngest.append(spark, vecs(3150, 3300), dir, 2L)
    val before = adcRows(dir)
    val bootstrapBefore = fileStamps(s"$dir/index/batch=0")
    assert(AdcIngest.tieredCompact(spark, dir, ratio = 4.0) ==
      Seq(1L, 2L))
    assert(fileStamps(s"$dir/index/batch=0") == bootstrapBefore)
    assert(adcRows(dir) == before)
    assert(AdcIngest.lastBatch(spark, dir) == 2L)
    assert(AdcIngest.segmentCount(spark, dir) == 2)
    // cut INSIDE the merged tree: refused with the merged diagnosis
    val ex = intercept[IllegalArgumentException] {
      AdcIngest.rollback(spark, dir, 1L)
    }
    assert(ex.getMessage.contains("merged"))
    // cut at the high-water mark: legal no-op
    AdcIngest.rollback(spark, dir, 2L)
    assert(adcRows(dir) == before)
    // cut on the surviving boundary below the merged run: legal, drops
    // the whole merged generation (all its rows are above the cut)
    AdcIngest.rollback(spark, dir, 0L)
    assert(AdcIngest.lastBatch(spark, dir) == 0L)
    assert(adcRows(dir) == adcRows(dir).filter(_._1 < 3000))
    assert(adcRows(dir).keySet == (0L until 3000L).toSet)
    // rolled-back ids re-ingest
    assert(AdcIngest.append(spark, vecs(3000, 3150), dir, 1L))
  }

  test("adc readAsOf: boundary snapshots exact, merged-run cuts refused") {
    val dir = tmp("adc_asof")
    AdcIngest.bootstrap(spark, vecs(0, 3000), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(3000, 3150), dir, 1L)
    val pre2 = adcRows(dir)
    AdcIngest.append(spark, vecs(3150, 3300), dir, 2L)
    def asOf(g: Long): Map[Long, (Long, Seq[Int], Double)] =
      AdcIngest.readAsOf(spark, dir, g).collect().map { r =>
        r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("cluster_id"), r.getAs[Seq[Int]]("codes"),
            r.getAs[Double]("vn")))
      }.toMap
    // as-of(1) is bit-identical to what a reader saw before batch 2
    assert(asOf(1L) == pre2)
    assert(asOf(0L).keySet == (0L until 3000L).toSet)
    assert(asOf(2L) == adcRows(dir))
    // beyond history: loud refusal
    assert(intercept[IllegalArgumentException] {
      AdcIngest.readAsOf(spark, dir, 3L)
    }.getMessage.contains("high-water mark"))
    // after a tiered merge of {1,2}: the boundary cuts survive, the
    // cut INSIDE the merged run is refused (its files hold batch-2
    // rows a batch<=1 filter cannot exclude)
    assert(AdcIngest.tieredCompact(spark, dir, ratio = 4.0) ==
      Seq(1L, 2L))
    assert(asOf(0L).keySet == (0L until 3000L).toSet)
    assert(asOf(2L) == adcRows(dir))
    assert(intercept[IllegalArgumentException] {
      AdcIngest.readAsOf(spark, dir, 1L)
    }.getMessage.contains("merged"))
  }

  test("adc rollback crash window: meta-first leaves healable remnants") {
    val dir = tmp("rollback_crash")
    AdcIngest.bootstrap(spark, vecs(0, 1000), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(1000, 1100), dir, 1L)
    AdcIngest.append(spark, vecs(1100, 1200), dir, 2L)
    // simulate a rollback-to-0 that crashed right after its meta write:
    // the high-water mark says 0 but generations 1 and 2 still exist
    graft.etl.Load.replaceTable(spark, Seq(0L).toDF("last_batch"),
      s"$dir/meta")
    // remnants never serve and never count
    assert(AdcIngest.index(spark, dir).count() == 1000L)
    assert(AdcIngest.segmentCount(spark, dir) == 1)
    // the next rollback heals instead of misdiagnosing a merged tree
    AdcIngest.rollback(spark, dir, 0L)
    val fs = hadoopFs(dir)
    assert(!fs.exists(new Path(s"$dir/index/batch=1")))
    assert(!fs.exists(new Path(s"$dir/index/batch=2")))
    // and the lifecycle continues: the rolled-back id re-lands
    assert(AdcIngest.append(spark, vecs(1000, 1100), dir, 1L))
    assert(AdcIngest.index(spark, dir).count() == 1100L)
  }

  test("invidx rollback: rebuilt globals, re-ingest parity, crash heal, " +
      "merged-run refusal") {
    val dir = tmp("ix_rollback")
    InvertedIndex.build(spark, docs(0, 4000), dir)
    InvertedIndex.addBatch(spark, docs(4000, 4200), dir, 1L)
    InvertedIndex.addBatch(spark, docs(4200, 4400), dir, 2L)
    val s12 = searchRows(dir)
    InvertedIndex.rollback(spark, dir, 1L)
    assert(InvertedIndex.lastBatch(spark, dir) == 1L)
    assert(InvertedIndex.segmentCount(spark, dir) == 2)
    // BM25 globals rebuilt exactly from the surviving generations
    val c = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    assert(c.getAs[Long]("n_docs") == 4200L &&
      c.getAs[Long]("sum_dl") == 42000L)
    val s1 = searchRows(dir)
    assert(s1 != s12) // the cut actually changed what serves
    // rolled-back ids re-ingest bit-identically
    assert(InvertedIndex.addBatch(spark, docs(4200, 4400), dir, 2L))
    assert(searchRows(dir) == s12)
    // crash window: a rollback wrote its corpus row (the commit
    // point) but died before deleting batch=2 — the remnant must
    // never serve, and the next rollback heals it
    graft.etl.Load.replaceTable(spark,
      Seq((4200L, 42000L, 1L)).toDF("n_docs", "sum_dl", "last_batch"),
      s"$dir/corpus")
    assert(searchRows(dir) == s1)
    assert(InvertedIndex.segmentCount(spark, dir) == 2)
    InvertedIndex.rollback(spark, dir, 1L)
    val fs = hadoopFs(dir)
    assert(!fs.exists(new Path(s"$dir/postings/batch=2")))
    assert(InvertedIndex.addBatch(spark, docs(4200, 4400), dir, 2L))
    assert(searchRows(dir) == s12)
    // a cut INSIDE a tiered-merged run is refused; the boundary below
    // it stays legal
    assert(InvertedIndex.tieredCompact(spark, dir, ratio = 4.0) ==
      Seq(1L, 2L))
    val ex = intercept[IllegalArgumentException] {
      InvertedIndex.rollback(spark, dir, 1L)
    }
    assert(ex.getMessage.contains("merged"))
    InvertedIndex.rollback(spark, dir, 0L)
    assert(InvertedIndex.lastBatch(spark, dir) == 0L)
    assert(InvertedIndex.segmentCount(spark, dir) == 1)
    val c0 = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    assert(c0.getAs[Long]("n_docs") == 4000L &&
      c0.getAs[Long]("sum_dl") == 40000L)
  }

  test("recover: empty/truncated manifest heals instead of wedging") {
    val dir = tmp("tiered_manifest")
    InvertedIndex.build(spark, docs(0, 1000), dir)
    InvertedIndex.addBatch(spark, docs(1000, 1100), dir, 1L)
    val want = searchRows(dir)
    val tree = s"$dir/postings"
    val fs = hadoopFs(dir)
    val aside = new Path(s"$tree.__tiered_old")
    // a crash during the manifest write leaves a 0-byte file; per the
    // protocol nothing has moved yet — but heal defensively even if a
    // dir sits in the aside (restore-if-target-missing is safe in
    // every state)
    fs.mkdirs(aside)
    fs.create(new Path(aside, "_MANIFEST"), true).close()
    assert(fs.rename(new Path(s"$tree/batch=1"), new Path(aside, "batch=1")))
    SegmentCompaction.recover(spark, tree)
    assert(!fs.exists(aside))
    assert(fs.exists(new Path(s"$tree/batch=1")))
    assert(searchRows(dir) == want)
    // and the serving paths themselves heal (search called recover)
    fs.mkdirs(aside)
    fs.create(new Path(aside, "_MANIFEST"), true).close()
    assert(fs.rename(new Path(s"$tree/batch=1"), new Path(aside, "batch=1")))
    assert(searchRows(dir) == want)
    assert(!fs.exists(aside))
  }

  test("zero-posting docs never enter the BM25 globals (rollback-exact)") {
    import spark.implicits._
    val dir = tmp("ix_emptydoc")
    val emptyish = Seq((9000L, ""), (9001L, " ")).toDF("doc_id", "text")
    InvertedIndex.build(spark, docs(0, 100).unionByName(emptyish), dir)
    val c = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    // the whitespace-only docs produce no postings, so they must not
    // count — else rollback's rebuild-from-postings could never match
    assert(c.getAs[Long]("n_docs") == 100L &&
      c.getAs[Long]("sum_dl") == 1000L)
    // the zero-token INGEST-QUALITY counter observed both docs
    assert(c.getAs[Long]("zero_token_docs") == 2L)
    InvertedIndex.addBatch(spark,
      docs(200, 300).unionByName(Seq((9100L, "")).toDF("doc_id", "text")),
      dir, 1L)
    def row() = graft.etl.Load.readTable(spark, s"$dir/corpus").get.head()
    val c1 = row().toSeq
    assert(row().getAs[Long]("zero_token_docs") == 3L)
    val s1 = searchRows(dir)
    InvertedIndex.rollback(spark, dir, 0L)
    assert(InvertedIndex.addBatch(spark,
      docs(200, 300).unionByName(Seq((9100L, "")).toDF("doc_id", "text")),
      dir, 1L))
    // the INDEX-STATE fields are bit-identical across rollback +
    // re-ingest; zero_token_docs is a LIFETIME telemetry counter
    // (a Prometheus-counter contract: re-ingesting a rolled-back
    // batch re-OBSERVES its zero-token docs — 3 becomes 4), so it is
    // compared on its own semantics, not by bit-identity
    val c2 = row()
    val zIdx = c2.schema.fieldIndex("zero_token_docs")
    assert(c2.toSeq.zipWithIndex.filterNot(_._2 == zIdx).map(_._1)
      == c1.zipWithIndex.filterNot(_._2 == zIdx).map(_._1))
    assert(c2.getAs[Long]("zero_token_docs") == 4L)
    assert(searchRows(dir) == s1)
  }
}
