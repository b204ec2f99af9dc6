package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.etl.WriterLease
import graft.ops.{AdcIngest, InvertedIndex, SegmentCompaction}

/** The warehouse concurrency contract: (1) a single-writer lease every
  * mutator acquires — a second concurrent writer is refused loudly,
  * stale leases are taken over with a monotonic fencing token, and a
  * fenced-out zombie aborts before its commit point; (2) snapshot-
  * retained tiered merges — with `retainMs > 0` the merged generation
  * lands HIDDEN while the generations it replaces keep serving
  * byte-untouched, so a reader whose plan resolved files before the
  * merge survives the commit and serves the pre-merge snapshot;
  * vacuum publishes after the window, and every crash point of the
  * publish sequence rolls forward.
  */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/w"

  private def docs(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 29 + j), lit(500)))): _*)
        .as("text"))

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("a second concurrent writer is refused; release frees the lease") {
    val dir = tmp("lease_refuse")
    InvertedIndex.build(spark, docs(0, 100), dir)
    // a live holder (fresh timestamp, default ttl)…
    val held = WriterLease.acquire(spark, dir, "holder-A")
    // …makes every mutator refuse loudly
    val e = intercept[IllegalStateException] {
      InvertedIndex.delete(spark, dir, Seq(1L).toDF("doc_id"))
    }
    assert(e.getMessage.contains("held by 'holder-A'"))
    intercept[IllegalStateException] {
      InvertedIndex.addBatch(spark, docs(100, 110), dir, 1L)
    }
    intercept[IllegalStateException] { InvertedIndex.compact(spark, dir) }
    WriterLease.release(spark, held)
    assert(InvertedIndex.delete(spark, dir, Seq(1L).toDF("doc_id")) == 1L)
  }

  test("stale-lease takeover: monotonic fencing token, zombie aborts " +
      "at its commit point") {
    val dir = tmp("lease_fence")
    fs(dir).mkdirs(new Path(dir))
    val a = WriterLease.acquire(spark, dir, "zombie")
    Thread.sleep(5)
    // a taker-over deeming 1 ms of silence stale gets the NEXT token
    // (the acquirer's ttl is the staleness horizon it asserts)
    val b = WriterLease.acquire(spark, dir, "usurper", ttlMs = 1L)
    assert(b.token == a.token + 1)
    assert(WriterLease.fenceToken(spark, dir) == b.token)
    // the zombie's pre-commit check fails — it can never publish over
    // the usurper's work
    val e = intercept[IllegalArgumentException] {
      WriterLease.check(spark, a)
    }
    assert(e.getMessage.contains("superseded"))
    WriterLease.check(spark, b) // the usurper is fine
    // the zombie's release is a no-op on the usurper's lease
    WriterLease.release(spark, a)
    assert(WriterLease.held(spark, dir))
    WriterLease.release(spark, b)
    assert(!WriterLease.held(spark, dir))
  }

  test("the fence counts every mutation and mutators always release") {
    val dir = tmp("lease_count")
    InvertedIndex.build(spark, docs(0, 100), dir) // 1
    val f1 = WriterLease.fenceToken(spark, dir)
    assert(f1 == 1L && !WriterLease.held(spark, dir))
    InvertedIndex.addBatch(spark, docs(100, 110), dir, 1L) // 2
    InvertedIndex.delete(spark, dir, Seq(5L).toDF("doc_id")) // 3
    InvertedIndex.compact(spark, dir) // 4
    assert(WriterLease.fenceToken(spark, dir) == 4L)
    assert(!WriterLease.held(spark, dir), "no mutator may leak a lease")
    // a FAILED mutation releases too (replay refused → loud throw …)
    intercept[Exception] {
      InvertedIndex.addBatch(spark, docs(200, 210), dir, 5L)
    }
    assert(!WriterLease.held(spark, dir))
  }

  test("snapshot retention: a reader planned before a tiered merge " +
      "survives the commit and serves the pre-merge snapshot") {
    val dir = tmp("snap_read")
    InvertedIndex.build(spark, docs(0, 800), dir)
    InvertedIndex.addBatch(spark, docs(800, 830), dir, 1L)
    InvertedIndex.addBatch(spark, docs(830, 860), dir, 2L)
    val terms = Seq("w17", "w42", "w133")
    val expect = InvertedIndex.search(spark, dir, terms, 30)
      .collect().toSeq.map(_.toSeq)
    // the slow reader: plan resolved (files pinned) BEFORE the merge
    val slowReader = InvertedIndex.search(spark, dir, terms, 30)
    val preStamps = SegmentCompaction.fileStamps(spark, s"$dir/postings")
    // merge with a retention window: committed but NOT published
    val merged = InvertedIndex.tieredCompact(spark, dir,
      retainMs = 24L * 3600 * 1000)
    assert(merged == Seq(1L, 2L))
    assert(SegmentCompaction.pending(spark, s"$dir/postings").nonEmpty)
    // every pre-merge file byte-untouched (the hidden merged dir is
    // new, but nothing the reader pinned moved or died)
    assert(SegmentCompaction.fileStamps(spark, s"$dir/postings")
      .filterNot(_._1.contains("/.merged-")) == preStamps)
    // the in-flight reader completes, serving the pre-merge snapshot
    assert(slowReader.collect().toSeq.map(_.toSeq) == expect)
    // new readers are also correct (both views are the same physical
    // rows — the merge is a pure move)
    assert(InvertedIndex.search(spark, dir, terms, 30)
      .collect().toSeq.map(_.toSeq) == expect)
    // maintenance BACKS OFF while the window is open
    assert(InvertedIndex.tieredCompact(spark, dir,
      retainMs = 3600 * 1000L).isEmpty)
    // vacuum publishes: generations collapse, results identical
    assert(InvertedIndex.vacuum(spark, dir) == Seq(1L, 2L))
    assert(SegmentCompaction.pending(spark, s"$dir/postings").isEmpty)
    assert(InvertedIndex.segmentCount(spark, dir) == 2) // 0 + merged 1
    assert(InvertedIndex.search(spark, dir, terms, 30)
      .collect().toSeq.map(_.toSeq) == expect)
    assert(InvertedIndex.vacuum(spark, dir).isEmpty, "vacuum idempotent")
  }

  test("publish crash windows roll forward on the next entry") {
    val terms = Seq("w17", "w42", "w133")
    // window A: crashed between moving the lowest gen aside and the
    // merged-dir swap (live batch=1 missing, .merged-1 present)
    val a = tmp("snap_crash_a")
    InvertedIndex.build(spark, docs(0, 800), a)
    InvertedIndex.addBatch(spark, docs(800, 830), a, 1L)
    InvertedIndex.addBatch(spark, docs(830, 860), a, 2L)
    val expectA = InvertedIndex.search(spark, a, terms, 30)
      .collect().toSeq.map(_.toSeq)
    InvertedIndex.tieredCompact(spark, a, retainMs = 3600 * 1000L)
    val fsa = fs(a)
    assert(fsa.rename(new Path(s"$a/postings/batch=1"),
      new Path(s"$a/postings/.old-1")))
    // next read heals (rolls FORWARD — the pre-merge view is gone)
    assert(InvertedIndex.search(spark, a, terms, 30)
      .collect().toSeq.map(_.toSeq) == expectA)
    assert(SegmentCompaction.pending(spark, s"$a/postings").isEmpty)
    assert(!fsa.exists(new Path(s"$a/postings/.old-1")) &&
      !fsa.exists(new Path(s"$a/postings/batch=2")))
    // window B: crashed right after the merged-dir swap (live batch=1
    // carries the _MERGED_IDS marker, replaced gens still present)
    val b = tmp("snap_crash_b")
    InvertedIndex.build(spark, docs(0, 800), b)
    InvertedIndex.addBatch(spark, docs(800, 830), b, 1L)
    InvertedIndex.addBatch(spark, docs(830, 860), b, 2L)
    val expectB = InvertedIndex.search(spark, b, terms, 30)
      .collect().toSeq.map(_.toSeq)
    InvertedIndex.tieredCompact(spark, b, retainMs = 3600 * 1000L)
    val fsb = fs(b)
    assert(fsb.rename(new Path(s"$b/postings/batch=1"),
      new Path(s"$b/postings/.old-1")))
    assert(fsb.rename(new Path(s"$b/postings/.merged-1"),
      new Path(s"$b/postings/batch=1")))
    assert(InvertedIndex.search(spark, b, terms, 30)
      .collect().toSeq.map(_.toSeq) == expectB)
    assert(!fsb.exists(new Path(s"$b/postings/.old-1")) &&
      !fsb.exists(new Path(s"$b/postings/batch=2")) &&
      !fsb.exists(new Path(s"$b/postings/batch=1/_MERGED_IDS")))
  }

  test("rollback and full compact discard an unpublished merge " +
      "instead of racing its publish") {
    val dir = tmp("snap_discard")
    InvertedIndex.build(spark, docs(0, 800), dir)
    InvertedIndex.addBatch(spark, docs(800, 830), dir, 1L)
    InvertedIndex.addBatch(spark, docs(830, 860), dir, 2L)
    InvertedIndex.tieredCompact(spark, dir, retainMs = 3600 * 1000L)
    assert(SegmentCompaction.pending(spark, s"$dir/postings").nonEmpty)
    // rollback to batch 0: gens 1, 2 die; the pending merged dir
    // covering them must die too, or a later publish would resurrect
    InvertedIndex.rollback(spark, dir, 0L)
    assert(SegmentCompaction.pending(spark, s"$dir/postings").isEmpty)
    assert(InvertedIndex.lastBatch(spark, dir) == 0L)
    val expect0 = InvertedIndex.search(spark, dir,
      Seq("w17", "w42"), 20).collect().toSeq.map(_.toSeq)
    val fresh = tmp("snap_discard_fresh")
    InvertedIndex.build(spark, docs(0, 800), fresh)
    assert(InvertedIndex.search(spark, fresh, Seq("w17", "w42"), 20)
      .collect().toSeq.map(_.toSeq) == expect0)
    // same for the vector twin through full compact
    val vdir = tmp("snap_discard_adc")
    def vecs(from: Long, until: Long) = spark.range(from, until).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), j =>
        (pmod(hash(col("id") * 13 + j), lit(1000))
          .cast(org.apache.spark.sql.types.DoubleType) / 100.0)
          .cast(org.apache.spark.sql.types.FloatType)).as("embedding"))
    AdcIngest.bootstrap(spark, vecs(0, 500), vdir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(500, 520), vdir, 1L)
    AdcIngest.append(spark, vecs(520, 540), vdir, 2L)
    val n0 = AdcIngest.index(spark, vdir).count()
    assert(AdcIngest.tieredCompact(spark, vdir,
      retainMs = 3600 * 1000L) == Seq(1L, 2L))
    AdcIngest.compact(spark, vdir)
    assert(SegmentCompaction.pending(spark, s"$vdir/index").isEmpty)
    assert(AdcIngest.index(spark, vdir).count() == n0)
  }
}
