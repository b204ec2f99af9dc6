package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.IncrementalDedup
import graft.streaming.StreamingJobs

/** Streaming incremental near-dup twin (runNearDupAvailableNow):
  * two-wave stream parity with the from-scratch probe, exactly-once
  * across a restart, and replay idempotence — the arguments the
  * runner's crash-safety rests on, each pinned.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val buckets = 4

  private def tmp(p: String) =
    Files.createTempDirectory(p).toString

  // wave 1: three near-dup groups + singletons; wave 2 re-states two
  // wave-1 texts verbatim (cross-wave dups) and carries its own pair
  private val wave1 = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "spark shuffles wide joins across executor partitions evenly"),
    (4L, "a completely unrelated sentence about parquet row groups"),
    (5L, "minhash banding groups similar documents into shared buckets"))
  private val wave2 = Seq(
    (21L, "the quick brown fox jumps over the lazy dog today"),
    (22L, "minhash banding groups similar documents into shared buckets"),
    (23L, "minhash banding groups similar documents into shared bucket"),
    (24L, "fresh text that matches nothing else in either wave"))

  private def writeWave(srcDir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(srcDir)

  private def pairSet(dir: String): Set[(Long, Long)] =
    graft.etl.Load.readTable(spark, dir)
      .map(_.select(col("da"), col("db")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
      .getOrElse(Set.empty)

  private def shingled(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text").select(col("doc_id"),
        graft.functions.ShingleExpression.wordShingles(
          split(col("text"), " ")).as("sh"))
      .filter(size(col("sh")) > 0)

  test("two waves through the runner == from-scratch probe over all docs") {
    val (src, idx, pairs, ckpt) =
      (tmp("ndup_src"), tmp("ndup_idx") + "/t", tmp("ndup_pairs") + "/t",
        tmp("ndup_ckpt"))
    writeWave(src, wave1)
    StreamingJobs.runNearDupAvailableNow(spark, src, idx, pairs, buckets,
      ckpt).awaitTermination()
    writeWave(src, wave2)
    StreamingJobs.runNearDupAvailableNow(spark, src, idx, pairs, buckets,
      ckpt).awaitTermination()

    // every pair involves at least one doc that was new when its wave
    // arrived, so the accumulated pair table must equal the
    // from-scratch probe of ALL docs against an empty index
    val fresh = tmp("ndup_fresh") + "/t"
    val allRows = graft.ops.Relational.eager(IncrementalDedup.bandRows(
      IncrementalDedup.signatures(shingled(wave1 ++ wave2))))
    val expect = IncrementalDedup.probe(spark, allRows, fresh, buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expect.nonEmpty) // the fixture plants real dups
    assert(pairSet(pairs) == expect)

    // restart with the same checkpoint and no new files: a no-op —
    // neither the pair table nor the index changes
    val before = pairSet(pairs)
    val idxBefore = graft.etl.Load.readTable(spark, idx).get
      .agg(count(lit(1)), max(md5(concat_ws("|", col("doc_id"),
        col("band"), col("sig"))))).collect()(0)
    StreamingJobs.runNearDupAvailableNow(spark, src, idx, pairs, buckets,
      ckpt).awaitTermination()
    assert(pairSet(pairs) == before)
    val idxAfter = graft.etl.Load.readTable(spark, idx).get
      .agg(count(lit(1)), max(md5(concat_ws("|", col("doc_id"),
        col("band"), col("sig"))))).collect()(0)
    assert(idxAfter == idxBefore)
  }

  test("replayed micro-batch is idempotent (crash-between-merge-and-commit)") {
    val (idx, pairs) = (tmp("ndup_idx2") + "/t", tmp("ndup_pairs2") + "/t")
    val dd = IncrementalDedup
    val boot = graft.ops.Relational.eager(
      dd.bandRows(dd.signatures(shingled(wave1))))
    dd.mergeSignatures(spark, boot, idx, buckets)

    def applyBatch(): Unit = {
      val rows = graft.ops.Relational.eager(
        dd.bandRows(dd.signatures(shingled(wave2))))
      val p = dd.probe(spark, rows, idx, buckets)
        .withColumn("pair_key", concat_ws("_", col("da"), col("db")))
      graft.etl.Load.upsert(spark, p, pairs, "pair_key")
      dd.mergeSignatures(spark, rows, idx, buckets)
    }
    applyBatch()
    val once = pairSet(pairs)
    assert(once.nonEmpty)
    // the replay: identical batch against an index that ALREADY holds
    // its signatures — probe must emit the same pairs, upsert must be
    // a no-op
    applyBatch()
    assert(pairSet(pairs) == once)
  }
}
