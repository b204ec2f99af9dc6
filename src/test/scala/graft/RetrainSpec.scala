package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.etl.{Load, WriterLease}
import graft.ops.AdcIngest

/** AdcIngest.retrain — the drift responder: models re-fit on current
  * live vectors, every generation re-encoded behind ONE root swap.
  * Pins: high-water mark + tombstone ledger + generation membership
  * survive; deletes are physically purged by the re-encode; coverage
  * is required loudly; readAsOf refuses cross-epoch cuts (and rollback
  * clamps the floor); the root-swap crash window heals on every entry;
  * the re-encoded warehouse is bit-identical to a fresh encode of the
  * same vectors under the same (persisted) models.
  */
class RetrainSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/w"

  private def vecs(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)), j =>
        (pmod(hash(col("id") * 13 + j), lit(1000)).cast(DoubleType) / 100.0)
          .cast(FloatType)).as("embedding"))

  test("retrain: hwm/membership/tombstones survive, deletes purge " +
      "physically, model epoch advances, appends continue") {
    val dir = tmp("rt_core")
    AdcIngest.bootstrap(spark, vecs(0, 300), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(300, 340), dir, 1L)
    AdcIngest.append(spark, vecs(340, 380), dir, 2L)
    assert(AdcIngest.delete(spark, dir,
      Seq(5L, 305L, 345L).toDF("vec_id")) == 3L)
    val preMembership = AdcIngest.index(spark, dir)
      .select(col("vec_id")).as[Long].collect().toSet
    val n = AdcIngest.retrain(spark, vecs(0, 380), dir,
      k = 4, m = 4, ks = 8)
    assert(n == 377L, "re-encodes every live vector, never a tombstoned one")
    assert(AdcIngest.lastBatch(spark, dir) == 2L)
    assert(AdcIngest.modelEpoch(spark, dir) == 1L)
    // membership identical; physically purged: the raw index tree no
    // longer holds the deleted ids at all
    assert(AdcIngest.index(spark, dir).select(col("vec_id"))
      .as[Long].collect().toSet == preMembership)
    assert(spark.read.parquet(s"$dir/index")
      .filter(col("vec_id").isin(5L, 305L, 345L)).count() == 0L)
    // generation membership preserved (per-gen counts)
    val perGen = spark.read.parquet(s"$dir/index")
      .groupBy(col("batch").cast("long")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perGen == Map(0L -> 299L, 1L -> 39L, 2L -> 39L))
    // delete replays stay no-ops (the ledger survived)
    assert(AdcIngest.delete(spark, dir, Seq(5L).toDF("vec_id")) == 0L)
    // ingest continues under the NEW frozen models
    assert(AdcIngest.append(spark, vecs(380, 400), dir, 3L))
    assert(AdcIngest.index(spark, dir).count() == 397L)
    // the fence carried over the swap (monotonic across retrain)
    assert(WriterLease.fenceToken(spark, dir) >= 6L)
    assert(!WriterLease.held(spark, dir))
  }

  test("re-encoded warehouse is bit-identical to a fresh encode of the " +
      "same vectors under the persisted models") {
    val dir = tmp("rt_parity")
    AdcIngest.bootstrap(spark, vecs(0, 200), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(200, 240), dir, 1L)
    AdcIngest.retrain(spark, vecs(0, 240), dir, k = 4, m = 4, ks = 8)
    val served = AdcIngest.index(spark, dir)
      .orderBy(col("vec_id")).collect().toSeq.map(_.toSeq)
    // independent re-derivation from the persisted post-retrain models
    val fresh = AdcIngest.encodeBatch(spark, vecs(0, 240), dir)
      .orderBy(col("vec_id")).collect().toSeq.map(_.toSeq)
    assert(served == fresh)
  }

  test("coverage is required loudly; readAsOf refuses cross-epoch " +
      "cuts; rollback clamps the floor") {
    val dir = tmp("rt_guard")
    AdcIngest.bootstrap(spark, vecs(0, 200), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(200, 240), dir, 1L)
    val e = intercept[IllegalArgumentException] {
      AdcIngest.retrain(spark, vecs(0, 100), dir, k = 4, m = 4, ks = 8)
    }
    assert(e.getMessage.contains("cover"))
    AdcIngest.retrain(spark, vecs(0, 240), dir, k = 4, m = 4, ks = 8)
    // cuts below the re-encode floor are refused; the head is fine
    val e2 = intercept[IllegalArgumentException] {
      AdcIngest.readAsOf(spark, dir, 0L)
    }
    assert(e2.getMessage.contains("predates the model-epoch"))
    assert(AdcIngest.readAsOf(spark, dir, 1L).count() == 240L)
    // appends above the retrain point are cuttable; rollback below the
    // floor clamps it so post-rollback appends stay cuttable
    AdcIngest.append(spark, vecs(240, 260), dir, 2L)
    assert(AdcIngest.readAsOf(spark, dir, 2L).count() == 260L)
    AdcIngest.rollback(spark, dir, 0L)
    AdcIngest.append(spark, vecs(400, 420), dir, 1L)
    assert(AdcIngest.readAsOf(spark, dir, 1L).count() == 220L,
      "post-rollback generations live under the current models — cuttable")
  }

  test("a retrain that crashed mid-root-swap heals on the next entry") {
    val dir = tmp("rt_crash")
    AdcIngest.bootstrap(spark, vecs(0, 200), dir, k = 4, m = 4, ks = 8)
    AdcIngest.append(spark, vecs(200, 240), dir, 1L)
    val pre = AdcIngest.index(spark, dir)
      .orderBy(col("vec_id")).collect().toSeq.map(_.toSeq)
    // simulate atomicSwap dying between its two renames: the whole
    // warehouse sits only at dir.__old
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(dir), new Path(s"$dir.__old")))
    // every entry heals through the root recoverSwap in lastBatch
    assert(AdcIngest.lastBatch(spark, dir) == 1L)
    assert(AdcIngest.index(spark, dir)
      .orderBy(col("vec_id")).collect().toSeq.map(_.toSeq) == pre)
    // and the warehouse is still mutable afterwards
    assert(AdcIngest.append(spark, vecs(240, 260), dir, 2L))
  }
}
