package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Load
import graft.ops.IncrementalDedup

/** Incremental near-dup dedup against the persisted signature index:
  * the probe+merge cycle must (a) emit exactly the pairs a from-scratch
  * rebuild over corpus ∪ batch would emit for the batch, and (b) leave
  * every untouched bucket's files BYTE-identical — the claim that daily
  * dedup cost scales with the batch, not the corpus.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/idx"

  private def fileBytes(dir: String): Map[String, Seq[Byte]] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString -> Files.readAllBytes(p).toSeq)
      .toMap
  }

  /** Docs with unique 4-token texts -> 2 unique shingles each. */
  private def mkDocs(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, s"w${i}a w${i}b w${i}c w${i}d")).toDF("doc_id", "text")

  private def sh(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      graft.functions.ShingleExpression.wordShingles(
        split(col("text"), " ")).as("sh"))
    .filter(size(col("sh")) > 0)

  /** From-scratch replay: capped band self-join over ALL rows, pairs
    * with at least one side in `batchIds` — the oracle shape q136 pins
    * cross-engine, here recomputed in-process for arbitrary inputs.
    */
  private def rebuildPairs(all: DataFrame, batchIds: Set[Long]): Set[(Long, Long)] = {
    val rows = IncrementalDedup.bandRows(IncrementalDedup.signatures(all))
    val hot = rows.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n")).filter(col("n") > IncrementalDedup.BandCap)
      .select(col("band"), col("sig"))
    val capped = rows.join(hot, Seq("band", "sig"), "left_anti")
    capped.as("a").join(capped.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => batchIds(p._1) || batchIds(p._2)).toSet
  }

  private def probePairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe+merge equals the from-scratch rebuild, batch-scoped I/O") {
    val dir = tmp("inc_dedup")
    val buckets = 8
    val base = mkDocs(0L to 9L)
    // batch: one new unique doc + an exact re-ingest of doc 3's text
    // under a new id (planted batch-vs-corpus near-dup)
    val batch = mkDocs(Seq(100L))
      .unionByName(Seq((103L, "w3a w3b w3c w3d")).toDF("doc_id", "text"))

    val baseBands = IncrementalDedup.bandRows(
      IncrementalDedup.signatures(sh(base)))
    IncrementalDedup.mergeSignatures(spark, baseBands, dir, buckets)
    assert(spark.read.parquet(dir).count() == 40) // 10 docs x 4 bands

    val before = fileBytes(dir)
    val batchBands = IncrementalDedup.bandRows(
      IncrementalDedup.signatures(sh(batch)))
      .transform(graft.ops.Relational.eager)
    val got = probePairs(
      IncrementalDedup.probe(spark, batchBands, dir, buckets))
    val want = rebuildPairs(sh(base.unionByName(batch)), Set(100L, 103L))
    assert(got == want)
    assert(got.contains((3L, 103L))) // the planted near-dup surfaced

    IncrementalDedup.mergeSignatures(spark, batchBands, dir, buckets)
    // untouched buckets: same files, same bytes
    val touched = batchBands
      .select(Load.keyBucket(Seq(col("band"), col("sig")), buckets)
        .as("b")).distinct().collect().map(_.getInt(0))
      .map(b => s"__bucket=$b").toSet
    val after = fileBytes(dir)
    val untouchedBefore = before.filter(f => !touched.exists(f._1.startsWith))
    assert(untouchedBefore.nonEmpty, "test needs untouched buckets")
    assert(after.filter(f => !touched.exists(f._1.startsWith)) ==
      untouchedBefore)
    // merged index serves the union (one row per doc x band)
    assert(spark.read.parquet(dir).count() == 48)
  }

  test("probe PRUNES the index scan to the batch's bucket dirs in-plan") {
    val dir = tmp("inc_dedup3")
    val buckets = 64
    val base = mkDocs(0L to 49L) // 200 band rows spread over 64 buckets
    IncrementalDedup.mergeSignatures(spark,
      IncrementalDedup.bandRows(IncrementalDedup.signatures(sh(base))),
      dir, buckets)
    // 1-doc batch: 4 band rows touch at most 4 of the 64 bucket dirs
    val batchBands = IncrementalDedup.bandRows(
      IncrementalDedup.signatures(sh(mkDocs(Seq(500L)))))
      .transform(graft.ops.Relational.eager)
    val nTouched = batchBands
      .select(Load.keyBucket(Seq(col("band"), col("sig")), buckets).as("b"))
      .distinct().count()
    assert(nTouched <= 4)
    val pairs = IncrementalDedup.probe(spark, batchBands, dir, buckets)
    // the index scan must carry a partition filter on __bucket — the
    // scoped-I/O claim as a plan property, not just a wall-clock one
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__bucket"),
      s"probe plan lost the __bucket partition filter:\n$plan")
  }

  test("second probe of the same corpus is idempotent on the index") {
    val dir = tmp("inc_dedup2")
    val buckets = 8
    val base = mkDocs(0L to 5L)
    IncrementalDedup.mergeSignatures(spark,
      IncrementalDedup.bandRows(IncrementalDedup.signatures(sh(base))),
      dir, buckets)
    val batchBands = IncrementalDedup.bandRows(
      IncrementalDedup.signatures(sh(mkDocs(Seq(50L)))))
      .transform(graft.ops.Relational.eager)
    IncrementalDedup.mergeSignatures(spark, batchBands, dir, buckets)
    val onceRows = spark.read.parquet(dir).collect().map(_.toString).sorted
    // re-running the SAME batch converges: identical row set, and a
    // fresh probe emits no pairs (the unique doc matches only itself,
    // which the doc_id inequality excludes)
    IncrementalDedup.mergeSignatures(spark, batchBands, dir, buckets)
    assert(spark.read.parquet(dir).collect().map(_.toString).sorted
      .sameElements(onceRows))
    assert(spark.read.parquet(dir).count() == 28)
    assert(probePairs(IncrementalDedup.probe(
      spark, batchBands, dir, buckets)).isEmpty)
  }
}
