package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Load

/** Partition/bucket-scoped merge: the whole-table upsert/applyCdc
  * rewrite was the last O(table)-per-batch pattern in the repo — these
  * tests pin the scoped forms' core claim with BYTE-level evidence:
  * after a merge, every file of every untouched partition/bucket is
  * bit-identical (same path, same bytes), i.e. untouched data was
  * never rewritten, while touched scopes merge to exactly the
  * whole-table semantics.
  */
class ScopedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/t"

  /** Every data file under `dir` as relativePath -> full bytes. */
  private def fileBytes(dir: String): Map[String, Seq[Byte]] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString ->
        Files.readAllBytes(p).toSeq)
      .toMap
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("upsertPartitioned rewrites only the touched day partitions") {
    val dir = tmp("up_day")
    val seed = Seq(
      ("2024-01-01", "k1", "a"), ("2024-01-01", "k2", "b"),
      ("2024-01-02", "k3", "c"), ("2024-01-03", "k4", "d"))
      .toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, seed, dir, "pk")
    assert(sortedRows(spark.read.parquet(dir).select("day", "pk", "v")) ==
      sortedRows(seed))

    val before = fileBytes(dir)
    // batch touches ONLY 2024-01-02: update k3, insert k5
    val batch = Seq(("2024-01-02", "k3", "C2"), ("2024-01-02", "k5", "e"))
      .toDF("day", "pk", "v")
    val n = Load.upsertPartitioned(spark, batch, dir, "pk")
    assert(n == 2) // merged rows across the touched day: k3 + k5

    val after = fileBytes(dir)
    val untouchedBefore = before.filter(!_._1.startsWith("day=2024-01-02"))
    val untouchedAfter = after.filter(!_._1.startsWith("day=2024-01-02"))
    // untouched partitions: same files, same bytes
    assert(untouchedAfter == untouchedBefore)
    // touched partition rewritten
    assert(after.keySet.filter(_.startsWith("day=2024-01-02")) !=
      before.keySet.filter(_.startsWith("day=2024-01-02")))

    val want = Seq(
      ("2024-01-01", "k1", "a"), ("2024-01-01", "k2", "b"),
      ("2024-01-02", "k3", "C2"), ("2024-01-02", "k5", "e"),
      ("2024-01-03", "k4", "d")).toDF("day", "pk", "v")
    assert(sortedRows(spark.read.parquet(dir).select("day", "pk", "v")) ==
      sortedRows(want))
  }

  test("upsertBucketed matches whole-table upsert; untouched buckets byte-identical") {
    val dir = tmp("up_bkt")
    val whole = tmp("up_whole")
    val seed = spark.range(200)
      .select(concat(lit("k"), col("id")).as("pk"),
        col("id").cast("string").as("v"))
    Load.upsertBucketed(spark, seed, dir, "pk", buckets = 8)
    Load.upsert(spark, seed, whole, "pk")

    val before = fileBytes(dir)
    val batch = Seq(("k3", "NEW3"), ("k777", "new")).toDF("pk", "v")
    Load.upsertBucketed(spark, batch, dir, "pk", buckets = 8)
    Load.upsert(spark, batch, whole, "pk")

    // scoped result == whole-table semantics
    assert(sortedRows(spark.read.parquet(dir).select("pk", "v")) ==
      sortedRows(spark.read.parquet(whole).select("pk", "v")))

    // the two touched buckets are exactly where k3/k777 hash; every
    // OTHER bucket's files are bit-identical
    val touched = Seq("k3", "k777").map(k =>
      s"__bucket=" + seed.sparkSession.range(1)
        .select(pmod(xxhash64(lit(k)), lit(8L)).cast("int"))
        .head.getInt(0)).toSet
    def untouched(m: Map[String, Seq[Byte]]) =
      m.filter { case (p, _) => !touched.exists(p.startsWith) }
    assert(untouched(fileBytes(dir)) == untouched(before))
    assert(touched.size <= 2 && before.keySet.exists(p =>
      touched.exists(p.startsWith))) // sanity: the touched set is real

    // layout guards: wrong bucket count / non-bucketed dir fail fast
    intercept[IllegalArgumentException] {
      Load.upsertBucketed(spark, batch, dir, "pk", buckets = 16)
    }
    intercept[IllegalArgumentException] {
      Load.upsertBucketed(spark, batch, whole, "pk", buckets = 8)
    }
  }

  test("applyCdcBucketed: deletes, updates, inserts — scoped to touched buckets") {
    val dir = tmp("cdc_bkt")
    val whole = tmp("cdc_whole")
    val seed = spark.range(100)
      .select(concat(lit("k"), col("id")).as("pk"),
        col("id").cast("string").as("v"))
    Load.upsertBucketed(spark, seed, dir, "pk", buckets = 4)
    Load.upsert(spark, seed, whole, "pk")

    val changes = Seq(
      ("k5", "V5", "u"), ("k6", null, "d"), ("k500", "ins", "u"))
      .toDF("pk", "v", "op")
    Load.applyCdcBucketed(spark, changes, dir, "pk", buckets = 4)
    Load.applyCdc(spark, changes, whole, "pk")
    assert(sortedRows(spark.read.parquet(dir).select("pk", "v")) ==
      sortedRows(spark.read.parquet(whole).select("pk", "v")))
    // malformed op still fails fast
    intercept[IllegalArgumentException] {
      Load.applyCdcBucketed(spark,
        Seq(("k1", "x", "upsert")).toDF("pk", "v", "op"), dir, "pk", 4)
    }
  }

  test("applyCdcPartitioned scopes deletes and upserts to named days") {
    val dir = tmp("cdc_day")
    val seed = Seq(
      ("2024-01-01", "k1", "a"), ("2024-01-01", "k2", "b"),
      ("2024-01-02", "k3", "c"), ("2024-01-03", "k4", "d"))
      .toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, seed, dir, "pk")
    val before = fileBytes(dir)
    // update k1, delete k2 (both day 1), insert k5 into day 2
    val changes = Seq(
      ("2024-01-01", "k1", "A2", "u"), ("2024-01-01", "k2", null, "d"),
      ("2024-01-02", "k5", "e", "u")).toDF("day", "pk", "v", "op")
    Load.applyCdcPartitioned(spark, changes, dir, "pk")
    val want = Seq(
      ("2024-01-01", "k1", "A2"), ("2024-01-02", "k3", "c"),
      ("2024-01-02", "k5", "e"), ("2024-01-03", "k4", "d"))
      .toDF("day", "pk", "v")
    assert(sortedRows(spark.read.parquet(dir).select("day", "pk", "v")) ==
      sortedRows(want))
    // day 3 untouched: byte-identical files
    assert(fileBytes(dir).filter(_._1.startsWith("day=2024-01-03")) ==
      before.filter(_._1.startsWith("day=2024-01-03")))
  }

  test("an all-deletes batch can empty a whole partition") {
    val dir = tmp("cdc_empty")
    // two keys that land in the same 2-bucket layout bucket, plus one
    // in the other
    val seed = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("pk", "v")
    Load.upsertBucketed(spark, seed, dir, "pk", buckets = 2)
    val byBucket = spark.read.parquet(dir)
      .groupBy("__bucket").agg(collect_list("pk").as("pks"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).sorted).toMap
    // delete every key of one populated bucket
    val (victim, keys) = byBucket.find(_._2.nonEmpty).get
    val dels = keys.map(k => (k, null: String, "d")).toDF("pk", "v", "op")
    Load.applyCdcBucketed(spark, dels, dir, "pk", buckets = 2)
    val left = spark.read.parquet(dir)
    assert(left.filter(col("__bucket") === victim).count() == 0)
    assert(left.count() == 3 - keys.size)
  }

  test("expirePartitions drops only pre-cutoff dirs, untouched files intact") {
    val dir = tmp("ret")
    val seed = Seq(
      ("2024-01-05", "k1", "a"), ("2024-02-05", "k2", "b"),
      ("2024-03-05", "k3", "c")).toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, seed, dir, "pk")
    val before = fileBytes(dir)
    val dropped = graft.ops.Scale.expirePartitions(
      spark, dir, "day", "2024-02-01")
    assert(dropped == Seq("2024-01-05"))
    val after = fileBytes(dir)
    // surviving partitions byte-identical; expired one gone
    assert(after == before.filter(!_._1.startsWith("day=2024-01-05")))
    assert(spark.read.parquet(dir).select("pk").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("k2", "k3"))
    // idempotent; nothing left below the cutoff
    assert(graft.ops.Scale.expirePartitions(
      spark, dir, "day", "2024-02-01").isEmpty)
  }

  test("a NULL scope value (day or pk) fails fast instead of losing rows") {
    val dir = tmp("null_scope")
    val withNullDay = Seq((Some("2024-01-01"), "k1", "a"),
      (Option.empty[String], "k2", "b")).toDF("day", "pk", "v")
    val e1 = intercept[IllegalArgumentException] {
      Load.upsertPartitioned(spark, withNullDay, dir, "pk")
    }
    assert(e1.getMessage.contains("NULL day"))
    // bucketed layout: xxhash64(null) is the seed, so a null pk maps
    // to a real bucket deterministically — merged like any key, no loss
    val nullPkDir = tmp("null_pk")
    val withNullPk = Seq((Some("k1"), "a"), (Option.empty[String], "b"))
      .toDF("pk", "v")
    Load.upsertBucketed(spark, withNullPk, nullPkDir, "pk", 4)
    Load.upsertBucketed(spark,
      Seq((Option.empty[String], "b2")).toDF("pk", "v"),
      nullPkDir, "pk", 4)
    val m = spark.read.parquet(nullPkDir).select("pk", "v").collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(m == Map(Some("k1") -> "a", None -> "b2"))
  }

  test("re-running the same batch converges after a mid-merge crash") {
    // a multi-scope merge can die between per-scope swaps, leaving
    // some days merged and others not; the contract is that replaying
    // the SAME batch converges to the full merge. Emulate the crash
    // state by restoring one touched day from a pre-merge backup.
    val dir = tmp("crash_mid")
    val seed = Seq(
      ("2024-01-01", "k1", "a"), ("2024-01-02", "k2", "b"),
      ("2024-01-03", "k3", "c")).toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, seed, dir, "pk")
    val backup = fileBytes(dir) // pre-merge state of every partition

    val batch = Seq( // touches days 1 and 2
      ("2024-01-01", "k1", "A2"), ("2024-01-02", "k9", "new"))
      .toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, batch, dir, "pk")
    val fullMerge = sortedRows(spark.read.parquet(dir).select("day", "pk", "v"))

    // "crash": day 2's swap never happened — restore its old files
    val d2 = Paths.get(s"$dir/day=2024-01-02")
    Files.walk(d2).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists)
    Files.createDirectories(d2)
    backup.filter(_._1.startsWith("day=2024-01-02")).foreach {
      case (rel, bytes) =>
        Files.write(Paths.get(s"$dir/$rel"), bytes.toArray)
    }
    // replaying the identical batch converges to the full merge
    Load.upsertPartitioned(spark, batch, dir, "pk")
    assert(sortedRows(spark.read.parquet(dir).select("day", "pk", "v")) ==
      fullMerge)
  }

  test("scope values needing path escaping are rejected, not mis-swapped") {
    val dir = tmp("esc")
    Load.upsertPartitioned(spark,
      Seq(("2024-01-01", "k1", "a")).toDF("day", "pk", "v"), dir, "pk")
    val e = intercept[IllegalArgumentException] {
      Load.upsertPartitioned(spark,
        Seq(("2024:01:02", "k2", "b")).toDF("day", "pk", "v"), dir, "pk")
    }
    assert(e.getMessage.contains("path escaping"))
    // table untouched by the refused merge
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("scoped merge fails loudly on a non-deterministic batch") {
    val dir = tmp("nd_guard")
    val seed = Seq(("2024-01-01", "k1", "a")).toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, seed, dir, "pk")
    // a day column that yields a DIFFERENT value on every evaluation —
    // the pathological form of limit/sample/rand batches: the scope
    // list is collected from one evaluation, the staging write re-runs
    // the plan and stages rows under days not in that list. Without
    // the staged-scope guard those rows silently vanish with staging.
    val ndDay = udf(() => "d" + NdClock.next.getAndIncrement())
      .asNondeterministic()
    val batch = Seq(("k9", "z")).toDF("pk", "v").withColumn("day", ndDay())
    val e = intercept[IllegalStateException] {
      Load.upsertPartitioned(spark, batch, dir, "pk")
    }
    assert(e.getMessage.contains("non-deterministic"))
    // the refused merge left the table (and no staging debris) behind
    assert(sortedRows(spark.read.parquet(dir).select("day", "pk", "v")) ==
      sortedRows(seed))
    assert(!Files.exists(Paths.get(s"$dir.__scoped_staging")))
  }

  test("readTable heals a crashed per-partition swap remnant") {
    val dir = tmp("heal")
    val seed = Seq(("2024-01-01", "k1", "a"), ("2024-01-02", "k2", "b"))
      .toDF("day", "pk", "v")
    Load.upsertPartitioned(spark, seed, dir, "pk")
    // simulate a crash between the two renames: the partition dir was
    // moved aside but the staging dir never made it in
    val part = Paths.get(s"$dir/day=2024-01-02")
    Files.move(part, Paths.get(s"$dir/day=2024-01-02.__old"))
    val healed = Load.readTable(spark, dir).get
    assert(sortedRows(healed.select("day", "pk", "v")) == sortedRows(seed))
    assert(Files.exists(part) &&
      !Files.exists(Paths.get(s"$dir/day=2024-01-02.__old")))
  }
}

/** Executor-visible monotonic counter backing the non-determinism
  * guard test (local mode shares the JVM, so a static suffices).
  */
object NdClock {
  val next = new java.util.concurrent.atomic.AtomicLong()
}
