package graft.etl

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Relational.{antiJoin, dedupKeepLast, dedupKeepLastPositional, requireNonNull, semiJoin}

/** Parquet-warehouse sinks with the reference's load semantics
  * (SURVEY.md §2.9): PK-merge upsert for master data (K2), duplicate-PK
  * guarded insert for transactional data (K1 + J3), quarantine side
  * sinks for dropped rows (K5, W3, J4/J5).
  *
  * Scale notes: upsert = read-union-dedup-overwrite staged to a temp
  * dir then atomically swapped — the parquet-world MERGE. At 100 TB the
  * same code applies per partition (overwrite only touched partitions);
  * batching/pacing/retry of the reference's HTTP sink (K3/K4) is
  * subsumed by Spark task parallelism + task retry.
  */
object Load {

  private def tableExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Crash recovery for [[upsert]]'s two-rename swap: a crash between
    * "old aside" and "staging in" leaves the table only at `dir.__old`
    * — restore it; a crash after "staging in" leaves a stale `__old`
    * alongside the new table — drop it. Idempotent; called by both
    * readers and writers so whichever touches the table first heals it.
    */
  private[graft] def recoverSwap(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val old = new Path(s"$dir.__old")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(old)) {
      if (fs.exists(p)) fs.delete(old, true) // swap completed; stale aside
      else fs.rename(old, p) // swap died mid-way; restore previous table
    }
  }

  /** Heal-then-swap shared by every staged writer ([[swapIn]],
    * [[graft.ops.Scale.compact]]): recover any stale `__old` from a
    * prior crash FIRST (otherwise rename(dir, old) would move the live
    * table inside the stale directory), then swap `staging` in with two
    * return-value-checked renames. A failed second rename restores the
    * previous table before aborting — the serving path is never left
    * empty.
    */
  private[graft] def atomicSwap(spark: SparkSession, staging: String,
                                dir: String): Unit = {
    recoverSwap(spark, dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(s"$dir.__old")
    if (fs.exists(p) && !fs.rename(p, old))
      throw new IllegalStateException(
        s"swap aborted: cannot move $dir aside to $old")
    if (!fs.rename(new Path(staging), p)) {
      if (fs.exists(old)) fs.rename(old, p)
      throw new IllegalStateException(
        s"swap aborted: cannot move $staging into $dir (previous table restored)")
    }
    fs.delete(old, true)
  }

  def readTable(spark: SparkSession, dir: String): Option[DataFrame] = {
    recoverSwap(spark, dir)
    if (tableExists(spark, dir)) Some(spark.read.parquet(dir)) else None
  }

  /** K2 batch UPSERT: existing rows lose to incoming rows on PK match.
    * Staged write + rename so the target is never half-written and the
    * read-own-target hazard (overwriting a dir being scanned) is
    * avoided.
    */
  def upsert(spark: SparkSession, df: DataFrame, dir: String, pk: String): Long = {
    // The reference dedupes the INCOMING frame keep-last by pk before
    // merging (etl/load.py:50-55). Without this, a batch carrying
    // duplicate PKs would seed the warehouse with duplicate rows on the
    // bootstrap write, and later merges would pick a nondeterministic
    // winner among them (__prio ties). NOTE: "last" is positional
    // (monotonically_increasing_id), meaningful only for frames whose
    // physical row order carries arrival order — fresh file scans, a
    // foreachBatch micro-batch. For a post-shuffle frame the winner
    // among intra-batch duplicates is partitioning-dependent; such
    // callers should pre-dedupe with an explicit ordering column via
    // dedupKeepLast before calling upsert.
    val incoming = dedupKeepLastPositional(df, Seq(pk)).withColumn("__prio", lit(1))
    val merged = readTable(spark, dir) match {
      case Some(existing) =>
        dedupKeepLast(
          existing.withColumn("__prio", lit(0)).unionByName(incoming),
          Seq(pk), Seq(col("__prio")))
          .drop("__prio")
      case None => incoming.drop("__prio")
    }
    swapIn(spark, merged, dir)
  }

  /** Replace the whole table with `df` through the same staged-write +
    * rename-aside swap as [[upsert]] — the full-refresh sink for
    * callers whose merge logic lives upstream (e.g. the streaming
    * incremental-agg job folds state BEFORE writing). Returns the new
    * row count.
    */
  def replaceTable(spark: SparkSession, df: DataFrame, dir: String): Long =
    swapIn(spark, df, dir)

  /** Stage `merged` next to `dir`, then swap it in with two renames —
    * never delete-then-rename: a crash after a DELETE would leave NO
    * table at the serving path and the next run's readTable(None) would
    * silently bootstrap from the new batch alone. With rename-aside,
    * every crash point leaves the full previous or the full new table
    * recoverable — [[recoverSwap]] heals either direction on the next
    * read or write. Returns the new row count.
    */
  private def swapIn(spark: SparkSession, merged: DataFrame,
                     dir: String): Long = {
    val staging = s"$dir.__staging"
    merged.write.mode("overwrite").parquet(staging)
    atomicSwap(spark, staging, dir)
    spark.read.parquet(dir).count()
  }

  /** CDC batch apply — the MERGE the reference's warehouse cannot
    * express: `changes` carries the business key, an op column
    * (`"u"` = upsert, `"d"` = delete; case-insensitive), and the new
    * attribute values. The LAST change per key in batch order wins
    * (same positional contract as [[upsert]]); surviving upserts
    * replace/insert their key, deletes remove theirs, untouched keys
    * pass through. One anti-join + union over the existing table, then
    * the same crash-safe swap as upsert.
    */
  def applyCdc(spark: SparkSession, changes: DataFrame, dir: String,
               pk: String, opCol: String = "op"): Long = {
    require(changes.columns.contains(opCol), s"changes lacks op column $opCol")
    // fail fast on malformed ops: a NULL op would otherwise slip past
    // the "u"-filter below (lower(null) =!= "d" is null → row dropped)
    // while its key still lands in `touched` — unannounced deletion
    val badOps = changes
      .filter(col(opCol).isNull || !lower(col(opCol)).isin("u", "d"))
      .limit(1).count()
    if (badOps > 0) throw new IllegalArgumentException(
      s"applyCdc: $opCol contains values outside {u, d} (or NULL)")
    val lastPerKey = dedupKeepLastPositional(changes, Seq(pk))
    val upserts = lastPerKey.filter(lower(col(opCol)) =!= "d").drop(opCol)
    val touched = lastPerKey.select(col(pk))
    val merged = readTable(spark, dir) match {
      case Some(existing) =>
        antiJoin(existing, touched, Seq(pk)).unionByName(upserts)
      case None => upserts
    }
    swapIn(spark, merged, dir)
  }

  /** K1 validated INSERT with J3 duplicate-PK abort: if any incoming PK
    * already exists in the target, the load fails before writing
    * (reference etl/load.py:59-85).
    *
    * `partitionDay`: name of an ISO-date string column to day-partition
    * the table by (written as a derived `day` partition column, the
    * source column stays in the data). This is the 100 TB layout for
    * daily-incremental tables: each run appends into its own day
    * directories and a day-equality query prunes to one directory
    * instead of scanning the table.
    */
  def insert(spark: SparkSession, df: DataFrame, dir: String,
             pk: Option[String] = None,
             partitionDay: Option[String] = None): Long = {
    // the incoming plan is consumed up to three times (dup probe, count,
    // write) — persist so the upstream transforms run once. If the
    // CALLER already persisted (wider fan-out than ours), leave their
    // cache alone: an unconditional unpersist here would evict it.
    val alreadyCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val cached = if (alreadyCached) df else df.persist()
    try {
      for (key <- pk; existing <- readTable(spark, dir)) {
        val dups = semiJoin(cached.select(col(key)), existing, Seq(key)).count()
        if (dups > 0) throw new IllegalStateException(
          s"insert into $dir aborted: $dups incoming rows duplicate existing PK $key")
      }
      val n = cached.count()
      partitionDay match {
        case Some(c) => cached.withColumn("day", col(c))
          .write.mode("append").partitionBy("day").parquet(dir)
        case None => cached.write.mode("append").parquet(dir)
      }
      n
    } finally if (!alreadyCached) cached.unpersist()
  }

  /** W3 required-non-null split: quarantine rows with nulls in required
    * columns to a CSV side sink (etl/load.py:33-37,136-154), return the
    * clean rows.
    */
  def requireColumns(df: DataFrame, required: Seq[String],
                     quarantineDir: String): DataFrame = {
    if (required.isEmpty) return df
    val (good, bad) = requireNonNull(df, required)
    writeQuarantine(bad, quarantineDir)
    good
  }

  /** J4/J5 FK enforcement: rows whose key is absent from the referenced
    * table are quarantined (drop_missing_* mode, etl/load.py:88-198);
    * valid rows pass through.
    */
  def enforceFk(df: DataFrame, referenced: DataFrame, key: String,
                quarantineDir: String): DataFrame = {
    val keys = referenced.select(col(key)).na.drop().distinct()
    writeQuarantine(antiJoin(df, keys, Seq(key)), quarantineDir)
    semiJoin(df, broadcast(keys), Seq(key))
  }

  /** K5 quarantine CSV sink (an empty dir is written when nothing was
    * dropped — auditability over cleverness, mirroring the reference's
    * always-produced artifacts).
    */
  private def writeQuarantine(bad: DataFrame, dir: String): Unit =
    bad.write.mode("overwrite").option("header", "true").csv(dir)
}
