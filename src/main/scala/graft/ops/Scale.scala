package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.BinaryType

/** Skew and layout tools for the 100 TB path. AQE handles most skew
  * automatically (`spark.sql.adaptive.skewJoin`), but two patterns are
  * worth owning explicitly: salting a join whose hot keys AQE can't
  * split (e.g. broadcast-ineligible dimension with a mega-key), and
  * two-phase aggregation for hot group keys.
  */
object Scale {

  /** Salted equi-join for a skewed LEFT side: the left's hot keys are
    * spread across `salts` sub-keys with a deterministic per-row salt;
    * the right side is replicated `salts` times so every sub-key finds
    * its match. Correct for inner/left-semi equi-joins on `keys`.
    * Trade-off: right side grows ×salts — use when right ≪ left but is
    * above the broadcast threshold, and left has hot keys.
    */
  /** Join types for which replicating the right side is semantically
    * invisible. "right"/"full" would emit the ×salts replicas of
    * unmatched right rows — fail fast instead of silently duplicating.
    */
  private val SaltableJoinTypes =
    Set("inner", "left_semi", "leftsemi", "left_anti", "leftanti",
      "left", "left_outer", "leftouter")

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    require(SaltableJoinTypes(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType " +
        "(right/full outer would duplicate unmatched right rows ×salts)")
    // content-INDEPENDENT salt: a row-hash salt silently collapses when
    // the hot key's rows are identical (a repeated sentinel record —
    // the exact shape salting exists for, every copy → one bucket).
    // monotonically_increasing_id spreads every physical row regardless
    // of content; the result set is salt-invariant, so determinism of
    // the salt itself is not required
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(typedLit((0 until salts).toArray)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (keys, salt), then final-aggregate on keys. Only for algebraic
    * aggregates; sum/count provided (avg = sum/count downstream).
    * (Spark's hash aggregate already does map-side partials — this
    * additionally breaks up a hot REDUCE key across `salts` tasks.)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // content-independent spread — see saltedJoin's salt rationale
    val salt = pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int")
    df.withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Repartition by key columns to co-locate a downstream chain of
    * joins/aggregations on the same key (one shuffle amortized over
    * several stages — AQE reuses the exchange).
    */
  def colocateBy(df: DataFrame, keys: Seq[String], partitions: Int): DataFrame =
    df.repartition(partitions, keys.map(col): _*)

  /** Date-partitioned parquet sink: the physical layout that turns the
    * reference's daily-equality filter (W1) into partition PRUNING —
    * a day's query reads one directory, not the table.
    */
  def writePartitionedByDay(df: DataFrame, tsCol: Column, dir: String): Unit =
    df.withColumn("day", date_format(tsCol, "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

  /** Range-sorted parquet layout for data skipping: repartitionByRange
    * on the sort columns gives each output file a DISJOINT value range,
    * and sortWithinPartitions orders rows inside it — so parquet's
    * per-file and per-row-group min/max statistics let a range or point
    * filter skip every non-overlapping file without reading it. At
    * 100 TB this is the difference between a filter scanning the table
    * and scanning ~1/numFiles of it; the single-column form of what a
    * Z-order/Hilbert layout generalizes to multiple dimensions.
    * (The range partitioner samples the data to pick balanced bounds —
    * one extra pass, paid once at write time.)
    */
  def writeRangeSorted(df: DataFrame, sortCols: Seq[String], dir: String,
                       files: Int): Unit = {
    require(sortCols.nonEmpty && files > 0)
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** Morton (Z-order) interleave of two non-negative integer columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Points
    * close in (a, b) space get close z-values, so range-partitioning by
    * the z-value clusters BOTH dimensions at once. Inputs must fit in
    * `bits` bits (≤ 31 each with the default 21+21 → 42-bit long).
    */
  def morton2(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .plus(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .plus(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Z-ordered parquet layout: the two-dimensional generalization of
    * [[writeRangeSorted]]. Range-partition + sort on the interleaved
    * z-value gives every output file a compact RECTANGLE of (colA,
    * colB) space instead of a slab of one dimension, so parquet min/max
    * statistics skip files for a predicate on EITHER column (a linear
    * sort on colA leaves colB spanning its full range in every file —
    * colB filters skip nothing). The single-curve special case of what
    * Delta/Iceberg expose as OPTIMIZE ZORDER BY. The z-value is a
    * transient write-time column; the stored schema is unchanged.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, dir: String,
                    files: Int): Unit = {
    require(files > 0)
    df.withColumn("__z", morton2(col(colA), col(colB)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Bucketed-table layout: pre-shuffle the table ONCE at write time
    * into `buckets` hash buckets on `key` (sorted within each bucket),
    * so every later equi-join or aggregation on `key` against another
    * table bucketed the same way plans with ZERO exchanges — the
    * amortize-the-shuffle layout for 100 TB fact tables that are
    * repeatedly joined on the same key. Registered through the session
    * catalog (`saveAsTable`) because bucket metadata lives there, not
    * in the parquet footer.
    */
  /** Drop `table` from the catalog AND delete any leftover warehouse
    * files: a PREVIOUS session's managed-table files can survive in
    * the warehouse dir while this session's in-memory catalog starts
    * empty — saveAsTable then refuses the orphaned location.
    */
  private def dropManagedTable(spark: org.apache.spark.sql.SparkSession,
                               table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$wh/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Register `df` as a managed catalog table (replacing any previous
    * incarnation) — the precondition for catalog-level facilities:
    * `ANALYZE TABLE` statistics, CBO join planning (q112), bucketed
    * layouts ([[writeBucketed]]).
    */
  def saveManagedTable(df: DataFrame, table: String): Unit = {
    dropManagedTable(df.sparkSession, table)
    df.write.mode("overwrite").saveAsTable(table)
  }

  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String): Unit = {
    require(buckets > 0)
    dropManagedTable(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Bloom-filter-pruned equi-join: build a Bloom filter over the
    * dimension side's join keys (Spark's own `BloomFilterAggregate` —
    * mergeable, one partial sketch per partition, one final merge),
    * then drop fact rows that cannot possibly match BEFORE the join's
    * shuffle. False positives survive the prune but are removed by the
    * actual join, so the result is exactly the plain inner join — the
    * prune only moves work: at 100 TB a fact-side shuffle is the
    * dominant cost, and a 1%-selective dimension means ~99% of shuffle
    * bytes never leave the mapper. This is the manual form of AQE's
    * runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter),
    * usable when the optimizer can't see the selectivity — e.g. the
    * dimension is the output of an upstream graft pipeline stage.
    *
    * Keys are xxhash64-combined, so multi-column keys cost one LONG
    * per row in the sketch. `expectedItems` sizes the filter (~1.2 MB
    * per million at the default FPP); the sketch rides into the fact
    * scan as a literal, i.e. the same ship-a-small-table mechanics as
    * a broadcast hint but bytes-bounded regardless of dim row width.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                      expectedItems: Long = 1L << 20): DataFrame = {
    require(keys.nonEmpty, "bloomPrunedJoin needs at least one key column")
    def keyHash(df: DataFrame): Column = xxhash64(keys.map(df(_)): _*)
    val sketchCol = graftbridge.column(
      new BloomFilterAggregate(
        graftbridge.expression(keyHash(dim)), expectedItems)
        .toAggregateExpression())
    // one row × numBits/8 bytes — the bounded-by-construction collect
    // shape (same class as the k-means model in VectorOps)
    val sketch = dim.select(sketchCol.as("bf")).head().getAs[Array[Byte]](0)
    val pruned =
      if (sketch == null) fact.limit(0) // empty dim: nothing can match
      else fact.filter(graftbridge.column(BloomFilterMightContain(
        Literal(sketch, BinaryType),
        graftbridge.expression(keyHash(fact)))))
    pruned.join(dim, keys)
  }

  /** Write parquet with a NATIVE parquet bloom filter on `bloomCol` —
    * the storage-side point-lookup structure complementing the
    * query-side [[bloomPrunedJoin]]: the filter lives in the file
    * footer, so a `col = k` / `col IN (...)` scan skips whole row
    * groups whose bloom rejects k WITHOUT reading any data pages
    * (Spark's parquet reader applies bloom row-group filtering under
    * `spark.sql.parquet.filterPushdown`, default on). Min/max stats
    * can't do this for high-cardinality keys scattered across the
    * file — every row group spans the full key range — which is
    * exactly the needle-in-100 TB lookup shape. Dictionary encoding
    * is disabled for the column because a dictionary page is itself a
    * complete row-group key list: at real cardinalities it overflows
    * and silently stops filtering, while the bloom stays O(ndv) bits
    * with a bounded false-positive rate. `rowGroupBytes` sizes
    * `parquet.block.size` — the skipping granularity.
    */
  def writeWithBloom(df: DataFrame, bloomCol: String, expectedNdv: Long,
                     dir: String, rowGroupBytes: Long = 1L << 20): Unit =
    df.write.mode("overwrite")
      .option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
      .option(s"parquet.bloom.filter.expected.ndv#$bloomCol",
        expectedNdv.toString)
      .option(s"parquet.enable.dictionary#$bloomCol", "false")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(dir)

  /** Per-row-group bloom-filter footer offsets for `column` across all
    * parquet files under `dir` (−1 = that row group has no bloom) —
    * the layout assertion surface for [[writeWithBloom]]: callers
    * `require` every offset ≥ 0 to pin that the write really produced
    * the structure the read path's skipping depends on. Footer-only
    * reads — no data pages touched.
    */
  def parquetBloomOffsets(spark: org.apache.spark.sql.SparkSession,
                          dir: String, column: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(st.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          r.getFooter.getBlocks.asScala.toSeq.map { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .map(_.getBloomFilterOffset)
              .getOrElse(-1L)
          }
        } finally r.close()
      }
  }

  /** Incremental partial-aggregate maintenance: fold a new batch into
    * a persisted aggregate state of shape (keys..., agg_sum, agg_cnt)
    * WITHOUT rescanning history — the batch is reduced to its own
    * partial rows first (map-side combine, one small shuffle over the
    * batch only), then merged with the state by re-aggregating the
    * union. At 100 TB this is the difference between a daily refresh
    * that reads one day and one that reads three years; it is the
    * batch twin of the streaming jobs' running aggregates, and because
    * sum/count are commutative monoids the folded state is exactly the
    * full recompute (q102 pins that equality against the oracle).
    * sum must be over an exact (decimal/long) type — a double sum
    * would drift from the recompute by fold order.
    * avg/stddev derive from (sum, cnt, sumsq) the same way; distinct
    * counts need the HLL sketch path (q103) instead.
    */
  def incrementalAgg(state: Option[DataFrame], batch: DataFrame,
                     keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "incrementalAgg needs at least one key column")
    require(!keys.contains("agg_sum") && !keys.contains("agg_cnt"),
      "key columns must not collide with the state columns agg_sum/agg_cnt")
    val partial = batch.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as("agg_sum"), count(col(valueCol)).as("agg_cnt"))
    state match {
      case None => partial
      case Some(st) => st.unionByName(partial)
        .groupBy(keys.map(col): _*)
        .agg(sum(col("agg_sum")).as("agg_sum"), sum(col("agg_cnt")).as("agg_cnt"))
    }
  }

  /** Retention expiry for a partitioned table: drop whole `dayCol=`
    * partition dirs whose value sorts strictly below `cutoff` (ISO
    * date/month strings compare lexicographically). Deleting a
    * directory is O(1) metadata work per expired partition — no data
    * file is read or rewritten, the retention twin of the scoped
    * merge. Heals any crashed-swap remnant first so an expired
    * partition can't resurrect from a stale `.__old`. Returns the
    * dropped partition values.
    */
  def expirePartitions(spark: org.apache.spark.sql.SparkSession,
                       dir: String, dayCol: String,
                       cutoff: String): Seq[String] = {
    graft.etl.Load.recoverSwap(spark, dir)
    graft.etl.Load.recoverScopedSwaps(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val prefix = s"$dayCol="
    val expired = fs.listStatus(p).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      // '%' marks a URL-escaped partition value (written by some other
      // tool — our scoped merges refuse them): its dir name doesn't
      // compare like its value, so never expire it by name
      .filter(n => n.startsWith(prefix) && !n.contains("%") &&
        n.stripPrefix(prefix) < cutoff)
      .sorted
    expired.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$n"), true))
    expired.map(_.stripPrefix(prefix))
  }

  /** Small-file compaction for a parquet table dir: incremental sinks
    * (per-day inserts, streaming micro-batches) accumulate files far
    * below the ideal scan unit, and at 100 TB the resulting task-per-
    * tiny-file overhead dominates scans. Rewrite into
    * ceil(bytes / targetFileBytes) files via a staged write + atomic
    * rename (same never-half-written contract as Load.upsert).
    * Returns the new file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetFileBytes: Long = 512L * 1024 * 1024): Int = {
    // heal any stale __old from a crashed prior swap BEFORE sizing the
    // rewrite — and again inside atomicSwap before the renames
    graft.etl.Load.recoverSwap(spark, dir)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val staging = s"$dir.__compacting"
    spark.read.parquet(dir).repartition(parts)
      .write.mode("overwrite").parquet(staging)
    // rename-aside with return-value checks, shared with Load.upsert —
    // never delete-then-rename (a crash between delete and rename would
    // leave no table at the serving path)
    graft.etl.Load.atomicSwap(spark, staging, dir)
    fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Contiguous 0-based global row numbers in `order` without the
    * single-partition collapse: `row_number() OVER (ORDER BY …)` with
    * no PARTITION BY plans EVERY row through one task (`Exchange
    * SinglePartition` — the plan shape GlobalIndexSpec pins as the
    * trap), which is a driver-shaped bottleneck at any real scale.
    *
    * Two-pass form instead: (1) a normal distributed range-partitioned
    * sort; (2) one bounded counting job whose result — #partitions
    * rows — prefix-sums into per-partition offsets on the driver;
    * (3) a streaming per-partition index + offset. Pass 3 is genuine
    * per-partition imperative logic (a window over
    * spark_partition_id() would re-shuffle rows that are already
    * perfectly placed), so it is one of the few mapPartitions in this
    * codebase.
    *
    * The sorted frame is pinned with localCheckpoint BEFORE counting:
    * repartitionByRange SAMPLES its boundaries, so two actions over an
    * unpinned lineage could see DIFFERENT partitionings and silently
    * desync the offsets from the data. localCheckpoint fails loudly if
    * its blocks are lost — at cluster scale substitute a reliable
    * checkpoint/parquet spill, never a best-effort cache.
    *
    * `order` must be a total order (include a unique tiebreaker) or
    * numbering within ties is partition-placement-dependent.
    */
  def globalRowNumber(df: DataFrame, outCol: String,
                      order: Column*): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    // __pid is appended as the LAST field and read back positionally;
    // a caller column with that name would be silently replaced
    // in-place and the positional reads below would corrupt both the
    // schema and the offsets — fail loudly instead
    require(!df.columns.contains("__pid"),
      "globalRowNumber: input already has a __pid column — rename it")
    require(!df.columns.contains(outCol),
      s"globalRowNumber: input already has a $outCol column")
    val pinned = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = pinned.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = counts.keys.toSeq.sorted
      .foldLeft(Map.empty[Int, Long] -> 0L) { case ((m, acc), pid) =>
        (m + (pid -> acc), acc + counts(pid))
      }._1
    val bc = pinned.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = org.apache.spark.sql.types.StructType(
      pinned.schema.fields.dropRight(1) :+
        org.apache.spark.sql.types.StructField(outCol, LongType,
          nullable = false))
    pinned.mapPartitions { rows =>
      var idx = -1L
      rows.map { r =>
        if (idx < 0) idx = bc.value(r.getInt(r.length - 1))
        val out = Row.fromSeq(r.toSeq.init :+ idx)
        idx += 1
        out
      }
    }(Encoders.row(outSchema))
  }
}
