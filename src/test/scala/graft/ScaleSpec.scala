package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Scale

/** Skew/layout operators: salting must be a pure performance rewrite
  * (bit-identical results), and the partitioned sink must actually
  * prune at read time.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the shape AQE-less salting targets
  private lazy val skewed = spark.range(0, 20000)
    .select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      (col("id") % 1000).cast("double").as("v"))

  private lazy val dim = spark.range(0, 100)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

  test("AQE splits the skewed partition of a shuffle join (skew=true " +
      "in the final adaptive plan)") {
    // the runtime complement to manual salting: AQE detects the
    // oversized post-shuffle partition and splits it into sub-reads,
    // each joined against a duplicated build side — no key rewrite,
    // no result change. Thresholds are lowered so the 20k-row fixture
    // crosses the same code path a 100 TB hot key would.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec,
      SortMergeJoinExec}
    val helper = new AdaptiveSparkPlanHelper {}
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // bigger fixture than `skewed`: the skew detector reads COMPRESSED
      // shuffle-partition sizes, so the hot key needs real volume, and
      // `pad` depends on data so it shuffles with the rows instead of
      // being constant-folded above the join
      val fat = spark.range(0, 100000)
        .select(
          when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
            .as("k"),
          (col("id") % 1000).cast("double").as("v"),
          lpad(col("id").cast("string"), 64, "x").as("pad"))
      val j = fat.join(dim, Seq("k"))
      // run THIS frame's own query execution (a count() would plan and
      // adapt a separate one, leaving this plan isFinalPlan=false)
      assert(j.queryExecution.toRdd.count() == 100000)

      val skewJoins = helper.collectWithSubqueries(
        j.queryExecution.executedPlan) {
        case s: SortMergeJoinExec if s.isSkewJoin => s: Any
        case s: ShuffledHashJoinExec if s.isSkewJoin => s: Any
      }
      assert(skewJoins.nonEmpty,
        s"no skew-handled join in:\n${j.queryExecution.executedPlan}")

      // and it is purely a physical rewrite: same rows as the plain join
      val plain = fat.drop("pad").join(dim, Seq("k"))
      val got = j.drop("pad")
      assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join, inner and left_semi") {
    val plain = skewed.join(dim, Seq("k"))
    val salted = Scale.saltedJoin(skewed, dim, Seq("k"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    val plainSemi = skewed.join(dim.filter(col("k") < 50), Seq("k"), "left_semi")
    val saltedSemi = Scale.saltedJoin(
      skewed, dim.filter(col("k") < 50).select("k"), Seq("k"), 8, "left_semi")
    assert(saltedSemi.count() == plainSemi.count())
  }

  test("saltedSumCount equals plain groupBy sum/count") {
    val got = Scale.saltedSumCount(skewed, Seq("k"), "v", salts = 8)
    val want = skewed.groupBy("k")
      .agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("writePartitionedByDay prunes partitions on a day filter") {
    val dir = Files.createTempDirectory("part_out").toString
    val events = graft.tables.Tables.events(spark, sfDir)
    Scale.writePartitionedByDay(events, col("ts"), dir)

    val oneDay = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    assert(oneDay.count() ==
      events.filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count())
    // physical proof of pruning: the scan's partition filters carry the
    // predicate, and only one of ~30 day-directories is read
    val scan = oneDay.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
      s"day filter not pushed to partition pruning:\n$scan")
  }

  test("salting spreads a hot key even when its rows are IDENTICAL") {
    // a repeated sentinel record: every copy is bit-identical, so a
    // row-content hash would put the whole hot key in ONE salt bucket
    // and the salting would silently do nothing
    val sentinel = spark.range(0, 8192)
      .select(lit(7L).as("k"), lit(1.0).as("v"))
    val salted = sentinel
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(16L))
        .cast("int"))
    val buckets = salted.select("__salt").distinct().count()
    assert(buckets > 8, s"identical rows collapsed to $buckets salt buckets")
    // and the aggregate over the salted path is still exact
    val got = Scale.saltedSumCount(sentinel, Seq("k"), "v", 16).collect()
    assert(got.length == 1 && got(0).getDouble(1) == 8192.0 &&
      got(0).getLong(2) == 8192L)
  }

  test("writeRangeSorted yields disjoint per-file ranges (data skipping)") {
    val dir = Files.createTempDirectory("rangesort").toString + "/t"
    val df = spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      // shuffle the input so the layout is the writer's doing, not luck
      .orderBy(org.apache.spark.sql.functions.md5(col("k").cast("string")))
    Scale.writeRangeSorted(df, Seq("k"), dir, files = 8)

    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(parts.length == 8)
    // per-file min/max from reading each file alone: ranges must be
    // pairwise disjoint — the property parquet stats-based skipping
    // (and any engine's file pruning) relies on
    val ranges = parts.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("k")), max(col("k"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $hi >= $lo2")
      case _ =>
    }
    // and nothing was lost in the re-layout
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("compact merges an accumulation of tiny files, preserving data") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    // 20 incremental appends of 50 rows each -> >= 20 small files
    (0 until 20).foreach { i =>
      spark.range(i * 50, (i + 1) * 50).toDF("id")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 20)
    val after = Scale.compact(spark, dir, targetFileBytes = 1024L * 1024 * 1024)
    assert(after == 1, s"expected 1 compacted file, got $after")
    val ids = spark.read.parquet(dir).collect().map(_.getLong(0)).sorted
    assert(ids.length == 1000 && ids.head == 0L && ids.last == 999L)
  }

  test("bloomPrunedJoin equals the plain join and actually prunes") {
    import spark.implicits._
    val fact = spark.range(0, 10000)
      .select(col("id") % 1000 as "k", col("id") as "v")
    val dim = spark.range(0, 1000).filter(col("id") % 37 === 0)
      .select(col("id") as "k", (col("id") * 2) as "w")
    val got = Scale.bloomPrunedJoin(fact, dim, Seq("k"))
      .select("k", "v", "w").as[(Long, Long, Long)].collect().sorted
    val want = fact.join(dim, Seq("k"))
      .select("k", "v", "w").as[(Long, Long, Long)].collect().sorted
    assert(got.sameElements(want) && want.nonEmpty)

    // multi-column key
    val fact2 = fact.withColumn("k2", col("k") % 7)
    val dim2 = dim.withColumn("k2", col("k") % 7)
    val got2 = Scale.bloomPrunedJoin(fact2, dim2, Seq("k", "k2")).count()
    assert(got2 == fact2.join(dim2, Seq("k", "k2")).count())

    // empty dimension → empty result, no blow-up
    assert(Scale.bloomPrunedJoin(fact, dim.limit(0), Seq("k")).count() == 0)

    // the filter really drops non-candidates before the join: with a
    // tight sketch, surviving fact rows ≈ matching keys' rows, far
    // below the full fact table
    val sketchCount = Scale.bloomPrunedJoin(fact, dim, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(sketchCount.contains("might_contain"))
  }

  test("incrementalAgg fold equals the full recompute, any batch split") {
    import spark.implicits._
    val raw = spark.range(0, 5000)
      .select(col("id"), (col("id") % 13) as "k",
        (col("id") * 3).cast("decimal(18,2)") as "v")
    val full = raw.select("k", "v")
    // uneven batches, including an empty one mid-fold
    val batches = Seq(
      raw.filter(col("id") % 4 === 0), raw.filter(col("id") % 4 === 1),
      raw.limit(0), raw.filter(col("id") % 4 >= 2)).map(_.select("k", "v"))
    val state = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (st, b) => Some(Scale.incrementalAgg(st, b, Seq("k"), "v"))
    }.get
    val want = full.groupBy("k")
      .agg(sum("v") as "agg_sum", count("v") as "agg_cnt")
    val got = state.select("k", "agg_sum", "agg_cnt")
      .as[(Long, BigDecimal, Long)].collect().sortBy(_._1)
    val exp = want.select("k", "agg_sum", "agg_cnt")
      .as[(Long, BigDecimal, Long)].collect().sortBy(_._1)
    assert(got.sameElements(exp))
  }

  test("parquet-native bloom filter skips row groups for absent keys") {
    // data deliberately hash-scattered: every row group spans the full
    // key range, so min/max stats prune NOTHING — any skipping below
    // is the bloom filter's. 200k rows / 256 KB groups ≈ dozens of
    // groups; keys are the even numbers, probes are odd (absent).
    val base = Files.createTempDirectory("graft_bloom").toString
    val df = spark.range(0, 200000)
      .select((col("id") * 2).as("k"), rand(42).as("payload"))
      .orderBy(xxhash64(col("k")))
    Scale.writeWithBloom(df, "k", expectedNdv = 20000,
      s"$base/bloom", rowGroupBytes = 256 * 1024)
    df.write.option("parquet.enable.dictionary#k", "false")
      .option("parquet.block.size", (256 * 1024).toString)
      .parquet(s"$base/plain")

    // layout: every row group of the bloom copy carries a filter; the
    // plain copy carries none
    val offs = Scale.parquetBloomOffsets(spark, s"$base/bloom", "k")
    assert(offs.size > 4, s"expected several row groups, got ${offs.size}")
    assert(offs.forall(_ >= 0), s"row groups missing blooms: $offs")
    assert(Scale.parquetBloomOffsets(spark, s"$base/plain", "k")
      .forall(_ == -1L))

    // behavior: an absent-key probe against the bloom copy reads zero
    // rows out of the scan (every row group rejected from the footer);
    // the plain copy must surface rows from every group (stats can't
    // prune a scattered layout). No exchange in the plan, so the scan
    // leaf's metric is the rows the reader actually decoded.
    def scannedRows(dir: String): Long = {
      val q = spark.read.parquet(dir)
        .filter(col("k").isin(99991L, 99993L, 99995L))
      assert(q.count() == 0)
      val scan = q.queryExecution.executedPlan.collectLeaves().head
      q.collect()
      scan.metrics("numOutputRows").value
    }
    val bloomRows = scannedRows(s"$base/bloom")
    val plainRows = scannedRows(s"$base/plain")
    assert(bloomRows == 0,
      s"bloom layout decoded $bloomRows rows for an absent key")
    assert(plainRows == 200000L,
      s"scattered plain layout should decode everything, got $plainRows")

    // and present-key lookups are layout-invariant
    val got = spark.read.parquet(s"$base/bloom")
      .filter(col("k") === 123456L).count()
    assert(got == 1)
  }
}
