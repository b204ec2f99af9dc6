package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.StreamingJobs

/** Structured Streaming jobs driven end-to-end with the file source and
  * Trigger.AvailableNow, asserted against their batch twins on the same
  * data — the streaming/batch parity the unified DataFrame code
  * promises.
  */
class StreamingSpec extends SparkSpec {

  // the raw events parquet is TIMESTAMP(NANOS), which the streaming
  // parquet source can't ingest — stream from a micros-normalized copy
  private lazy val batchEvents = graft.tables.Tables.events(spark, sfDir)
  private lazy val eventsPath = {
    val dir = Files.createTempDirectory("events_norm").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    dir
  }

  /** Run a streaming transform of the events file source to a memory
    * sink until AvailableNow drains; returns the sink table.
    */
  private def runToMemory(name: String, mode: OutputMode,
                          f: DataFrame => DataFrame): DataFrame = {
    val stream = spark.readStream.schema(batchEvents.schema).parquet(eventsPath)
    val q = f(stream).writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory(s"ckpt_$name").toString)
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  test("dailyAgg streaming matches the batch twin (complete mode)") {
    val got = runToMemory("s_daily", OutputMode.Complete(),
      df => StreamingJobs.dailyAgg(df))
    val want = StreamingJobs.dailyAgg(batchEvents)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("hopping windows run unchanged under readStream (q107's claim)") {
    import org.apache.spark.sql.functions._
    def hop(df: DataFrame): DataFrame = df
      .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val got = runToMemory("s_hop", OutputMode.Complete(), hop)
    val want = hop(batchEvents)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("dedupEvents drops a replayed file exactly (watermark dedup)") {
    // source dir with the events file twice = an at-least-once replay
    val dir = Files.createTempDirectory("dup_src").toString
    batchEvents.write.mode("append").parquet(dir)
    batchEvents.write.mode("append").parquet(dir)
    val doubled = spark.read.parquet(dir)
    assert(doubled.count() == 2 * batchEvents.count())

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = StreamingJobs.dedupEvents(stream)
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_dedup").toString)
      .start()
    q.awaitTermination()
    assert(spark.table("s_dedup").count() == batchEvents.count())
  }

  test("sessionize emits closed sessions consistent with q37 batch") {
    // sentinel far-future event advances the watermark past every real
    // session so append mode can emit all of them (anchored to max(ts):
    // an offset from an arbitrary row can land inside the data's span
    // and leave the tail sessions unemitted)
    val maxTs = batchEvents.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val sentinel = batchEvents.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("ts", lit(maxTs) + expr("INTERVAL 30 DAYS"))
    val dir = Files.createTempDirectory("sess_src").toString
    batchEvents.unionByName(sentinel).write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = StreamingJobs.sessionize(stream)
      .writeStream.format("memory").queryName("s_sess")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_sess").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("s_sess").filter(col("user_id") >= 0)

    // batch twin: q37's per-user session counts (same 30-min gap rule)
    val want = graft.queries.EventQueries.q37Sessionize
      .run(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"))
    val gotPerUser = got.groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
    assert(gotPerUser.exceptAll(want).isEmpty && want.exceptAll(gotPerUser).isEmpty)
  }

  test("runDailyAvailableNow ingests a raw TIMESTAMP_NTZ source directly") {
    // The driver's regenerated events parquet carries ts as
    // TIMESTAMP_NTZ (isAdjustedToUTC=false) — the streaming runners
    // must take that RAW (no pre-normalized copy like the suites
    // above): StreamingJobs.normalized casts it before the watermark,
    // which legally rejects NTZ. This pins the streaming half of the
    // Tables.normalizeEventTime contract.
    import org.apache.spark.sql.types.TimestampNTZType
    val ntzDir = Files.createTempDirectory("events_ntz").toString
    batchEvents.withColumn("ts", col("ts").cast(TimestampNTZType))
      .write.mode("overwrite").parquet(ntzDir)
    // the written parquet must actually round-trip as NTZ or the test
    // proves nothing
    assert(spark.read.parquet(ntzDir).schema("ts").dataType == TimestampNTZType)
    val outDir = Files.createTempDirectory("daily_ntz_out").toString
    val q = StreamingJobs.runDailyAvailableNow(spark, ntzDir, outDir,
      Files.createTempDirectory("ckpt_daily_ntz").toString)
    q.awaitTermination()
    val got = spark.read.parquet(outDir)
    // append mode only emits windows the watermark has CLOSED — the
    // final day stays open when the source drains, so compare on the
    // emitted days (a strict subset is the documented semantics) and
    // require substantial coverage
    val want = StreamingJobs.dailyAgg(batchEvents)
    val missing = got.exceptAll(want)
    assert(got.count() > 0 && missing.isEmpty,
      s"emitted rows must be a subset of the batch twin; extra rows: ${missing.count()}")
    // 1-day lateness keeps up to the last TWO day-windows open at
    // drain (the current day plus the day inside the allowed delay)
    // × one row per event_type
    val openBudget = 2 * batchEvents.select("event_type").distinct().count()
    assert(got.count() >= want.count() - openBudget)
  }

  test("dropDuplicatesWithinWatermark collapses id-dupes with drifting ts") {
    // a retried producer re-emits the same event_id with a LATER
    // timestamp: the (event_id, ts) key of dedupEvents keeps both;
    // dropDuplicatesWithinWatermark keys on event_id alone and must
    // collapse them. One file → one micro-batch, so no duplicate can
    // hide behind a watermark advanced by an earlier batch.
    val base = batchEvents.limit(200)
    val retries = base.withColumn("ts",
      col("ts") + expr("INTERVAL 1 MINUTE"))
    val dupDir = Files.createTempDirectory("events_dup").toString
    base.unionByName(retries).coalesce(1)
      .write.mode("overwrite").parquet(dupDir)
    val q = StreamingJobs.dedupEventsWithinWatermark(
        spark.readStream.schema(batchEvents.schema).parquet(dupDir))
      .writeStream.format("memory").queryName("s_dedup_ww")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_dedup_ww").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("s_dedup_ww")
    val nIds = base.select("event_id").distinct().count()
    assert(got.count() == nIds)
    assert(got.select("event_id").distinct().count() == nIds)
    // the (id, ts) key demonstrably does NOT collapse the retries
    assert(spark.read.parquet(dupDir)
      .dropDuplicates("event_id", "ts").count() == 2 * nIds)
  }

  test("stream-stream click->purchase join matches the batch range join") {
    val stream = spark.readStream.schema(batchEvents.schema).parquet(eventsPath)
    val q = StreamingJobs.clickToPurchase(stream)
      .writeStream.format("memory").queryName("s_funnel")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_funnel").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("s_funnel")
    val want = StreamingJobs.clickToPurchase(batchEvents)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("mapGroupsWithState running totals converge to batch groupBy") {
    val q = StreamingJobs.userRunningTotals(
      spark.readStream.schema(batchEvents.schema).parquet(eventsPath))
      .writeStream.format("memory").queryName("s_totals")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_tot").toString)
      .start()
    q.awaitTermination()
    // last update per user = final state
    val finalRows = spark.table("s_totals")
      .groupBy("user_id").agg(max(struct(col("n"), col("total"))).as("s"))
      .select(col("user_id"), col("s.n").as("n"))
    val want = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(finalRows.exceptAll(want).isEmpty && want.exceptAll(finalRows).isEmpty)
  }

  test("transformWithState running totals match the batch aggregate") {
    // transformWithState requires the RocksDB state store; scope the
    // provider override to this query and restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
      val got = runToMemory("s_tws", OutputMode.Update(),
        df => StreamingJobs.userRunningTotalsTws(df).toDF())
      // Update mode emits one row per user per micro-batch; the LAST
      // row per user is the final running total = the batch sum
      val lastPerUser = got.withColumn("__r",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n").desc)))
        .filter(col("__r") === 1).drop("__r")
      val want = batchEvents.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
      assert(lastPerUser.count() == want.count())
      val joined = lastPerUser.as("g").join(want.as("w"), "user_id")
        .filter(col("g.n") =!= col("w.n") ||
          abs(col("g.total") - col("w.total")) > 1e-6)
      assert(joined.count() == 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("flatMapGroupsWithState emits one alert per crossed threshold") {
    val q = StreamingJobs.spendAlerts(
        spark.readStream.schema(batchEvents.schema).parquet(eventsPath),
        step = 100.0)
      .writeStream.format("memory").queryName("s_alerts")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_alerts").toString)
      .start()
    q.awaitTermination()
    val got = spark.table("s_alerts")
    // exactly floor(total/step) alerts per user, thresholds distinct
    val want = batchEvents.groupBy("user_id")
      .agg(floor(sum(col("value")) / 100.0).cast("long").as("n_alerts"))
      .filter(col("n_alerts") > 0)
    val gotCounts = got.groupBy("user_id")
      .agg(count(lit(1)).as("n_alerts"),
        count_distinct(col("threshold")).as("n_distinct"))
    assert(gotCounts.filter(col("n_alerts") =!= col("n_distinct")).count() == 0)
    val counts = gotCounts.select("user_id", "n_alerts")
    assert(counts.exceptAll(want).isEmpty && want.exceptAll(counts).isEmpty)
  }

  test("runDailyAvailableNow is an idempotent cron replacement") {
    val src = Files.createTempDirectory("cron_src").toString
    val out = Files.createTempDirectory("cron_out").toString
    val ckpt = Files.createTempDirectory("cron_ckpt").toString
    batchEvents.write.mode("append").parquet(src)

    StreamingJobs.runDailyAvailableNow(spark, src, out, ckpt).awaitTermination()
    // second run with no new data must be a no-op (checkpointed offsets)
    StreamingJobs.runDailyAvailableNow(spark, src, out, ckpt).awaitTermination()
    val n1 = spark.read.parquet(out).count()

    // append "late" data: same days again — a third run processes ONLY
    // the new file and appends corrected aggregates
    batchEvents.write.mode("append").parquet(src)
    StreamingJobs.runDailyAvailableNow(spark, src, out, ckpt).awaitTermination()
    val n2 = spark.read.parquet(out).count()
    assert(n2 >= n1)
  }

  test("runIncrementalAggAvailableNow folds to the recompute, replay-safe") {
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("inc_src").toString
    val state = Files.createTempDirectory("inc_state").toString + "/state"
    val ckpt = Files.createTempDirectory("inc_ckpt").toString
    val ev = batchEvents.select(col("event_type"),
      col("value").cast("decimal(18,2)").as("v"))
    ev.write.mode("overwrite").parquet(src)

    def run(ck: String) = {
      val q = StreamingJobs.runIncrementalAggAvailableNow(
        spark, src, state, Seq("event_type"), "v", ck)
      q.awaitTermination()
    }
    run(ckpt)
    val want = ev.groupBy("event_type")
      .agg(sum("v").as("agg_sum"), count("v").as("agg_cnt"))
    def stateNow() =
      spark.read.parquet(state).drop("__batch_id", "__ckpt_id")
    assert(stateNow().exceptAll(want).isEmpty &&
      want.exceptAll(stateNow()).isEmpty)

    // same checkpoint: nothing new to process, state unchanged
    run(ckpt)
    assert(stateNow().exceptAll(want).isEmpty)

    // fresh checkpoint replays everything as batch 0 with a NEW query
    // id: the identity guard must fail loudly — silently skipping
    // (old behavior) is indistinguishable from dropping new data
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(Files.createTempDirectory("inc_ckpt2").toString)
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMessages(e.getCause))
    assert(rootMessages(boom).exists(_.contains("built under checkpoint")))
    // and the state survives untouched
    assert(stateNow().exceptAll(want).isEmpty &&
      want.exceptAll(stateNow()).isEmpty)

    // a later file through the SAME checkpoint arrives as a higher
    // batch id and folds in
    val extra = spark.range(10).select(lit("extra").as("event_type"),
      lit(java.math.BigDecimal.valueOf(2.5)).cast("decimal(18,2)").as("v"))
    extra.write.mode("append").parquet(src)
    run(ckpt)
    val want2 = ev.unionByName(extra).groupBy("event_type")
      .agg(sum("v").as("agg_sum"), count("v").as("agg_cnt"))
    assert(stateNow().exceptAll(want2).isEmpty &&
      want2.exceptAll(stateNow()).isEmpty)
  }

  test("ProcessingTime micro-batches: the watermark DROPS a late row, " +
      "stream == batch on the on-time subset") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingJobs.dailyAgg(
      ms.toDF().toDF("ts", "event_type", "value"), lateness = "1 hour")
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .format("memory").queryName("wm_drop_test")
      .start()
    try {
      // batch 1: two day-1 rows; the 01:00:01 sentinel pushes the
      // watermark to 00:00:01 of day 2 — past day 1's window end
      ms.addData((ts("2024-01-01 10:00:00"), "view", 1.0),
        (ts("2024-01-01 11:00:00"), "view", 2.0),
        (ts("2024-01-02 01:00:01"), "view", 4.0))
      q.processAllAvailable()
      // batch 2: a LATE day-1 row, behind the watermark: its window is
      // closed, the row must be discarded — this is the documented
      // late-data contract (the reference silently lost late rows; we
      // drop only beyond the declared lateness), now an assertion
      ms.addData((ts("2024-01-01 05:00:00"), "view", 100.0))
      q.processAllAvailable()
      // batches 3-4: sentinels marching the watermark forward so day 2
      // finalizes and emits under Append mode
      ms.addData((ts("2024-01-03 02:00:00"), "view", 8.0))
      q.processAllAvailable()
      ms.addData((ts("2024-01-04 02:00:00"), "view", 16.0))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("wm_drop_test").collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    // day 1 emitted WITHOUT the late 100.0 — 2 rows, total 3.0
    assert(got("2024-01-01") == ((2L, 3.0)))
    assert(got("2024-01-02") == ((1L, 4.0)))

    // parity: the same dailyAgg code over the ON-TIME subset as a
    // batch frame (withWatermark is a no-op in batch) agrees exactly
    // on every window the stream emitted
    val onTime = Seq(
      (ts("2024-01-01 10:00:00"), "view", 1.0),
      (ts("2024-01-01 11:00:00"), "view", 2.0),
      (ts("2024-01-02 01:00:01"), "view", 4.0),
      (ts("2024-01-03 02:00:00"), "view", 8.0),
      (ts("2024-01-04 02:00:00"), "view", 16.0))
      .toDF("ts", "event_type", "value")
    val batchMap = StreamingJobs.dailyAgg(onTime).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("total")))).toMap
    got.keys.foreach(day => assert(got(day) == batchMap(day),
      s"stream/batch mismatch on $day"))
  }

  test("state-store reader: checkpoint state is queryable and reconciles " +
      "with the emitted aggregates") {
    // Spark 4's `statestore` / `state-metadata` DataFrame readers turn a
    // streaming checkpoint into ordinary tables — the ops surface for
    // debugging stateful jobs at scale (inspect skewed keys, audit state
    // size, rehydrate after an incident) without replaying the stream.
    val ckpt = Files.createTempDirectory("ckpt_statereader").toString
    val q = StreamingJobs.dailyAgg(
        spark.readStream.schema(batchEvents.schema).parquet(eventsPath))
      .writeStream.format("memory").queryName("s_statereader")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    val emitted = spark.table("s_statereader")

    // operator metadata: one stateful operator, the streaming aggregate
    val meta = spark.read.format("state-metadata").load(ckpt)
    assert(meta.count() == 1)
    assert(meta.select("operatorName").head().getString(0) == "stateStoreSave")

    // the live state rows ARE the aggregation buffers: one per
    // (window, event_type) group, counts matching the emitted output
    val state = spark.read.format("statestore").load(ckpt)
      .select(
        date_format(col("key.window.start"), "yyyy-MM-dd").as("day"),
        col("key.event_type").as("event_type"),
        // the value struct holds the raw aggregation buffers
        // (count/sum/isEmpty), not the output aliases
        col("value.count").as("n"))
    assert(state.count() == emitted.count())
    val want = emitted.select("day", "event_type", "n")
    assert(state.exceptAll(want).isEmpty && want.exceptAll(state).isEmpty)
  }

  test("runUpsertAvailableNow merges each micro-batch by PK exactly once") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("ups_src").toString
    val tbl = Files.createTempDirectory("ups_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("ups_ckpt").toString

    def rows(vs: (String, String)*) =
      spark.createDataFrame(vs).toDF("pk", "v")

    rows("A" -> "a1", "B" -> "b1").write.mode("append").parquet(src)
    StreamingJobs.runUpsertAvailableNow(spark, src, tbl, "pk", ckpt)
      .awaitTermination()
    // restart with no new files: checkpoint makes it a no-op
    StreamingJobs.runUpsertAvailableNow(spark, src, tbl, "pk", ckpt)
      .awaitTermination()
    assert(spark.read.parquet(tbl).count() == 2)

    // new file updates A and inserts C — merged, not appended
    rows("A" -> "a2", "C" -> "c1").write.mode("append").parquet(src)
    StreamingJobs.runUpsertAvailableNow(spark, src, tbl, "pk", ckpt)
      .awaitTermination()
    val m = spark.read.parquet(tbl).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("A" -> "a2", "B" -> "b1", "C" -> "c1"))
  }

  test("runUpsertBucketedAvailableNow: scoped streaming merge, same semantics") {
    import org.apache.spark.sql.functions.col
    val src = Files.createTempDirectory("upb_src").toString
    val tbl = Files.createTempDirectory("upb_tbl").toString + "/t"
    val ckpt = Files.createTempDirectory("upb_ckpt").toString

    def rows(vs: (String, String)*) =
      spark.createDataFrame(vs).toDF("pk", "v")

    rows("A" -> "a1", "B" -> "b1").write.mode("append").parquet(src)
    StreamingJobs.runUpsertBucketedAvailableNow(spark, src, tbl, "pk", 8, ckpt)
      .awaitTermination()
    // bucketed layout bootstrapped (marker + __bucket partition dirs)
    assert(Files.exists(java.nio.file.Paths.get(s"$tbl/_GRAFT_BUCKETS")))
    // restart, no new files: checkpoint no-op; then a merge batch
    StreamingJobs.runUpsertBucketedAvailableNow(spark, src, tbl, "pk", 8, ckpt)
      .awaitTermination()
    rows("A" -> "a2", "C" -> "c1").write.mode("append").parquet(src)
    StreamingJobs.runUpsertBucketedAvailableNow(spark, src, tbl, "pk", 8, ckpt)
      .awaitTermination()
    val m = spark.read.parquet(tbl).select(col("pk"), col("v")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("A" -> "a2", "B" -> "b1", "C" -> "c1"))
    // a mismatched bucket count on the same table fails fast
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      rows("D" -> "d1").write.mode("append").parquet(src)
      StreamingJobs.runUpsertBucketedAvailableNow(
        spark, src, tbl, "pk", 16, ckpt).awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(boom).exists(_.contains("bucketed with 8")))
  }

  test("runChunkFreqAvailableNow: incremental chunk dedup state — the " +
      "cleaned view equals the batch chunkDedup recompute across waves") {
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("cf_src").toString
    val state = Files.createTempDirectory("cf_state").toString + "/state"
    val ckpt = Files.createTempDirectory("cf_ckpt").toString
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    def docs(ids: (Long, String)*) =
      spark.createDataFrame(ids).toDF("doc_id", "text")
    def uniq(id: Long) = (0 until 10).map(k => s"w${id}_$k").mkString(" ")

    // wave 1: boilerplate in docs 1 and 2 only — at maxFreq=2 it is
    // NOT yet over-frequent, so the wave-1 cleaned view keeps it
    val wave1 = docs(
      1L -> s"$boiler ${uniq(1)}",
      2L -> s"$boiler ${uniq(2)}",
      3L -> uniq(3))
    wave1.write.mode("append").parquet(src)
    StreamingJobs.runChunkFreqAvailableNow(spark, src, state, 10, ckpt)
      .awaitTermination()
    def stateNow() = spark.read.parquet(state)
      .drop("__batch_id", "__ckpt_id")
    def cleaned(all: DataFrame) = graft.queries.TextQueries.chunkStrike(
      all, stateNow().filter(col("cnt") > 2).select("ctext"), 10)
    def sameAs(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(sameAs(cleaned(wave1),
      graft.queries.TextQueries.chunkDedup(wave1, 10, 2)))
    // boilerplate survived wave 1 (freq 2 ≤ maxFreq)
    assert(cleaned(wave1).filter(col("doc_id") === 1L)
      .head.getString(1).startsWith("boiler1"))

    // wave 2 pushes the SAME chunk over the threshold: the state fold
    // sees only the new docs, but the cleaned view must now strike the
    // boilerplate from wave-1 docs too — late-arriving boilerplate is
    // exactly what clean-at-ingest designs miss
    val wave2 = docs(4L -> s"$boiler ${uniq(4)}", 5L -> uniq(5))
    wave2.write.mode("append").parquet(src)
    StreamingJobs.runChunkFreqAvailableNow(spark, src, state, 10, ckpt)
      .awaitTermination()
    val all = wave1.unionByName(wave2)
    assert(sameAs(cleaned(all),
      graft.queries.TextQueries.chunkDedup(all, 10, 2)))
    assert(cleaned(all).filter(col("doc_id") === 1L)
      .head.getString(1) == uniq(1))
    // replay through the same checkpoint: nothing new, state unchanged
    val before = stateNow().collect().toSet
    StreamingJobs.runChunkFreqAvailableNow(spark, src, state, 10, ckpt)
      .awaitTermination()
    assert(stateNow().collect().toSet == before)
  }

  test("runCorpusPrepAvailableNow: gates+sample per batch, exact dedup " +
      "as state — matches the batch q49 stages over both waves") {
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("cp_src").toString
    val state = Files.createTempDirectory("cp_state").toString + "/state"
    val ckpt = Files.createTempDirectory("cp_ckpt").toString
    // realistic doc frame: reuse the testdata documents, split in two
    // waves by doc_id so arrival order follows id order (the regime
    // where keep-first-arrival == the batch keep-lowest-id window)
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text")
    val mid = docs.agg(expr("percentile(doc_id, 0.5)")).head.getDouble(0)
    docs.filter(col("doc_id") <= mid).write.mode("append").parquet(src)
    StreamingJobs.runCorpusPrepAvailableNow(spark, src, state, ckpt)
      .awaitTermination()
    docs.filter(col("doc_id") > mid).write.mode("append").parquet(src)
    StreamingJobs.runCorpusPrepAvailableNow(spark, src, state, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(state)
      .select("doc_id", "source", "n_tokens", "quality")
    // batch replay: stateless stages + keep-lowest-id dedup window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val want = graft.queries.TextQueries.corpusPrepare(docs)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("doc_id", "source", "n_tokens", "quality")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
