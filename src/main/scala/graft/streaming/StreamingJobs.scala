package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues,
  Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming generalization of the reference's daily-batch
  * contract (SURVEY.md §2.11 "Streaming"): the reference filters
  * `Marca temporal == yesterday` once a day and silently MISSES
  * backdated rows (etl/pipeline.py:124-126); the streaming forms below
  * replace that with event-time watermarks, so late data within the
  * allowed delay is aggregated instead of dropped.
  *
  * Every transform takes and returns DataFrames, so the same code runs
  * on a batch frame (tests, backfills) and on `spark.readStream` (the
  * incremental daily job — `Trigger.AvailableNow` is the exact
  * replacement for the cron batch: process everything new, then stop).
  *
  * Scale notes: state stores are keyed by (window, event_type) /
  * user_id — aggregation state shuffles once on the group key, exactly
  * like the batch twin; watermarks bound state size, which is what
  * makes these safe on an unbounded 100 TB/day stream.
  */
object StreamingJobs {

  /** Apply the engine's event-time normalization contract
    * ([[graft.tables.Tables.normalizeEventTime]]) to a just-opened
    * stream: a `ts` column arriving as TIMESTAMP_NTZ (or long nanos)
    * is cast to session-zoned TimestampType before any watermark /
    * window sees it — `withWatermark` legally rejects NTZ, and a
    * type drift between a batch-built state table and a streaming
    * batch would otherwise break the upsert union.
    */
  private def normalized(df: DataFrame): DataFrame =
    if (df.columns.contains("ts"))
      graft.tables.Tables.normalizeEventTime(df, "ts")
    else df

  /** Tumbling one-day aggregation — streaming twin of q36_daily_agg
    * (and of the reference's whole daily run). Late rows up to
    * `lateness` are still counted; the reference's strict-equality
    * filter lost them.
    */
  def dailyAgg(events: DataFrame, lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(date_format(col("day.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total"))

  /** Exactly-once event dedup within the watermark horizon — the
    * streaming twin of A1 (keep-first here: replays deliver identical
    * rows, so first == last).
    */
  def dedupEvents(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicates("event_id", "ts")

  /** [[dedupEvents]] via Spark 4's dropDuplicatesWithinWatermark: the
    * dedup KEY no longer includes the event time, so two records with
    * the same id but drifting timestamps (a retried producer stamping
    * retries with send time — the case the (id, ts) key treats as two
    * distinct events) still collapse to one, while state is evicted by
    * the watermark exactly as before. This is the at-least-once-
    * ingestion dedup contract: key = business identity, watermark =
    * how long a duplicate can lag its original.
    */
  def dedupEventsWithinWatermark(events: DataFrame,
                                 lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows with a 30-minute gap — streaming twin of
    * q37_sessionize, using the built-in session_window (state merges
    * adjacent windows; the batch twin's lag/cumsum formulation needs a
    * global per-user sort instead).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("first_event"), col("last_event"), col("total"))

  /** Watermarked stream-stream join: attribute each purchase to the
    * click(s) by the same user within the preceding `within` interval —
    * the funnel-attribution shape. Works identically on batch frames
    * (plain range join) and on streams (state bounded by the watermark
    * + the time-range condition; inner join, so rows emit as they
    * match).
    */
  def clickToPurchase(events: DataFrame, within: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", within)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", within)
    clicks.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("value"))
  }

  // ---- arbitrary stateful processing showcase (mapGroupsWithState) ----

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Running per-user totals via mapGroupsWithState — the extension
    * surface for state machines the built-in aggregations can't express
    * (the built-in `groupBy(user_id).sum` twin exists; this demonstrates
    * the KeyValueGroupedDataset custom-state path).
    */
  def userRunningTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          val next = UserTotal(uid, n, total)
          state.update(next)
          next
      }
  }

  /** Running per-user totals via `transformWithState` — Spark 4's
    * successor to map/flatMapGroupsWithState: named typed state handles
    * (ValueState here; ListState/MapState, per-state TTL and timers on
    * the same handle), backed by the RocksDB state store. Same contract
    * as [[userRunningTotals]], so StreamingSpec asserts both APIs and
    * the batch `groupBy(...).agg(sum)` twin agree row-for-row.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider (transformWithState does not run on the
    * default HDFS-backed store).
    */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, UserEvent, UserTotal] {
    @transient private var state: ValueState[UserTotal] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserTotal]("total",
        Encoders.product[UserTotal], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timers: TimerValues): Iterator[UserTotal] = {
      val prev = Option(state.get()).getOrElse(UserTotal(key, 0L, 0.0))
      var n = prev.n
      var total = prev.total
      rows.foreach { e => n += 1; total += e.value }
      val next = UserTotal(key, n, total)
      state.update(next)
      Iterator.single(next)
    }
  }

  def userRunningTotalsTws(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class SpendAlert(user_id: Long, threshold: Double, total: Double)

  /** Threshold alerts via flatMapGroupsWithState — the 0..N-outputs-
    * per-group form of arbitrary stateful processing (mapGroupsWithState
    * must emit exactly one row per updated group): one alert row each
    * time a user's running spend crosses another multiple of `step`,
    * nothing otherwise. State is two numbers per user regardless of
    * event volume — the shape that scales to unbounded streams.
    */
  def spendAlerts(events: DataFrame, step: Double): Dataset[SpendAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotal, SpendAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          val alerts = scala.collection.mutable.ArrayBuffer[SpendAlert]()
          rows.foreach { e =>
            val before = math.floor(total / step)
            n += 1
            total += e.value
            val after = math.floor(total / step)
            // one alert per threshold crossed, even within one batch
            (before.toLong + 1 to after.toLong).foreach(k =>
              alerts += SpendAlert(uid, k * step, total))
          }
          state.update(UserTotal(uid, n, total))
          alerts.iterator
      }
  }

  /** Incremental warehouse maintenance from a stream: every micro-batch
    * is PK-upserted into the parquet warehouse via `foreachBatch` +
    * `Load.upsert` — the streaming form of the reference's daily master
    * -data upsert (K2), with the checkpoint guaranteeing each source
    * file is merged exactly once across restarts. `foreachBatch` is the
    * extension point for any sink without a native streaming writer
    * (JDBC upserts, MERGE INTO, etc.).
    */
  def runUpsertAvailableNow(spark: SparkSession, srcDir: String,
                            tableDir: String, pk: String,
                            checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    normalized(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Load.upsert(batch.sparkSession, batch, tableDir, pk)
        ()
      }
      .start()
  }

  /** [[runUpsertAvailableNow]] with the bucket-SCOPED sink
    * (Load.upsertBucketed): a streaming CDC feed against a large
    * master table rewrites only the hash buckets each micro-batch
    * touches instead of the whole table — the streaming face of the
    * scoped merge (q111). Exactly-once by the same argument as the
    * plain upsert job: the merge is idempotent per batch, so the
    * foreachBatch replay window re-merges harmlessly.
    */
  def runUpsertBucketedAvailableNow(spark: SparkSession, srcDir: String,
                                    tableDir: String, pk: String,
                                    buckets: Int,
                                    checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    normalized(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.etl.Load.upsertBucketed(batch.sparkSession, batch, tableDir,
          pk, buckets)
        ()
      }
      .start()
  }

  /** Streaming maintenance of an aggregate state table: each
    * micro-batch is folded into the persisted (keys, agg_sum, agg_cnt)
    * state via Scale.incrementalAgg and swapped in crash-safe
    * (Load-style staged write + rename), so the serving table always
    * equals the full recompute over everything ingested so far — the
    * streaming face of q102.
    *
    * Exactly-once: the fold is ADDITIVE, so unlike the PK-upsert job a
    * replayed batch would double-count. foreachBatch commits its
    * checkpoint AFTER the user function, so a crash between the state
    * swap and the commit replays the batch — the state therefore
    * carries the last applied batch id (a constant `__batch_id`
    * column; state is one row per key, so the overhead is a long per
    * group) and the fold skips any batch id ≤ the recorded one. Every
    * crash point then lands in one of two recoverable states: swap not
    * yet done (replay re-folds, correct) or swap done (replay is
    * skipped by the guard, correct).
    *
    * The batch-id guard is only meaningful within ONE checkpoint
    * lifetime: a fresh checkpoint restarts batch ids at 0 while
    * replaying every source file, so comparing its ids against state
    * built under the old checkpoint would either double-count (no
    * guard) or silently drop genuinely new data (naive guard). The
    * state therefore also records the streaming query id (`__ckpt_id`,
    * stable across restarts of the same checkpoint, fresh per new
    * checkpoint), and the fold REFUSES loudly when the identity
    * changes — the operator must either restore the original
    * checkpoint or delete the state dir to rebuild from the replay.
    */
  def runIncrementalAggAvailableNow(spark: SparkSession, srcDir: String,
                                    stateDir: String, keys: Seq[String],
                                    valueCol: String,
                                    checkpointDir: String): StreamingQuery =
    runGuardedFoldAvailableNow(spark, srcDir, stateDir, checkpointDir) {
      (prior, batch) =>
        graft.ops.Scale.incrementalAgg(prior, batch, keys, valueCol)
    }

  /** Streaming maintenance of the corpus-wide chunk-frequency state
    * behind chunk dedup (q115): each micro-batch of documents is cut
    * into `chunkWords`-word chunks and their counts folded into the
    * persisted (ctext, cnt) table — the GLOBAL half of the operator,
    * now scaling with the batch instead of the corpus. Cleaning is a
    * view over the current state
    * (`TextQueries.chunkStrike(docs, state.filter(cnt > maxFreq))`),
    * so the cleaned corpus always equals the batch `chunkDedup`
    * recompute over everything ingested so far — including chunks that
    * only BECOME boilerplate after later batches, which a clean-at-
    * ingest design would miss. Same exactly-once argument as
    * [[runIncrementalAggAvailableNow]]: additive fold + batch-id
    * guard + checkpoint-identity guard.
    */
  def runChunkFreqAvailableNow(spark: SparkSession, srcDir: String,
                               stateDir: String, chunkWords: Int,
                               checkpointDir: String): StreamingQuery =
    runGuardedFoldAvailableNow(spark, srcDir, stateDir, checkpointDir) {
      (prior, batch) =>
        val partial = graft.queries.TextQueries
          .chunkRows(batch.select(col("doc_id"), col("text")), chunkWords)
          .groupBy(col("ctext")).agg(count(lit(1)).as("cnt"))
        prior match {
          case None => partial
          case Some(st) => st.unionByName(partial)
            .groupBy(col("ctext")).agg(sum(col("cnt")).as("cnt"))
        }
    }

  /** Streaming corpus prep — the AvailableNow twin of q49: each
    * micro-batch of documents runs the STATELESS stages (feature
    * scoring, language/quality gates, deterministic salted-md5 sample
    * — `TextQueries.corpusPrepare`, identical expression work to the
    * batch query), and the one cross-document stage, exact dedup by
    * content hash, becomes state maintenance: a batch row joins the
    * persisted corpus only if no row with its hash is already there
    * (keep-FIRST-ARRIVAL — the streaming analogue of the batch
    * keep-lowest-id window; the two agree whenever ingestion order
    * follows doc_id order, and the sample predicate depends only on
    * the text so duplicate groups gate identically in both forms).
    * Same exactly-once guards as the other fold jobs. The fold
    * replaces the state table whole; at warehouse scale the same fold
    * composes with the bucket-scoped merge (hash is the natural
    * bucket key) exactly as q136's signature index does.
    */
  def runCorpusPrepAvailableNow(spark: SparkSession, srcDir: String,
                                stateDir: String,
                                checkpointDir: String): StreamingQuery =
    runGuardedFoldAvailableNow(spark, srcDir, stateDir, checkpointDir) {
      (prior, batch) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("h")).orderBy(col("doc_id"))
        val best = graft.queries.TextQueries.corpusPrepare(batch)
          .withColumn("h", md5(col("text")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        prior match {
          case None => best
          case Some(p) => p.unionByName(
            best.join(p.select(col("h")), Seq("h"), "left_anti"))
        }
    }

  /** Streaming twin of q136's incremental near-dup maintenance: each
    * micro-batch of documents (doc_id, text)
    *
    *   1. computes its MinHash band rows (map-only over the batch),
    *   2. probes the persisted signature index (bucket-pruned scan,
    *      cost O(batch) — IncrementalDedup.probe),
    *   3. PK-upserts the emitted candidate pairs into `pairsDir`, and
    *   4. scope-merges its signatures into the index at `indexDir`,
    *
    * so the near-dup signature index — previously the one maintained
    * warehouse table without a streaming runner — rides the same
    * exactly-once AvailableNow harness as the upsert/CDC/agg jobs.
    *
    * Exactly-once by IDEMPOTENCE (the runUpsertAvailableNow argument,
    * not the batch-id guard): both sinks are PK-upserts, and a
    * replayed probe after a crash between the signature merge and the
    * checkpoint commit sees its own signatures already in the index —
    * probe collapses a re-submitted (band, sig, doc_id) membership row
    * to ONE entry (max(is_batch)), so cap counts and the emitted pair
    * set are unchanged and the replay re-upserts the same rows
    * harmlessly. NearDupStreamSpec pins two-wave parity with the
    * from-scratch probe and the restart no-op.
    */
  def runNearDupAvailableNow(spark: SparkSession, srcDir: String,
                             indexDir: String, pairsDir: String,
                             buckets: Int,
                             checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val dd = graft.ops.IncrementalDedup
        val sh = batch.select(col("doc_id"),
            graft.functions.ShingleExpression.wordShingles(
              split(col("text"), " ")).as("sh"))
          .filter(size(col("sh")) > 0)
        // eager: the merge below swaps the very bucket dirs a lazy
        // probe plan would later re-read (the q136 contract)
        val rows = graft.ops.Relational.eager(
          dd.bandRows(dd.signatures(sh)))
        val pairs = dd.probe(s, rows, indexDir, buckets)
          .withColumn("pair_key", concat_ws("_", col("da"), col("db")))
        graft.etl.Load.upsert(s, pairs, pairsDir, "pair_key")
        dd.mergeSignatures(s, rows, indexDir, buckets)
        ()
      }
      .start()
  }

  /** Incremental inverted-index maintenance as a stream
    * (InvertedIndex/q157's streaming twin): each micro-batch of NEW
    * documents folds into the persisted index via
    * [[graft.ops.InvertedIndex.addBatch]]. The index must be
    * bootstrapped ([[graft.ops.InvertedIndex.build]]) first — batch 0
    * belongs to the bootstrap, so streaming ids map to 1 + batchId.
    *
    * Exactly-once: addBatch is idempotent per id (the batch's
    * postings overwrite only their own `batch=` subtree; the corpus
    * fold is guarded by the `last_batch` high-water mark), so a
    * replayed micro-batch after a crash is a no-op. The checkpoint-
    * identity guard (the runGuardedFoldAvailableNow argument) refuses
    * a FRESH checkpoint against an already-maintained index: new
    * checkpoints restart batch ids while replaying every source file,
    * and the high-water guard would then silently drop that data as
    * "replays".
    */
  def runInvertedIndexAvailableNow(spark: SparkSession, srcDir: String,
                                   indexDir: String,
                                   checkpointDir: String,
                                   maxSegments: Option[Int] = None)
      : StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        guardCheckpointIdentity(s, checkpointDir, indexDir)
        graft.ops.InvertedIndex.addBatch(s, batch, indexDir, 1L + batchId)
        // auto-compaction policy: runs AFTER the exactly-once append
        // (a replayed batch no-ops above, then the policy re-evaluates
        // — compaction is a pure physical move, so replays are safe)
        maxSegments.foreach(
          graft.ops.InvertedIndex.compactIfNeeded(s, indexDir, _))
        ()
      }
      .start()
  }

  /** Streaming corpus-ingest maintainer — the AvailableNow twin of
    * the q168 incremental warehouse ([[graft.ops.CorpusIngest]]): each
    * micro-batch of crawl records (doc_id, source, lang, canon_url,
    * html) folds through the apply-only ingest path under the models
    * frozen at bootstrap. The warehouse must be bootstrapped first —
    * batch 0 belongs to the bootstrap, so streaming ids map to
    * 1 + batchId.
    *
    * Exactly-once: `CorpusIngest.ingest` is idempotent per id (corpus
    * and urls dynamic-overwrite only their own `batch=` subtree; the
    * state fold lands LAST behind the `last_batch` guard), so a
    * replayed micro-batch after a crash heals any partial write and a
    * fully-landed replay is a loud no-op. The checkpoint-identity
    * guard refuses a FRESH checkpoint against an already-maintained
    * warehouse — fresh checkpoints restart batch ids while replaying
    * every source file, and the high-water guard would then silently
    * drop that data as replays.
    */
  def runCorpusIngestAvailableNow(spark: SparkSession, srcDir: String,
                                  warehouseDir: String,
                                  checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        guardCheckpointIdentity(s, checkpointDir, warehouseDir)
        graft.ops.CorpusIngest.ingest(s,
          batch.select("doc_id", "source", "lang", "canon_url", "html"),
          warehouseDir, 1L + batchId)
        ()
      }
      .start()
  }

  /** Maintain an AdcIngest vector-index warehouse from a parquet
    * vector stream — the vector-side twin of
    * [[runCorpusIngestAvailableNow]]/[[runInvertedIndexAvailableNow]]:
    * each micro-batch is encoded under the FROZEN persisted models and
    * appended as its own generation; restarts replay micro-batches into
    * `AdcIngest.append`'s high-water no-op, and a fresh checkpoint
    * against a maintained warehouse is refused (same restart-id trap).
    * The warehouse must be bootstrapped first (models + batch 0).
    */
  def runAdcIngestAvailableNow(spark: SparkSession, srcDir: String,
                               warehouseDir: String,
                               checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        guardCheckpointIdentity(s, checkpointDir, warehouseDir)
        graft.ops.AdcIngest.append(s,
          batch.select("vec_id", "embedding"), warehouseDir, 1L + batchId)
        ()
      }
      .start()
  }

  /** Streaming TAKEDOWN maintainer: each micro-batch of deletion
    * requests (a one-column id frame) tombstones the target warehouse
    * through its delete() — `kind` picks the warehouse family:
    * "invidx" (`InvertedIndex.delete`, id column doc_id), "adc"
    * (`AdcIngest.delete`, vec_id), "corpus" (`CorpusIngest.delete`,
    * doc_id). Unlike the append maintainers above, deletes are
    * idempotent by CONTENT, not by batch id: a replayed request finds
    * itself already tombstoned and counts zero, the epoch advances
    * only for genuinely new ids, and a crash between the tombstone
    * write and the commit row heals on the next request. Restarts,
    * replays — and even a FRESH checkpoint over the same request
    * log — are therefore all safe, which is why this maintainer does
    * NOT need the checkpoint-identity guard the id-addressed append
    * maintainers require.
    */
  def runDeleteStreamAvailableNow(spark: SparkSession, srcDir: String,
                                  warehouseDir: String,
                                  checkpointDir: String,
                                  kind: String): StreamingQuery = {
    require(Set("invidx", "adc", "corpus").contains(kind),
      s"unknown warehouse kind '$kind' (invidx | adc | corpus)")
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        kind match {
          case "invidx" =>
            graft.ops.InvertedIndex.delete(s,
              warehouseDir, batch.select("doc_id"))
          case "adc" =>
            graft.ops.AdcIngest.delete(s,
              warehouseDir, batch.select("vec_id"))
          case _ =>
            graft.ops.CorpusIngest.delete(s,
              warehouseDir, batch.select("doc_id"))
        }
        ()
      }
      .start()
  }

  /** Pin the warehouse at `stateRoot` to the checkpoint lifetime that
    * first maintained it (stored as a one-row table at
    * `stateRoot/ckpt`); refuse any other checkpoint — a fresh one
    * restarts batch ids while replaying every source file, which the
    * warehouse's high-water guard would drop as replays.
    */
  private def guardCheckpointIdentity(s: SparkSession,
                                      checkpointDir: String,
                                      stateRoot: String): Unit = {
    val ckptId = checkpointIdentity(s, checkpointDir)
    val ckptDir = s"$stateRoot/ckpt"
    graft.etl.Load.readTable(s, ckptDir) match {
      case Some(t) =>
        val stored = t.head().getString(0)
        require(stored == ckptId,
          s"warehouse at $stateRoot was maintained under checkpoint " +
            s"query $stored but this run's checkpoint at " +
            s"$checkpointDir has query id $ckptId — a fresh " +
            "checkpoint restarts batch ids and replays all source " +
            "files, which the high-water guard would drop as " +
            "replays. Restore the original checkpoint, or rebuild " +
            "the warehouse from scratch.")
      case None =>
        import s.implicits._
        graft.etl.Load.replaceTable(s,
          Seq(ckptId).toDF("__ckpt_id"), ckptDir)
    }
  }

  /** The shared exactly-once fold harness of the incremental state
    * jobs: reads `srcDir` with AvailableNow, and per micro-batch folds
    * `fold(prior state without meta columns, batch)` into the staged-
    * swap table at `stateDir`, tagged with `__batch_id` (skip replayed
    * batches — the folds are additive, so a replay would double-count)
    * and `__ckpt_id` (refuse loudly when the state was built under a
    * DIFFERENT checkpoint lifetime — a fresh checkpoint restarts batch
    * ids while replaying every file, so the guard above would
    * otherwise silently drop genuinely new data).
    */
  private def runGuardedFoldAvailableNow(spark: SparkSession,
      srcDir: String, stateDir: String, checkpointDir: String)(
      fold: (Option[DataFrame], DataFrame) => DataFrame): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    normalized(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val ckptId = checkpointIdentity(s, checkpointDir)
        val prior = graft.etl.Load.readTable(s, stateDir)
        prior.filter(_.columns.contains("__ckpt_id")).foreach { p =>
          p.select("__ckpt_id").head(1).foreach { r =>
            require(r.getString(0) == ckptId,
              s"state at $stateDir was built under checkpoint query " +
                s"${r.getString(0)} but this run's checkpoint at " +
                s"$checkpointDir has query id $ckptId — a fresh " +
                "checkpoint restarts batch ids and replays all source " +
                "files, so folding would double-count or drop data. " +
                "Restore the original checkpoint, or delete the state " +
                "dir to rebuild it from the full replay.")
          }
        }
        val lastApplied = prior.flatMap(p =>
          Option(p.agg(max(col("__batch_id"))).head().get(0))
            .map(_.asInstanceOf[Long]))
          .getOrElse(-1L)
        if (batchId > lastApplied) {
          val next = fold(
            prior.map(_.drop("__batch_id").drop("__ckpt_id")), batch)
            .withColumn("__batch_id", lit(batchId))
            .withColumn("__ckpt_id", lit(ckptId))
          graft.etl.Load.replaceTable(s, next, stateDir)
        }
        ()
      }
      .start()
  }

  /** The streaming query id from `checkpointDir/metadata` — written by
    * Spark at query start, stable across restarts that reuse the
    * checkpoint, fresh for a new checkpoint dir: exactly the identity
    * a cross-lifetime replay guard must be scoped to.
    */
  private def checkpointIdentity(spark: SparkSession,
                                 checkpointDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
        .getOrElse(sys.error(s"no query id in checkpoint metadata at $p"))
    } finally in.close()
  }

  /** The cron-replacement runner: process everything currently in
    * `srcDir` (parquet event files), append day aggregates to `outDir`,
    * checkpoint for exactly-once across runs, stop when caught up —
    * `Trigger.AvailableNow` IS the daily 06:00 batch, minus the
    * late-data loss.
    */
  def runDailyAvailableNow(spark: SparkSession, srcDir: String, outDir: String,
                           checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = normalized(spark.readStream.schema(schema).parquet(srcDir))
    dailyAgg(stream)
      .writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
