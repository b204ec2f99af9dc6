package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.Multimodal
import graft.queries.RelationalQueries.Q
import graft.tables.Tables

/** Temporal operators over `events` (the streaming-equivalent batch
  * forms — the live Structured Streaming variants live in
  * graft.streaming) plus the multimodal-column plumbing query.
  *
  * Timestamp parity: events.ts is parquet TIMESTAMP(NANOS); Spark reads
  * it as nanos-long and Tables.events normalizes to microseconds.
  * DuckDB keeps TIMESTAMP_NS but `epoch_us` / `date_trunc('day')`
  * truncate identically, so derived values agree. Raw ns timestamps are
  * never emitted in query output.
  */
object EventQueries {

  val q36DailyAgg = Q("q36_daily_agg",
    // tumbling daily window aggregation — the batch form of the
    // reference's daily run (W1+D3 generalized); maps 1:1 onto
    // Structured Streaming `window($"ts", "1 day")`
    (s, d) => Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .orderBy(col("day"), col("event_type")),
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY day, event_type"""))

  val q107HoppingWindow = Q("q107_hopping_window",
    // HOPPING (sliding) time windows — the overlap generalization of
    // q36's tumbling day: 1-day windows advancing every 12 h, so each
    // event lands in exactly 2 windows (Spark's `window()` explodes
    // rows into their windows before the partial agg; the shuffle
    // carries pre-combined per-window partials, not the ×2 row blowup).
    // Runs unchanged under readStream — window() is the same operator
    // there. The oracle replays the epoch-aligned window assignment
    // with a range join against a generated start series.
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("ws"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm").as("we"),
        col("event_type"), col("n"), col("total"))
      .orderBy(col("ws"), col("event_type")),
    Some("""WITH b AS (SELECT date_trunc('day', min(ts))
            - INTERVAL 12 HOUR AS t0, max(ts) AS t1 FROM events),
        starts AS (SELECT unnest(generate_series(
            (SELECT t0 FROM b), (SELECT t1 FROM b), INTERVAL 12 HOUR)) AS s0),
        j AS (SELECT s.s0, e.event_type, e.value FROM events e
              JOIN starts s ON e.ts >= s.s0
                AND e.ts < s.s0 + INTERVAL 1 DAY)
      SELECT strftime(s0, '%Y-%m-%d %H:%M') AS ws,
        strftime(s0 + INTERVAL 1 DAY, '%Y-%m-%d %H:%M') AS we,
        event_type, count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM j GROUP BY 1, 2, 3 ORDER BY 1, 3"""))

  val q37Sessionize = Q("q37_sessionize",
    // session windows: a >30-min silence starts a new session; the batch
    // twin of flatMapGroupsWithState sessionization
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
      val newSession = when(gapUs.isNull || gapUs > 1800L * 1000000L, 1)
        .otherwise(0)
      Tables.events(s, d)
        .withColumn("new_s", newSession)
        .withColumn("session_seq",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
        .orderBy(col("user_id"), col("session_seq"))
    },
    Some("""WITH o AS (SELECT user_id, event_id, value, epoch_us(ts) AS us
        FROM events),
      f AS (SELECT *, CASE WHEN us - lag(us) OVER w IS NULL
              OR us - lag(us) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
            FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      g AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
              ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS session_seq
            FROM f)
      SELECT user_id, session_seq, COUNT(*) AS n_events,
        MIN(event_id) AS first_event, MAX(event_id) AS last_event,
        MAX(us) - MIN(us) AS duration_us,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM g GROUP BY user_id, session_seq
      ORDER BY user_id, session_seq"""))

  val q38AsofJoin = Q("q38_asof_join",
    // as-of join: each event picks the latest order (o_orderdate ≤ ts)
    // of the same customer; date ties broken by max orderkey. Spark has
    // no asof-join operator — implemented as the union + running
    // last(ignoreNulls) pattern: one shuffle on the key, no range
    // explosion (scales linearly vs. an inequality join).
    (s, d) => graft.plans.AsofJoin.asofUnionWindow(
        Tables.events(s, d), "user_id", "ts", "event_id",
        Tables.orders(s, d), "o_custkey", "o_orderdate", "o_orderkey")
      .withColumnRenamed("last_o_orderkey", "last_order")
      .select(col("event_id"), col("user_id"), col("last_order"))
      .orderBy(col("event_id")),
    Some("""SELECT e.event_id, e.user_id,
        (SELECT max(o.o_orderkey) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
           AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
             WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts))
          AS last_order
      FROM events e ORDER BY e.event_id"""))

  val q39MultimodalMeta = Q("q39_multimodal_meta",
    // multimodal columns: opaque binary payload + typed metadata struct;
    // the decode/feature path is expression-only here (full
    // mapPartitions plumbing with a stubbed decoder: graft.multimodal)
    (s, d) => {
      val blob = col("text").cast(BinaryType)
      val meta = struct(
        element_at(typedLit(Seq("jpeg", "png", "webp")),
          (col("doc_id") % 3).cast(IntegerType) + 1).as("format"),
        (octet_length(blob) % 640 + 32).as("width"),
        ((octet_length(blob) * 7) % 480 + 32).as("height"),
        ((col("n_chars") % 30) + 1).cast(IntegerType).as("n_frames"))
      Tables.documents(s, d)
        .select(col("doc_id"), blob.as("payload"), meta.as("meta"))
        .select(col("doc_id"),
          octet_length(col("payload")).as("payload_bytes"),
          col("meta.format").as("format"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.n_frames").as("n_frames"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        octet_length(CAST(text AS BLOB)) AS payload_bytes,
        (['jpeg','png','webp'])[CAST(doc_id % 3 AS INTEGER) + 1] AS format,
        octet_length(CAST(text AS BLOB)) % 640 + 32 AS width,
        (octet_length(CAST(text AS BLOB)) * 7) % 480 + 32 AS height,
        CAST((n_chars % 30) + 1 AS INTEGER) AS n_frames
      FROM documents ORDER BY doc_id"""))

  val q96MultimodalDecode = Q("q96_multimodal_decode",
    // the multimodal DECODE path under the oracle gate (q39 covers only
    // the expression-side meta path): asMedia wraps documents into the
    // canonical (media_id, payload, meta) frame and decodeFeatures runs
    // the partition-wise stub decoder — real mapPartitions plumbing,
    // one decoder instance per partition, Row-encoded output. The stub
    // is deterministic byte arithmetic (mean byte + 8-bin histogram of
    // the high 3 bits), so DuckDB replays it in SQL over the same UTF-8
    // bytes via hex() + per-byte unnest; a green row gates the
    // partition-wise machinery, not just an expression tree.
    (s, d) => {
      val media = Multimodal.asMedia(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text")
      val hist = (0 until 8).map(i =>
        element_at(col("embedding"), i + 1).cast(DoubleType).as(s"h$i"))
      Multimodal.decodeFeatures(media)
        .select(Seq(col("media_id"), col("format"), col("n_bytes"),
          col("mean_byte")) ++ hist: _*)
        .orderBy(col("media_id"))
    },
    Some("""WITH b AS (SELECT doc_id, hex(CAST(text AS BLOB)) AS h,
          octet_length(CAST(text AS BLOB)) AS n FROM documents),
        idx AS (SELECT doc_id, n, h, unnest(range(0, n)) AS i FROM b),
        vals AS (SELECT doc_id, n,
          CAST('0x' || substr(h, CAST(2 * i + 1 AS INTEGER), 2) AS INTEGER) AS v
          FROM idx),
        agg AS (SELECT doc_id,
          CAST(sum(v) AS DOUBLE) / any_value(n) AS mean_byte,
          CAST(count(*) FILTER (WHERE v // 32 = 0) AS DOUBLE) AS h0,
          CAST(count(*) FILTER (WHERE v // 32 = 1) AS DOUBLE) AS h1,
          CAST(count(*) FILTER (WHERE v // 32 = 2) AS DOUBLE) AS h2,
          CAST(count(*) FILTER (WHERE v // 32 = 3) AS DOUBLE) AS h3,
          CAST(count(*) FILTER (WHERE v // 32 = 4) AS DOUBLE) AS h4,
          CAST(count(*) FILTER (WHERE v // 32 = 5) AS DOUBLE) AS h5,
          CAST(count(*) FILTER (WHERE v // 32 = 6) AS DOUBLE) AS h6,
          CAST(count(*) FILTER (WHERE v // 32 = 7) AS DOUBLE) AS h7
          FROM vals GROUP BY doc_id)
      SELECT b.doc_id AS media_id,
        (['jpeg','png','webp'])[CAST(b.doc_id % 3 AS INTEGER) + 1] AS format,
        CAST(b.n AS INTEGER) AS n_bytes,
        coalesce(a.mean_byte, 0.0) AS mean_byte,
        coalesce(a.h0, 0.0) AS h0, coalesce(a.h1, 0.0) AS h1,
        coalesce(a.h2, 0.0) AS h2, coalesce(a.h3, 0.0) AS h3,
        coalesce(a.h4, 0.0) AS h4, coalesce(a.h5, 0.0) AS h5,
        coalesce(a.h6, 0.0) AS h6, coalesce(a.h7, 0.0) AS h7
      FROM b LEFT JOIN agg a ON a.doc_id = b.doc_id
      ORDER BY media_id"""))

  val q131DppPrune = Q("q131_dpp_prune",
    // DYNAMIC partition pruning — the third pillar of runtime
    // optimization alongside AQE (ScaleSpec) and CBO (q112): when the
    // dimension filter is only known at run time, Catalyst injects the
    // dim's surviving join keys as a partition filter on the fact scan
    // (reusing the broadcast exchange), so a 100 TB day-partitioned
    // fact table reads ONLY the days the filtered dim selects —
    // partition pruning without a literal predicate on the fact. The
    // require pins `dynamicpruning` into the scan's partition filters;
    // the oracle replays the join from the base table. Layout notes:
    // repartition on the partition column before partitionBy (one file
    // per day, not tasks×days), and the calendar dim carries DATE keys
    // to match the inferred partition-column type.
    (s, d) => {
      val root = PipelineQueries.tempRoot("graft_q131")
      val ev = Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
      ev.repartition(col("day"))
        .write.mode("overwrite").partitionBy("day")
        .parquet(root + "/fact")
      ev.select(col("day")).distinct()
        .write.mode("overwrite").parquet(root + "/dim")

      val fact = s.read.parquet(root + "/fact")
      val dim = s.read.parquet(root + "/dim")
        .filter(dayofmonth(col("day")).isin(5, 15, 25))
        .withColumnRenamed("day", "dim_day")
      val joined = fact.join(dim, col("day") === col("dim_day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("total"))
        .orderBy(col("day"))
      val phys = joined.queryExecution.executedPlan.toString
      require(phys.contains("dynamicpruning"),
        s"fact scan lacks a dynamic partition filter:\n$phys")
      joined
    },
    Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      WHERE date_part('day', date_trunc('day', ts)) IN (5, 15, 25)
      GROUP BY 1 ORDER BY day"""))

  /** Avro record schema for q132 (parsed executor-side per task). */
  private val q132AvroSchema =
    """{"type":"record","name":"Event","fields":[
       {"name":"event_id","type":"long"},
       {"name":"event_type","type":"string"},
       {"name":"value","type":"double"}]}"""

  val q132AvroContainer = Q("q132_avro_container",
    // Avro container files WITHOUT the spark-avro module (not on this
    // classpath): the avro core jars ship with Spark itself, so the
    // library reads/writes Avro through the extension-source pattern —
    // executor-side DataFileWriter per partition on the way out, and
    // `binaryFile` + a per-partition GenericDatumReader decode on the
    // way in. This is the identical plumbing shape as the multimodal
    // decode path (q96) but with a REAL container codec end-to-end:
    // schema declared, not inferred; one file per partition, not per
    // row; all decode work in executors. The oracle replays the
    // aggregate from the base table, so any round-trip corruption of
    // ids, types or doubles breaks the hash compare.
    (s, d) => {
      val dir = PipelineQueries.tempRoot("graft_q132") + "/avro"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val schemaJson = q132AvroSchema
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .repartition(4)
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          import org.apache.avro.Schema
          import org.apache.avro.file.DataFileWriter
          import org.apache.avro.generic.{GenericData, GenericDatumWriter,
            GenericRecord}
          val schema = new Schema.Parser().parse(schemaJson)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.create(schema, new java.io.File(dir, f"part-$pid%05d.avro"))
          try rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            rec.put("event_id", r.getLong(0))
            rec.put("event_type", r.getString(1))
            rec.put("value", r.getDouble(2))
            w.append(rec)
          } finally w.close()
        }
      val sp = s
      import sp.implicits._
      s.read.format("binaryFile").option("pathGlobFilter", "*.avro")
        .load(dir)
        .select(col("content"))
        .as[Array[Byte]]
        .mapPartitions { blobs =>
          import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
          import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
          blobs.flatMap { bytes =>
            val rd = new DataFileReader[GenericRecord](
              new SeekableByteArrayInput(bytes),
              new GenericDatumReader[GenericRecord]())
            val out = scala.collection.mutable.ArrayBuffer[(Long, String, Double)]()
            try while (rd.hasNext) {
              val rec = rd.next()
              out += ((rec.get("event_id").asInstanceOf[Long],
                rec.get("event_type").toString,
                rec.get("value").asInstanceOf[Double]))
            } finally rd.close()
            out
          }
        }
        .toDF("event_id", "event_type", "value")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val q98ZorderScan = Q("q98_zorder_scan",
    // Z-order layout under the oracle gate: a copy of events is written
    // through Scale.writeZOrdered on (user_id, day index) and a
    // two-dimensional box predicate is answered from the z-ordered
    // files. Results are layout-invariant — the oracle is the same box
    // filter over the raw table — so the green row pins the layout
    // machinery (morton interleave, range partition, transient z
    // column) while ZOrderSpec pins the data-skipping property itself
    // (every file covers a compact rectangle, not a full-range slab).
    (s, d) => {
      val dir = PipelineQueries.tempRoot("graft_q98") + "/events_z"
      val ev = Tables.events(s, d).select(col("user_id"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("day_idx"),
        col("value"))
      graft.ops.Scale.writeZOrdered(ev, "user_id", "day_idx", dir, files = 16)
      s.read.parquet(dir)
        .filter(col("user_id").between(3, 9) && col("day_idx").between(10, 40))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).as("v"))
        .select(col("user_id"), col("n_events"),
          col("v").cast(DoubleType).as("total"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, count(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events
      WHERE user_id BETWEEN 3 AND 9
        AND date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
          BETWEEN 10 AND 40
      GROUP BY user_id ORDER BY user_id"""))

  val q135ParquetBloom = Q("q135_parquet_bloom",
    // Parquet-NATIVE bloom filter layout under the oracle gate — the
    // needle-in-100 TB point-lookup structure completing the scan-
    // pruning family (q98 z-order = range boxes, q131 DPP = partition
    // dirs, q100 = query-side bloom join): lineitem is rewritten
    // hash-SCATTERED on the key so every row group spans the full key
    // range (min/max stats provably useless), with a native bloom on
    // l_orderkey in each row-group footer via Scale.writeWithBloom.
    // The in-plan require pins the layout (every row group carries a
    // bloom offset — footer-only check); a key IN-list point lookup
    // then answers from the bloom-equipped files. Results are layout-
    // invariant, so the oracle is the same lookup over the raw table;
    // ScaleSpec pins the skipping behavior itself (absent-key probe
    // reads ZERO rows from bloom files vs the full scatter without).
    (s, d) => {
      val dir = PipelineQueries.tempRoot("graft_q135") + "/li_bloom"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(xxhash64(col("l_orderkey"), col("l_linenumber")))
      // expectedNdv bounds PER-ROW-GROUP distincts (≈8k rows fit a
      // 256 KB group), not table ndv — ~24 KB of bloom per group
      graft.ops.Scale.writeWithBloom(li, "l_orderkey", expectedNdv = 20000,
        dir, rowGroupBytes = 256 * 1024)
      val offs = graft.ops.Scale.parquetBloomOffsets(s, dir, "l_orderkey")
      require(offs.nonEmpty && offs.forall(_ >= 0),
        s"parquet bloom filter missing from row groups: $offs")
      s.read.parquet(dir)
        .filter(col("l_orderkey").isin(32L, 407L, 1118L))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_orderkey IN (32, 407, 1118)
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""))

  val q40JsonProps = Q("q40_json_props",
    // §2.11 JSON scalar functions: extract from the props JSON column
    // both path-wise (get_json_object) and schema-wise (from_json),
    // then aggregate — parsing stays inside whole-stage codegen
    (s, d) => {
      val kPath = get_json_object(col("props"), "$.k").cast(IntegerType)
      val kSchema = from_json(col("props"), StructType(Seq(
        StructField("k", IntegerType)))).getField("k")
      Tables.events(s, d)
        .select(col("event_type"), kPath.as("k"), kSchema.as("k2"))
        .filter(col("k") === col("k2")) // both parses agree by construction
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val q42RangeJoin = Q("q42_range_join",
    // range (theta) join: bucket every event's value into a small
    // ranges dimension via lo <= v < hi. The dim side is broadcast, so
    // the plan is a BroadcastNestedLoopJoin over 10 rows — linear in
    // events, no shuffle of the big side (the 100 TB shape for
    // banding/bucketing joins; equi-join on a computed bucket key is
    // the alternative when ranges are uniform)
    (s, d) => {
      val ranges = s.range(10).select(
        col("id").cast(IntegerType).as("bucket"),
        (col("id") * 100.0).as("lo"),
        ((col("id") + 1) * 100.0).as("hi"))
      Tables.events(s, d)
        .join(broadcast(ranges),
          col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total"))
        .orderBy(col("bucket"))
    },
    Some("""WITH ranges AS (SELECT CAST(i AS INTEGER) AS bucket,
          i * 100.0 AS lo, (i + 1) * 100.0 AS hi FROM range(0, 10) r(i))
      SELECT bucket, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events JOIN ranges ON value >= lo AND value < hi
      GROUP BY bucket ORDER BY bucket"""))

  val q47ClickAttribution = Q("q47_click_attribution",
    // the streaming twin under the correctness gate: runs
    // StreamingJobs.clickToPurchase — the SAME code the stream-stream
    // join executes (withWatermark is a no-op on batch frames) — and
    // checks it against an external range-join oracle, proving
    // batch/stream parity beyond the ScalaTest parity suite.
    (s, d) => graft.streaming.StreamingJobs
      .clickToPurchase(Tables.events(s, d))
      .orderBy(col("user_id"), col("click_id"), col("purchase_id")),
    Some("""SELECT c.user_id, c.event_id AS click_id,
        p.event_id AS purchase_id, p.value
      FROM events c JOIN events p ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY c.user_id, click_id, purchase_id"""))

  private val EventTypes = Seq("view", "click", "purchase", "error", "signup")

  val q52Pivot = Q("q52_pivot",
    // long→wide reshape: day × event-type count matrix. The pivot value
    // list is EXPLICIT — omitting it makes Spark run a values-discovery
    // job over the whole table before planning, a hidden extra pass at
    // 100 TB. Absent combinations are zero-filled (Spark pivot yields
    // null; the oracle's FILTER'd counts yield 0).
    (s, d) => {
      val p = Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type", EventTypes)
        .agg(count(lit(1)))
      p.select(col("day") +:
        EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("day"))
    },
    Some(s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        ${EventTypes.map(t => s"COUNT(*) FILTER (event_type = '$t') AS \"$t\"")
          .mkString(", ")}
      FROM events GROUP BY 1 ORDER BY day"""))

  val q61AsofCustom = Q("q61_asof_custom",
    // the same as-of semantics as q38, but through the custom
    // whole-operator path (graft.plans.AsofJoin: logical node →
    // strategy → co-partitioned ordered-merge exec) instead of the
    // union+window encoding — one shuffle + sort per side, O(1) merge
    // state, each side keeps its own schema
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(TimestampType).as("o_ts"))
      graft.plans.AsofJoin.asof(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_ts",
          rightTieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("last_order"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id,
        (SELECT max(o.o_orderkey) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
           AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
             WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts))
          AS last_order
      FROM events e ORDER BY e.event_id"""))

  val q109AsofForward = Q("q109_asof_forward",
    // forward as-of: each event matched to the EARLIEST order at or
    // after it (q61's mirror image — "the next purchase after this
    // click"); same custom ordered-merge exec on the negated time
    // axis, so forward can never drift from the backward operator.
    // Ties at the matched date resolve to the greatest order key,
    // identical to backward.
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(TimestampType).as("o_ts"))
      graft.plans.AsofJoin.asof(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_ts",
          rightTieBreak = Seq("o_orderkey"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("next_order"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id,
        (SELECT max(o.o_orderkey) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
           AND o.o_orderdate = (SELECT min(o2.o_orderdate) FROM orders o2
             WHERE o2.o_custkey = e.user_id AND o2.o_orderdate >= e.ts))
          AS next_order
      FROM events e ORDER BY e.event_id"""))

  val q110AsofNearest = Q("q110_asof_nearest",
    // nearest as-of: each event matched to the closest order in either
    // direction, backward preferred on an exact distance tie —
    // completing the pandas-merge_asof direction trio on the same
    // single-pass merge exec (the one-row lookahead serves as the
    // forward candidate, so nearest costs the same as backward).
    // Tie-breaks at the matched date: backward side max order key,
    // forward side min (documented lookahead semantics).
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(TimestampType).as("o_ts"))
      graft.plans.AsofJoin.asof(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_ts",
          rightTieBreak = Seq("o_orderkey"), direction = "nearest")
        .select(col("event_id"), col("user_id"),
          col("o_orderkey").as("near_order"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id,
        CASE WHEN ch.use_b THEN
          (SELECT max(o.o_orderkey) FROM orders o
           WHERE o.o_custkey = e.user_id AND o.o_orderdate = ch.chosen)
        ELSE
          (SELECT min(o.o_orderkey) FROM orders o
           WHERE o.o_custkey = e.user_id AND o.o_orderdate = ch.chosen)
        END AS near_order
      FROM events e, LATERAL (
        SELECT CASE WHEN use_b THEN b ELSE f END AS chosen, use_b FROM (
          SELECT b, f, (b IS NOT NULL AND (f IS NULL OR
            date_diff('microsecond', b, e.ts) <=
            date_diff('microsecond', e.ts, f))) AS use_b
          FROM (SELECT
            (SELECT max(o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS b,
            (SELECT min(o_orderdate) FROM orders o
             WHERE o.o_custkey = e.user_id AND o.o_orderdate > e.ts) AS f)
        )) ch
      ORDER BY e.event_id"""))

  val q71MapFuncs = Q("q71_map_funcs",
    // map-typed column surface: construction from columns, map_concat,
    // a str_to_map round-trip over a packed "k=v" string, map_filter,
    // element_at and sorted key listing — reduced to scalar outputs
    // because the driver's pandas harness can't hash map cells (the q44
    // lesson). Expression-only inside whole-stage codegen, zero
    // shuffles; the oracle states the expected semantics directly.
    (s, d) => {
      val e = Tables.events(s, d).filter(col("event_id") < 200)
      val m = map_concat(
        map(lit("type"), col("event_type")),
        map(lit("uid"), col("user_id").cast(StringType)))
      val packed = concat_ws(",",
        concat(lit("type="), col("event_type")),
        concat(lit("uid="), col("user_id").cast(StringType)))
      e.select(col("event_id"), m.as("m"),
          str_to_map(packed, lit(","), lit("=")).as("rt"))
        .select(col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          element_at(col("rt"), "uid").cast(LongType).as("uid_back"),
          size(col("m")).as("n_keys"),
          size(map_filter(col("m"), (_, v) => v.isNotNull)).as("n_nonnull"),
          array_join(array_sort(map_keys(col("m"))), ",").as("keys_sorted"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type AS m_type, user_id AS uid_back,
        2 AS n_keys,
        CAST((CASE WHEN event_type IS NULL THEN 0 ELSE 1 END)
           + (CASE WHEN user_id IS NULL THEN 0 ELSE 1 END) AS INTEGER)
          AS n_nonnull,
        'type,uid' AS keys_sorted
      FROM events WHERE event_id < 200 ORDER BY event_id"""))

  val q81Variant = Q("q81_variant_json",
    // the VARIANT open-schema path (vs q40's fixed-schema from_json):
    // parse_json ONCE into a variant value, then typed variant_get
    // extraction over object and array paths plus try_variant_get on a
    // missing path. A nested document is synthesized around the flat
    // props column so there are real sub-paths to walk. Binary-encoded
    // variant parse/extract stays per-row expression work — no shuffle.
    (s, d) => {
      val doc = concat(lit("{\"meta\": {\"t\": \""), col("event_type"),
        lit("\"}, \"vals\": ["), col("user_id").cast(StringType), lit(", "),
        get_json_object(col("props"), "$.k"), lit("]}"))
      Tables.events(s, d).filter(col("event_id") < 300)
        .select(col("event_id"), parse_json(doc).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.meta.t", "string").as("vt"),
          variant_get(col("v"), "$.vals[0]", "bigint").as("v0"),
          variant_get(col("v"), "$.vals[1]", "int").as("v1"),
          try_variant_get(col("v"), "$.missing", "int").as("vmiss"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type AS vt, user_id AS v0,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS v1,
        CAST(NULL AS INTEGER) AS vmiss
      FROM events WHERE event_id < 300 ORDER BY event_id"""))

  val q82GapFill = Q("q82_gap_fill",
    // time-series resample + forward fill, the feature-store shape:
    // per-user daily spend re-gridded onto a complete day spine
    // (sequence + explode bounded by each user's own range) with gaps
    // carrying the last observed value forward — window last(ignoreNulls)
    // over a running frame. Day sums are DECIMAL (order-independent, the
    // q46 lesson) and the fill is one window over the user-partitioned
    // exchange; the spine join is an equi-join on (user, day).
    (s, d) => {
      val daily = Tables.events(s, d).filter(col("user_id") < 8)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("spend"))
      val spine = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"),
          date_format(col("day"), "yyyy-MM-dd").as("day_s"),
          col("spend").isNotNull.as("observed"),
          last(col("spend"), ignoreNulls = true).over(w)
            .cast(DoubleType).as("spend_ff"))
        .orderBy(col("user_id"), col("day_s"))
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
          SUM(CAST(value AS DECIMAL(18,4))) AS spend
        FROM events WHERE user_id < 8 GROUP BY user_id, CAST(ts AS DATE)),
      bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        FROM daily GROUP BY user_id),
      spine AS (SELECT user_id,
          CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds),
      j AS (SELECT s.user_id, s.day, d.spend
        FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day)
      SELECT user_id, strftime(day, '%Y-%m-%d') AS day_s,
        spend IS NOT NULL AS observed,
        CAST(last_value(spend IGNORE NULLS) OVER (PARTITION BY user_id
          ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS spend_ff
      FROM j ORDER BY user_id, day_s"""))

  val q85Funnel = Q("q85_funnel",
    // ordered funnel: signup → click → purchase per user, steps counted
    // by first-occurrence time ordering. One conditional-min aggregate
    // per user (single shuffle) then a one-row reduction — the shape
    // stays two map-side-combinable aggregates at any event volume.
    (s, d) => {
      val m = Tables.events(s, d).groupBy(col("user_id")).agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      m.agg(count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        sum(when(col("t_click") >= col("t_signup"), 1).otherwise(0))
          .cast(LongType).as("n_signup_click"),
        sum(when(col("t_click") >= col("t_signup") &&
          col("t_purchase") >= col("t_click"), 1).otherwise(0))
          .cast(LongType).as("n_full_funnel"))
    },
    Some("""WITH m AS (SELECT user_id,
        min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
      SELECT COUNT(*) AS n_users, COUNT(t_signup) AS n_signup,
        CAST(SUM(CASE WHEN t_click >= t_signup THEN 1 ELSE 0 END) AS BIGINT)
          AS n_signup_click,
        CAST(SUM(CASE WHEN t_click >= t_signup AND t_purchase >= t_click
          THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      FROM m"""))

  val q86Retention = Q("q86_retention",
    // cohort retention: users grouped by first-active day, activity
    // counted per (cohort, day-offset). distinct (user, day) first, so
    // each user contributes once per day — the count after the cohort
    // join is already a user count. Two aggregate shuffles + one join
    // on user_id; cohort table is 1 row per user (join, not window, so
    // the big activity side never re-sorts).
    (s, d) => {
      val act = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val cohort = act.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
      act.join(cohort, Seq("user_id"))
        .select(date_format(col("c0"), "yyyy-MM-dd").as("cohort_day"),
          datediff(col("day"), col("c0")).as("day_offset"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    },
    Some("""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        FROM events),
      cohort AS (SELECT user_id, min(day) AS c0 FROM act GROUP BY user_id)
      SELECT strftime(c0, '%Y-%m-%d') AS cohort_day,
        CAST(date_diff('day', c0, day) AS INTEGER) AS day_offset,
        COUNT(*) AS n_users
      FROM act a JOIN cohort c ON a.user_id = c.user_id
      GROUP BY 1, 2 ORDER BY cohort_day, day_offset"""))

  val q89FromCsvXml = Q("q89_from_csv_xml",
    // the remaining per-row semi-structured parsers: from_csv (schema'd
    // line split, custom separator) and Spark 4's from_xml — completing
    // the parse family with q40 (JSON) and q81 (VARIANT). Documents are
    // synthesized from the flat columns so the oracle can state the
    // expected round-trip directly; all expression work, zero shuffles.
    (s, d) => {
      val e = Tables.events(s, d).filter(col("event_id") < 250)
      val csvLine = concat_ws("|", col("event_id"), col("event_type"),
        col("user_id"))
      val csvSchema = StructType(Seq(StructField("id", LongType),
        StructField("typ", StringType), StructField("uid", LongType)))
      val parsedCsv = from_csv(csvLine, csvSchema, Map("sep" -> "|"))
      val xmlDoc = concat(lit("<e><t>"), col("event_type"), lit("</t><u>"),
        col("user_id"), lit("</u></e>"))
      val xmlSchema = StructType(Seq(StructField("t", StringType),
        StructField("u", LongType)))
      val parsedXml = from_xml(xmlDoc, xmlSchema)
      e.select(col("event_id"),
          parsedCsv.getField("typ").as("csv_type"),
          parsedCsv.getField("uid").as("csv_uid"),
          parsedXml.getField("t").as("xml_type"),
          parsedXml.getField("u").as("xml_uid"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, event_type AS csv_type, user_id AS csv_uid,
        event_type AS xml_type, user_id AS xml_uid
      FROM events WHERE event_id < 250 ORDER BY event_id"""))

  val q90SessionWindow = Q("q90_session_window",
    // the BUILT-IN session_window aggregate (q37 hand-rolls the same
    // semantics with lag + running sum — this is the one-liner Spark
    // form that also runs unchanged under readStream): sessions close
    // after 45 minutes of silence, window end = last event + gap.
    // Emitted as epoch micros (exact; no timestamp formatting parity
    // to negotiate). One shuffle on user_id.
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), "45 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        sum(col("value").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("total"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("w_start_us"),
        unix_micros(col("w.end")).as("w_end_us"),
        col("n_events"), col("first_event"), col("total"))
      .orderBy(col("user_id"), col("w_start_us")),
    Some("""WITH o AS (SELECT user_id, event_id, value,
          epoch_us(ts) AS us FROM events),
      f AS (SELECT *, CASE WHEN us - lag(us) OVER w IS NULL
              OR us - lag(us) OVER w > 2700 * CAST(1000000 AS BIGINT)
              THEN 1 ELSE 0 END AS new_s
            FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      g AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
              ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
      SELECT user_id, MIN(us) AS w_start_us,
        MAX(us) + 2700 * CAST(1000000 AS BIGINT) AS w_end_us,
        COUNT(*) AS n_events, MIN(event_id) AS first_event,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM g GROUP BY user_id, sid ORDER BY user_id, w_start_us"""))

  val q119AsofTolerance = Q("q119_asof_tolerance",
    // as-of join with TOLERANCE — pandas merge_asof's remaining knob
    // after backward (q61), forward (q109) and nearest (q110):
    // composed from the existing custom merge exec (compose before
    // building a new operator), with matches older than the tolerance
    // nulled AFTER the merge. Correct because backward picks the
    // LATEST right row ≤ ts: any other candidate is older still, so
    // "nearest match outside tolerance" always means "no match".
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.plans.AsofJoin.asof(ev, ord, Seq("user_id"), Seq("o_custkey"),
          "ts", "o_ts", rightTieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"),
          when(col("o_ts") >= col("ts") - expr("INTERVAL 60 DAYS"),
            col("o_orderkey")).as("last_order_60d"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id,
        (SELECT max(o.o_orderkey) FROM orders o
         WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
           AND o.o_orderdate >= e.ts - INTERVAL 60 DAY
           AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
             WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts))
          AS last_order_60d
      FROM events e ORDER BY e.event_id"""))

  val q121TextLog = Q("q121_text_log",
    // raw TEXT ingestion — the log-file workload: events serialized as
    // pipe-delimited log lines, read back with spark.read.text (one
    // string column, no structure assumed) and parsed by regex into
    // typed columns — the schema-on-read path for data that was never
    // a table. Doubles round-trip through their own written text, so
    // both engines parse identical bytes. Fixed path because the
    // oracle SQL is a static string (DuckDB reads the same lines as
    // delimited CSV with declared columns).
    (s, d) => {
      val path = "/tmp/graft_q121_log"
      Tables.events(s, d).select(concat_ws("|",
          col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
          col("user_id"), col("event_type"), col("value")).as("line"))
        .write.mode("overwrite").text(path)
      val re = "^([0-9]+)\\|([^|]+)\\|([0-9]+)\\|([^|]+)\\|(.+)$"
      s.read.text(path).select(
          regexp_extract(col("value"), re, 1).cast(LongType).as("event_id"),
          regexp_extract(col("value"), re, 2).as("ts_str"),
          regexp_extract(col("value"), re, 3).cast(LongType).as("user_id"),
          regexp_extract(col("value"), re, 4).as("event_type"),
          regexp_extract(col("value"), re, 5).cast(DoubleType).as("value"))
        .filter(col("event_type") =!= "error")
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, ts_str, user_id, event_type, value
      FROM read_csv('/tmp/graft_q121_log/*.txt',
        delim = '|', header = false,
        columns = {event_id: 'BIGINT', ts_str: 'VARCHAR',
                   user_id: 'BIGINT', event_type: 'VARCHAR',
                   value: 'DOUBLE'})
      WHERE event_type <> 'error'
      ORDER BY event_id"""))

  val q145NtzNative = Q("q145_ntz_native",
    // TIMESTAMP_NTZ as a FIRST-CLASS plan type, not a normalization
    // patch: the event time and the order time both run as NTZ through
    // the whole plan — NTZ expression work (date_format hour bucket),
    // the custom as-of exec with both time sides NTZ (ordered on
    // wall-clock micros via the DST-safe timestampdiff reader,
    // plans/AsofJoin.scala:107/:317-324), and a grouped aggregate on
    // the NTZ-derived key. Spark 4 made NTZ a headline type — it is
    // what ANY parquet writer with isAdjustedToUTC=false produces,
    // including the driver's own testdata since the round-5
    // regeneration — so a 100 TB corpus carries both flavors and both
    // must flow through windows and as-of natively. The NTZ columns
    // are derived by cast from the normalized reader under the UTC
    // session (wall clock == instant, so the cast is deterministic
    // whatever physical flavor the parquet arrives in), and DuckDB's
    // TIMESTAMP is itself zone-naive, so the oracle replays the same
    // wall-clock semantics natively. Plan shape: one shuffle+sort per
    // as-of side, one partial-agg shuffle on the hour key.
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          col("ts").cast(TimestampNTZType).as("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast(TimestampNTZType).as("o_ts"))
      graft.plans.AsofJoin.asof(ev, ord,
          Seq("user_id"), Seq("o_custkey"), "ts", "o_ts",
          rightTieBreak = Seq("o_orderkey"))
        .select(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
          col("o_orderkey"))
        .groupBy(col("hour"))
        .agg(count(lit(1)).as("n_events"),
          count(col("o_orderkey")).as("n_matched"))
        .orderBy(col("hour"))
    },
    Some("""WITH a AS (SELECT e.event_id,
          strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H') AS hour,
          (SELECT max(o.o_orderkey) FROM orders o
           WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
             AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
               WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts))
            AS last_order
        FROM events e)
      SELECT hour, count(*) AS n_events, count(last_order) AS n_matched
      FROM a GROUP BY hour ORDER BY hour"""))

  val all: Seq[Q] = Seq(q36DailyAgg, q37Sessionize, q38AsofJoin, q61AsofCustom,
    q39MultimodalMeta, q40JsonProps, q42RangeJoin, q47ClickAttribution,
    q52Pivot, q71MapFuncs, q81Variant, q82GapFill, q85Funnel, q86Retention,
    q89FromCsvXml, q90SessionWindow, q96MultimodalDecode, q98ZorderScan,
    q107HoppingWindow, q109AsofForward, q110AsofNearest, q119AsofTolerance,
    q121TextLog, q131DppPrune, q132AvroContainer, q135ParquetBloom,
    q145NtzNative)
}
