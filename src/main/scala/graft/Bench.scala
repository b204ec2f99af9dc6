package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Contention robustness: the whole suite runs `Passes` times (cache
  * cleared between passes, never within one — cross-query plan-fragment
  * sharing, e.g. the q30/q31/q32 shingle frame, is part of the measured
  * design) and each query reports its MEDIAN across passes, so one
  * external CPU spike can't inflate a query 5–15× in the recorded JSON.
  */
object Bench {

  private val Passes = 3

  /** The LIFECYCLE-class gates: queries whose measured pass MUTATES a
    * persisted index/model/corpus warehouse (build / train / append /
    * ingest / merge / delete / rollback) rather than only serving from
    * one. The bench artifact reports this class as its own subtotal so
    * the per-query trendline separates engine speed from gate
    * composition — the round-11 aggregate rise was 13 new
    * fully-charged lifecycle gates, not a regression, and the split
    * makes that distinction a recorded number instead of a forensic
    * argument. Serving-class = everything else (pure computation and
    * serve-only-repeat gates behind fixture markers).
    */
  private val LifecycleClass: Set[String] = Set(
    "q136_incremental_neardup", "q141_semdedup", "q148_incremental_ivf",
    "q149_bpe_tokenize", "q150_ivf_pq", "q156_cluster_sample",
    "q157_inverted_index", "q160_phrase_search", "q162_corpus_build",
    "q163_pq_codebooks", "q164_proximity_search", "q167_index_compact",
    "q168_incremental_corpus", "q170_adc_search", "q171_auto_compact",
    "q172_adc_ingest", "q173_maxscore_topk", "q179_batch_search",
    "q180_adc_compact", "q184_warehouse_rrf", "q190_tiered_compact",
    "q191_adc_tiered", "q196_invidx_rollback", "q197_index_delete",
    "q198_vector_delete", "q200_boolean_search", "q201_filtered_ann")

  /** The AUDIT-class gates (the round-12 verdict's "give the split an
    * audit bucket"): queries whose measured pass is a
    * maintenance-cadence AUDIT over persisted warehouse state — funnel
    * replays over a batch (every production stage re-counted against
    * the persisted models) and warehouse health-stats reads (backlog
    * scans) — rather than a serving query OR a warehouse mutation.
    * These run at operational cadence (per release / per maintenance
    * window), so charging them to the serving trendline conflated
    * audit depth with engine speed — q206's six-stage funnel was the
    * single largest "serving" line item at 22 s.
    */
  private val AuditClass: Set[String] = Set(
    "q186_funnel_report", "q189_ingest_funnel", "q202_warehouse_stats",
    "q205_tombstone_debt", "q206_langid_ingest",
    "q208_retained_maintenance")

  // Single static shutdown hook over a volatile payload: repeated
  // Bench.main invocations inside one long-lived JVM must not stack
  // hooks, or at exit every prior run's stale JSON would print after
  // the current one and a last-line tail capture would record an old
  // run's figures.
  @volatile private var lastLine: String = null
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (lastLine != null) {
        val out = new java.io.PrintStream(new java.io.FileOutputStream(
          java.io.FileDescriptor.out), true)
        out.println(lastLine)
        out.flush()
      }
    }))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the machine's full parallelism — the driver invokes
    // Bench without SPARK_GRAFT_CPUS, and a small fixed default would
    // record figures from a fraction of the machine the baseline used
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/session warmup (codegen compiler, shuffle machinery) so the
    // first measured query isn't charged ~10 s of fixed startup cost;
    // touches no benchmark data.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(10000).selectExpr("id % 7 as g").groupBy("g").count().collect()

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // passes(p) = per-query (seconds, succeeded)
    val passes: Seq[Map[String, (Double, Boolean)]] = (1 to Passes).map { _ =>
      spark.catalog.clearCache()
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // full-row checksum, not count(): count() lets Catalyst prune
        // every computed column the row count doesn't reference
        // (aggregates under a key-only ORDER BY were silently skipped).
        // The checksum forces every output column per row while still
        // letting EliminateSorts drop the determinism-only ORDER BY the
        // oracle harness needs — measuring the query, not the harness.
        val ok =
          try {
            val out = fn(spark, sfDir)
            out.agg(org.apache.spark.sql.functions.max(
              org.apache.spark.sql.functions.xxhash64(
                out.columns.toIndexedSeq.map(org.apache.spark.sql.functions.col): _*))).collect()
            true
          } catch { case e: Throwable =>
            // a failed query must be VISIBLE in the output, not recorded
            // as a near-zero timing that makes a regression look fast
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }.toMap
    }

    val medians = names.map { case (name, _) =>
      val runs = passes.map(_(name))
      val okTimes = runs.collect { case (t, true) => t }.sorted
      // median of successful runs; if every pass failed, report the
      // median attempt time and flag the query in "failed"
      val ts = if (okTimes.nonEmpty) okTimes else runs.map(_._1).sorted
      name -> ts(ts.size / 2)
    }
    // per-query [min, median, max] across passes — recorded in the FULL
    // file artifact only (the compact tail line stays small). A query
    // whose max ≫ median ran under transient load in some pass; a query
    // whose min ≈ median ≈ max is genuinely that expensive — exactly
    // the attribution the round-5 q114 bench dispute needed.
    val spreads = names.map { case (name, _) =>
      val runs = passes.map(_(name))
      val okTimes = runs.collect { case (t, true) => t }.sorted
      val ts = if (okTimes.nonEmpty) okTimes else runs.map(_._1).sorted
      name -> ((ts.head, ts(ts.size / 2), ts.last))
    }
    val failed = names.collect {
      case (name, _) if passes.exists(!_(name)._2) => name
    }

    // millisecond precision: sub-ms digits are noise, and at 110
    // queries the full-precision line was ~8 KB — halving it keeps the
    // whole JSON inside any size-limited tail capture
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    val qs = medians.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = medians.map(_._2).sum
    // self-describing: total_s/cpus/n_queries/passes ride along so the
    // file artifact needs no re-derivation ("metric"/"value" stay for
    // the driver's existing parse)
    val spreadJson = spreads.map { case (k, (mn, md, mx)) =>
      s"\"$k\":[${ms(mn)},${ms(md)},${ms(mx)}]"
    }.mkString("{", ",", "}")
    // queries_min: the per-query MIN across passes — the series
    // regression comparisons should use (BASELINE.md round-7 rule). A
    // median of 3 is still contaminated when 2 of 3 passes hit host
    // load (q40's [0.95, 4.52, 20.8] round-6 spread); the min is the
    // closest observable to the query's intrinsic cost on this box.
    val minsJson = spreads.map { case (k, (mn, _, _)) =>
      s"\"$k\":${ms(mn)}"
    }.mkString("{", ",", "}")
    // composition split: lifecycle-class vs serving-class subtotals
    // (medians and mins) so the trendline separates gate composition
    // from engine speed
    val lifecycleMed = medians.collect {
      case (k, v) if LifecycleClass(k) => v }.sum
    val lifecycleMin = spreads.collect {
      case (k, (mn, _, _)) if LifecycleClass(k) => mn }.sum
    val auditMed = medians.collect {
      case (k, v) if AuditClass(k) => v }.sum
    val auditMin = spreads.collect {
      case (k, (mn, _, _)) if AuditClass(k) => mn }.sum
    val totalMin = spreads.map(_._2._1).sum
    val nLifecycle = medians.count(m => LifecycleClass(m._1))
    val splitJson =
      s""""lifecycle_s":${ms(lifecycleMed)},""" +
        s""""audit_s":${ms(auditMed)},""" +
        s""""serving_s":${ms(total - lifecycleMed - auditMed)},""" +
        s""""lifecycle_min_s":${ms(lifecycleMin)},""" +
        s""""audit_min_s":${ms(auditMin)},""" +
        s""""serving_min_s":${ms(totalMin - lifecycleMin - auditMin)},""" +
        s""""n_lifecycle":$nLifecycle,""" +
        s""""n_audit":${medians.count(m => AuditClass(m._1))}"""
    val json =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
        s""""total_s":${ms(total)},"n_queries":${medians.size},""" +
        s""""cpus":$cpus,"passes":$Passes,$splitJson,""" +
        s""""queries":$qs,"queries_min":$minsJson,"spread":$spreadJson,""" +
        s""""failed":$failedJson,"sf":"$sfDir"}"""
    // The capture that records this run keeps only the LAST ~2000
    // characters of stdout, and sbt appends a ~70-char [success] banner
    // after the forked JVM exits — a 135-query JSON line (~4 KB) can
    // therefore never be fully inside the captured tail. The full JSON
    // goes to target/bench.json and the (sbt-logger-prefixed) console;
    // the LAST line written is a compact headline JSON — same
    // metric/value/unit contract, per-query map cut to the slowest 12,
    // pointer to the full file — sized to fit the tail window whole.
    val slowest = medians.sortBy(-_._2).take(12)
      .map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
        s""""total_s":${ms(total)},"n_queries":${medians.size},""" +
        s""""cpus":$cpus,"passes":$Passes,$splitJson,""" +
        s""""failed":$failedJson,"queries":$slowest,""" +
        s""""queries_full":"target/bench.json","sf":"$sfDir"}"""
    // stop Spark BEFORE printing so no executor/log line can interleave
    // with (or clip) the JSON in a captured stream, and also write it to
    // a file — the recorded artifact must survive log buffering
    spark.stop()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench.json"), json)
    println(json)
    // A shutdown hook writing straight to fd 1 (bypassing sbt's logger
    // redirection of System.out) runs at forked-JVM exit, after every
    // other line this process prints — the compact JSON is then the
    // last unprefixed stdout line before sbt's own banner.
    hookInstalled
    lastLine = compact
  }
}
