package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Relational.dedupKeepLast
import graft.ops.Scale
import graft.streaming.StreamingJobs

/** Scale stress: drives the core operator shapes at 10–100× the bench
  * row counts on self-generated data (never touches the correctness
  * testdata) and prints per-op wall times. The point is shape, not
  * absolute speed: linear scans, one-shuffle aggregations/dedups, no
  * driver-side materialization — if any op is accidentally quadratic
  * or collect-bound it shows up here long before a cluster does.
  *
  * Usage: sbt "runMain graft.tools.Stress [rows]"   (default 10M)
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stress] $label%-28s rows=$n%12d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // force FULL materialization (count() lets Catalyst prune computed
    // columns the row count doesn't reference)
    def force(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); df.count()
    }

    // deterministic synthetic event stream: ~90 days, zipf-ish user skew
    val ev = spark.range(rows).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * 777667L).as("ts"),
      pmod(hash(col("id") * 31L), lit(100000)).cast(LongType).as("user_id"),
      element_at(typedLit(Seq("view", "click", "purchase", "error", "signup")),
        pmod(hash(col("id")), lit(5)).cast(IntegerType) + 1).as("event_type"),
      (pmod(hash(col("id") + 7L), lit(100000)) / 100.0).as("value"))

    val dir = "/tmp/graft_stress"
    time("write parquet (partitioned)") {
      Scale.writePartitionedByDay(ev, col("ts"), s"$dir/events")
      rows
    }
    val t = spark.read.parquet(s"$dir/events")

    time("partition-pruned day scan") {
      t.filter(col("day") === "2024-01-15").count()
    }
    time("groupBy agg (5 groups)") {
      force(t.groupBy("event_type")
        .agg(count(lit(1)), sum("value"), avg("value")))
    }
    time("groupBy agg (100k groups)") {
      force(t.groupBy("user_id").agg(sum("value"), count(lit(1))))
    }
    time("dedup keep-last by user") {
      force(dedupKeepLast(t, Seq("user_id"), Seq(col("ts"), col("event_id"))))
    }
    time("window running total") {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      force(t.withColumn("rt", sum("value").over(
        w.rowsBetween(Window.unboundedPreceding, 0))))
    }
    time("semi-join vs 1M keys") {
      val keys = spark.range(1000000).select(col("id").as("event_id"))
      t.join(keys, Seq("event_id"), "left_semi").count()
    }
    time("salted agg (hot key)") {
      val skew = t.withColumn("user_id",
        when(col("event_id") % 10 =!= 0, 7L).otherwise(col("user_id")))
      force(Scale.saltedSumCount(skew, Seq("user_id"), "value", 32))
    }
    time("tumbling daily agg (batch)") {
      force(StreamingJobs.dailyAgg(t.select("ts", "event_type", "value")))
    }
    time("topk 100") {
      t.orderBy(col("value").desc, col("event_id")).limit(100).count()
    }
    spark.stop()
  }
}
