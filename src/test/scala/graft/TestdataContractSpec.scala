package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Schema contract over the DRIVER-GENERATED testdata.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed physical types underneath the engine once (round 5:
  * `events.ts` TIMESTAMP(NANOS) → TIMESTAMP_NTZ), which surfaced as 14
  * scattered analysis-time failures. This spec turns the next silent
  * regeneration into ONE actionable failure naming the table/column:
  * every table's columns must stay inside the engine's supported type
  * envelope, and `events.ts` must normalize to TimestampType through
  * [[Tables.events]] whatever physical flavor it arrives in.
  */
class TestdataContractSpec extends SparkSpec {

  // the type envelope the engine's readers + oracle comparisons handle
  private val supported: Set[DataType] = Set(
    BooleanType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, DateType, TimestampType, TimestampNTZType,
    ArrayType(FloatType, containsNull = true),
    ArrayType(FloatType, containsNull = false),
    ArrayType(StringType, containsNull = true),
    ArrayType(StringType, containsNull = false))

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def sfDirs: Seq[String] =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")
      .filter(d => Files.exists(Paths.get(d)))

  test("every testdata table's column types are in the supported envelope") {
    // without this a TIMESTAMP(NANOS) regeneration dies in the reader
    // instead of producing the actionable violation below
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val violations = for {
      dir <- sfDirs
      t <- tables if Files.exists(Paths.get(s"$dir/$t.parquet"))
      f <- spark.read.parquet(s"$dir/$t.parquet").schema.fields
      if !supported.contains(f.dataType)
      // events.ts is special-cased: any of the three time flavors is in
      // contract because Tables.events normalizes them (asserted below)
      if !(t == "events" && f.name == "ts" &&
        Tables.supportedEventTimeTypes.contains(f.dataType))
    } yield s"$dir/$t.parquet column `${f.name}` has unsupported type " +
      s"${f.dataType.sql} — extend the reader normalization in " +
      "tables/Tables.scala (and this envelope) before any query sees it"
    assert(violations.isEmpty, violations.mkString("\n"))
  }

  test("events.ts normalizes to TIMESTAMP through Tables.events at every SF") {
    sfDirs.foreach { dir =>
      val got = Tables.events(spark, dir).schema("ts").dataType
      assert(got == TimestampType,
        s"Tables.events($dir) surfaced ts as ${got.sql}, not TIMESTAMP — " +
          "the normalization contract in Tables.normalizeEventTime is broken")
    }
  }

  test("normalizeEventTime handles all three physical event-time flavors") {
    import spark.implicits._
    val base = Seq((1L, 1700000000000000L)).toDF("id", "ts")
    val asNanos = base.withColumn("ts", col("ts") * 1000) // long nanos
    val asNtz = base.withColumn("ts",
      timestamp_micros(col("ts")).cast(TimestampNTZType))
    val asTs = base.withColumn("ts", timestamp_micros(col("ts")))
    val all = Seq("long-nanos" -> asNanos, "ntz" -> asNtz, "tz" -> asTs)
    all.foreach { case (label, df) =>
      val n = Tables.normalizeEventTime(df, "ts")
      assert(n.schema("ts").dataType == TimestampType, s"flavor $label")
      // UTC session: all three flavors denote the same instant
      assert(n.select(unix_micros(col("ts"))).head.getLong(0) ==
        1700000000000000L, s"flavor $label not instant-preserving")
    }
  }

  test("a perturbed schema fails the envelope check with the table/column named") {
    // deliberately out-of-envelope column type (the spec's own negative
    // test: DECIMAL(38,18) is not in the envelope)
    val bad = spark.range(1).select(
      col("id").cast(DecimalType(38, 18)).as("amount"))
    val hit = bad.schema.fields.filterNot(f => supported.contains(f.dataType))
    assert(hit.map(_.name).toSeq == Seq("amount"))
  }
}
