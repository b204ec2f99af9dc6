package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Readers for the driver's parquet testdata (TESTDATA.md). */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Driver regenerations have surfaced `events.ts` under three parquet
    * physical shapes so far: TIMESTAMP(NANOS) (readable only as a long with
    * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP_NTZ
    * (`isAdjustedToUTC=false`), and plain TIMESTAMP. Normalize all three to
    * session-zoned microsecond TimestampType so every downstream consumer
    * (`unix_micros`, `session_window`, `withWatermark`, the as-of exec's
    * time-type equality check) sees one type. The engine pins the session
    * time zone to UTC (`GraftSession`), which makes the NTZ→TIMESTAMP cast
    * instant-preserving; the nanos `div` is integer (a double division
    * would lose precision above 2^53 ns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTime(table(spark, dir, "events"), "ts")
  }

  /** Normalize one event-time column of any supported physical type
    * (long nanos / TIMESTAMP_NTZ / TIMESTAMP) to TimestampType. Shared by
    * the batch reader above and the streaming readers, so NTZ-tolerance is
    * a single contract rather than per-call-site luck.
    */
  def normalizeEventTime(df: DataFrame, col0: String): DataFrame =
    df.schema(col0).dataType match {
      case LongType         => df.withColumn(col0, timestamp_micros(expr(s"$col0 div 1000")))
      case TimestampNTZType => df.withColumn(col0, col(col0).cast(TimestampType))
      case _                => df
    }

  /** The TimestampType-normalized schema `events` produces — what a
    * streaming reader should declare so its batch twin matches. */
  def eventsSchema(spark: SparkSession, dir: String): StructType =
    events(spark, dir).schema

  /** The column types the engine's readers are contracted to handle.
    * The schema-contract spec sweeps the driver testdata against this. */
  def supportedEventTimeTypes: Set[DataType] =
    Set(LongType, TimestampNTZType, TimestampType)
}
