package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Scale

/** Two-pass contiguous global row numbering (Scale.globalRowNumber):
  * parity with the naive global window, the plan-shape contrast that
  * motivates it (the naive form collapses to Exchange SinglePartition;
  * the two-pass form stays distributed), and offset/lineage pinning.
  */
class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  // shuffled composite keys: numbering must follow (grp, k) order, not
  // input order, and the ~8 range partitions exercise real offsets
  private def fixture(n: Int) = spark.range(n)
    .select(
      pmod(hash(col("id") * 31L), lit(7)).cast("int").as("grp"),
      col("id").as("k"),
      concat(lit("v"), col("id")).as("payload"))

  test("matches the naive global window and stays distributed") {
    val df = fixture(5000)
    // AQE legitimately coalesces this toy frame to ONE post-shuffle
    // partition (it's tiny); pin it off so the distribution assertions
    // below exercise the multi-partition offsets real scale would
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prior = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    val got =
      try Scale.globalRowNumber(df, "row_num", col("grp"), col("k"))
      finally spark.conf.set(coalesceKey, prior)
    // parity with the single-partition formulation
    val expect = df.withColumn("row_num",
      row_number().over(Window.orderBy(col("grp"), col("k"))) - 1)
    assert(got.orderBy(col("row_num")).collect().toSeq ==
      expect.orderBy(col("row_num")).collect().toSeq)
    // the naive window IS the trap: one task carries every row
    val naivePlan = expect.queryExecution.executedPlan.toString
    assert(naivePlan.contains("SinglePartition"),
      "fixture lost its point: the naive window no longer single-partitions")
    // the two-pass result is genuinely distributed (numbering crossed
    // partition boundaries, so the offsets did real work)
    assert(got.rdd.getNumPartitions > 1)
    val perPart = got.groupBy(spark_partition_id()).count().collect()
    assert(perPart.length > 1)
  }

  test("numbers are contiguous 0..n-1 exactly once") {
    val n = 3000
    val got = Scale.globalRowNumber(fixture(n), "rn", col("grp"), col("k"))
      .agg(count(lit(1)), countDistinct(col("rn")), min(col("rn")),
        max(col("rn")), sum(col("rn"))).head()
    assert(got.getLong(0) == n && got.getLong(1) == n)
    assert(got.getLong(2) == 0L && got.getLong(3) == n - 1L)
    assert(got.getLong(4) == n.toLong * (n - 1) / 2)
  }

  test("empty frame and single row are fine") {
    val empty = fixture(0)
    assert(Scale.globalRowNumber(empty, "rn", col("k")).count() == 0)
    val one = Scale.globalRowNumber(fixture(1), "rn", col("k")).head()
    assert(one.getAs[Long]("rn") == 0L)
  }
}
