package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Physical-layout proofs: bucketed tables co-locate a join (no
  * Exchange on either side), and the format surface (json/orc/csv)
  * round-trips.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle") {
    // (warehouse dir is a temp dir — set statically in TestSpark)
    // disable broadcast so the join strategy decision is about
    // partitioning, not size
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_linenumber"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("json/orc/csv sinks round-trip") {
    val base = Files.createTempDirectory("fmt").toString
    val df = spark.read.parquet(s"$sfDir/nation.parquet")
    val n = df.count()

    df.write.mode("overwrite").json(s"$base/j")
    assert(spark.read.json(s"$base/j").count() == n)

    df.write.mode("overwrite").orc(s"$base/o")
    assert(spark.read.orc(s"$base/o").count() == n)

    df.write.mode("overwrite").option("header", "true").csv(s"$base/c")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$base/c")
    assert(csv.count() == n && csv.columns.sameElements(df.columns))
  }
}
