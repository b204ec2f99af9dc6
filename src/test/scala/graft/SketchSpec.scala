package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate error bounds: q44 has no cross-engine oracle
  * (sketch implementations differ by design), so accuracy is asserted
  * here against the exact values on the same data.
  */
class SketchSpec extends SparkSpec {

  test("approx sketches stay within tolerance of exact aggregates") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val approx = graft.queries.RelationalQueries.q44ApproxSketches
      .run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_orderkey")).as("orders"),
        count_distinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median_price"))
      .collect().map(r => r.getString(0) -> r).toMap

    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val relOrders = math.abs(
        a.getAs[Long]("approx_orders").toDouble - e.getAs[Long]("orders")) /
        e.getAs[Long]("orders").toDouble
      // default rsd is 0.05 — allow 3x the target standard deviation
      assert(relOrders < 0.15, s"$flag HLL default-rsd error $relOrders")
      val relParts = math.abs(
        a.getAs[Long]("approx_parts").toDouble - e.getAs[Long]("parts")) /
        e.getAs[Long]("parts").toDouble
      assert(relParts < 0.03, s"$flag HLL rsd=0.01 error $relParts")
      val relMedian = math.abs(
        a.getAs[Double]("approx_median_price") - e.getAs[Double]("median_price")) /
        e.getAs[Double]("median_price")
      assert(relMedian < 0.02, s"$flag quantile-sketch error $relMedian")
      val p25 = a.getAs[Double]("qty_p25")
      val p75 = a.getAs[Double]("qty_p75")
      assert(p25 <= p75, s"$flag quartiles out of order: $p25 > $p75")
    }
  }
}
