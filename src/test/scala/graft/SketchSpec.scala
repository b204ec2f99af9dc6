package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate error bounds: q44 emits within-bound booleans
  * (sketch vs exact, computed in one aggregate) that the DuckDB oracle
  * pins to literal TRUE. This spec re-derives the exact side
  * independently and checks the flags really encode the error contract.
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

    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      // the exact columns must agree with an independent computation
      assert(a.getAs[Long]("exact_orders") == e.getAs[Long]("orders"))
      assert(a.getAs[Long]("exact_parts") == e.getAs[Long]("parts"))
      assert(a.getAs[Double]("exact_median_price") ==
        e.getAs[Double]("median_price"))
      // and every error-contract flag must hold — these are the values
      // the DuckDB oracle pins to TRUE, so a red here means a red q44
      for (c <- Seq("orders_ok", "parts_ok", "median_ok", "p25_ok", "p75_ok"))
        assert(a.getAs[Boolean](c), s"$flag sketch bound violated: $c")
    }
  }
}
