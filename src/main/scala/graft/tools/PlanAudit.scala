package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan smell sweep over the whole catalog: for every query,
  * count exchanges, list join strategies, and flag plan shapes that
  * won't survive scale. Hard failure only on CartesianProduct or a
  * query that won't plan; the exchange count is advisory — persisted
  * frames repeat their cached subtree in the plan string once per
  * consumer, so eager-persist queries (q35) over-count.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).length
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .flatMap(j => Option(("\\b" + j).r.findAllIn(plan).length)
            .filter(_ > 0).map(n => s"$j x$n"))
        val smells = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (exchanges > 6) Some(s"MANY_EXCHANGES($exchanges)") else None
        ).flatten
        if (plan.contains("CartesianProduct")) bad += 1
        println(f"[audit] $name%-24s exch=$exchanges%2d  " +
          f"${joins.mkString(", ")}%-40s ${smells.mkString(" ")}")
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[audit] queries with smells or failures: $bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
