package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.RelationalQueries.Q

/** Aggregated query catalog: the single registry SparkEntry exposes. */
object Catalog {

  def allQueries: Seq[Q] =
    RelationalQueries.all ++ TextQueries.all ++ VectorQueries.all ++
      EventQueries.all ++ PipelineQueries.all

  /** Session settings every catalog query relies on, applied defensively
    * in case the driver builds the session without them. All are
    * runtime-mutable SQLConf entries.
    */
  def tune(spark: SparkSession): Unit = {
    // pandas-style lenient casts (invalid → null) + oracle-comparable
    // semantics; the library still uses try_* forms where parse can fail.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled",
      sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
    // Partition discovery of the bucketed index trees (64 bucket dirs ×
    // N generations) crosses the default parallel-listing threshold
    // (32 paths), so EVERY spark.read.parquet over a postings/index
    // tree launched a whole Spark listing job for a directory set a
    // local filesystem lists in microseconds — pure per-action
    // overhead on the serve/maintain paths (guide §6: listing cost).
    // Parameterized for deployments on slow object stores, where
    // parallel listing genuinely wins: export SPARK_GRAFT_LIST_PAR to
    // restore a lower threshold there.
    spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold",
      sys.env.getOrElse("SPARK_GRAFT_LIST_PAR", "4096"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { q =>
      q.name -> { (s: SparkSession, d: String) => tune(s); q.run(s, d) }
    }.toMap

  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
