package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` surface, the standard technique
  * for libraries that add whole operators (same approach as public
  * Spark extensions like Delta/Sedona): everything here is a one-line
  * delegation, kept in one file so the internal-API footprint is
  * auditable. Needed because building a DataFrame from a custom
  * LogicalPlan (`Dataset.ofRows`) has no public equivalent.
  */
object GraftSqlShim {

  /** Wrap a (resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan beneath a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** Idempotently add an extra planner strategy to a live session
    * (the session-build-time path is `GraftExtensions`).
    */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    if (!s.experimental.extraStrategies.contains(strategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ strategy
  }

  /** Idempotently add an extra optimizer rule to a live session. */
  def addOptimization(spark: SparkSession,
                      rule: org.apache.spark.sql.catalyst.rules.Rule[
                        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
                      ]): Unit = {
    val s = spark.asInstanceOf[classic.SparkSession]
    if (!s.experimental.extraOptimizations.contains(rule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ rule
  }
}
