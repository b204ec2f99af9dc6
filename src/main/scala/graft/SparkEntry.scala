package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functions._
import graft.ops.Relational._
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the END-TO-END corpus build (q162) — the full
    * crawl-pipeline composition of the engine's LLM-data surface:
    * URL-canonical dedup → HTML extraction → mojibake repair → NB
    * quality gate (trained + persisted) → DSIR importance selection
    * (trained + persisted) → BPE tokenize + 2048-token sequence pack.
    * The reference's "daily payments consolidation" flow remains in
    * the catalog as q45_etl_pipeline.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.queries.Catalog.tune(spark)
    graft.queries.TextQueries.q162CorpusBuild
      .run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = graft.queries.Catalog.oracleSql
}
