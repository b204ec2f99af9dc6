package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Functions._
import graft.ops.Relational._
import graft.tables.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): the reference's "daily payments
    * consolidation" (etl/pipeline.py entry point 3) transposed onto the
    * testdata — filter to the target day, dedup keep-last, semi-join
    * payments against valid enrollments, union the two payment branches,
    * ordered output. Fully lazy: the target day is a 1-row aggregate
    * broadcast-joined in, not a collect().
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.queries.Catalog.tune(spark)
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)

    // "yesterday" analogue: latest order date present in the data
    val target = orders.agg(max(to_date(col("o_orderdate"))).as("target_day"))
    val todays = orders
      .join(broadcast(target), to_date(col("o_orderdate")) === col("target_day"))

    // enrollments of the day: one per customer, keep-last (A1)
    val matriculas = dedupKeepLast(todays, Seq("o_custkey"),
      Seq(col("o_orderdate"), col("o_orderkey")))
      .select(col("o_orderkey").as("codigo_matricula"),
        col("o_custkey").as("codigo_estudiante"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("valor_matricula"))

    // payment branch 1: line items of valid enrollments (J1 semi-join)
    val validKeys = matriculas.select(col("codigo_matricula").as("l_orderkey"))
    val pagos1 = semiJoin(lineitem, validKeys, Seq("l_orderkey"))
      .select(col("l_orderkey").as("codigo_matricula"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("monto_pago"),
        lit("primera_cuota").as("origen"))

    // payment branch 2: the order totals themselves
    val pagos2 = matriculas.select(col("codigo_matricula"),
      col("valor_matricula").as("monto_pago"),
      lit("regular").as("origen"))

    unionByNameSafe(pagos1, pagos2)
      .orderBy(col("origen"), col("codigo_matricula"), col("monto_pago"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = graft.queries.Catalog.oracleSql
}
