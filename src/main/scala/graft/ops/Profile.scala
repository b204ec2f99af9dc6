package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level data profiling: one narrow summary row per column
  * (row count, null count, distinct count) computed in a single pass
  * over the input.
  *
  * Scale design (100 TB): the whole profile is ONE aggregate — one shuffle
  * of partial aggregates, never one job per column. Exact multi-column
  * `countDistinct` plans through Expand (a row per profiled column, the
  * same shape Spark uses for multi-DISTINCT aggregates), which multiplies
  * the scan by `cols.length`; at very large scale set `approx = true` to
  * use HyperLogLog++ partial sketches instead — Expand disappears and the
  * plan is a plain partial/final aggregate. The per-column layout is then
  * produced by exploding an in-memory array of structs on the single
  * result row — no extra jobs, no driver loop over columns.
  *
  * Reference analogue: the ad-hoc `isna().sum()` / `nunique()` diagnostics
  * the pandas pipeline logs per load (etl/pipeline.py logging of row
  * counts and null checks), generalized to a reusable operator.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`: returns
    * (col_name, n_rows, n_nulls, n_distinct) sorted by col_name.
    * `n_distinct` ignores NULLs (SQL COUNT(DISTINCT) semantics).
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approx: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile of zero columns")
    val aggs: Seq[Column] = names.flatMap { c =>
      val distinct =
        if (approx) approx_count_distinct(col(c))
        else countDistinct(col(c))
      Seq(
        // sum over zero rows is NULL, not 0 — coalesce so an empty
        // input profiles as all-zeros instead of null-propagating
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nulls__$c"),
        distinct.as(s"__distinct__$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val entries = array(names.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nulls__$c").as("n_nulls"),
        col(s"__distinct__$c").as("n_distinct"))
    }: _*)
    one.select(explode(entries).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
      .orderBy(col("col_name"))
  }
}
