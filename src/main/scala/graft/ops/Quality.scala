package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the deequ shape): a
  * rule set is evaluated in as few passes as the rules allow and comes
  * back as one small (rule, metric, passed) report frame — the gate a
  * pipeline consults before publishing a table.
  *
  * Scale design: all row-local rules (null fraction, range fraction,
  * pattern fraction) share ONE aggregate over one scan — adding a rule
  * adds a column to the agg, not a pass over the data. Uniqueness
  * rules need distinct counts, and the q44 lesson applies: a distinct
  * agg must not share a plan with other buffers, so each Unique rule
  * runs as its own tiny aggregate; the report union is rows-per-rule,
  * not rows-per-row. Nothing here shuffles more than the aggregates'
  * 1-row partials.
  *
  * Determinism contract (for the q108 oracle): metrics are IEEE double
  * divisions of exact long counts — bit-identical across engines.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Fraction of null values in `col` must be ≤ maxNullFrac. */
  case class NotNull(col: String, maxNullFrac: Double = 0.0) extends Rule {
    def name = s"not_null:$col"
  }

  /** No duplicate values of the key (metric = duplicate row count). */
  case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique:${cols.mkString(",")}"
  }

  /** Fraction of non-null values inside [lo, hi] must be ≥ minFrac. */
  case class InRange(col: String, lo: Double, hi: Double,
                     minFrac: Double = 1.0) extends Rule {
    def name = s"in_range:$col"
  }

  /** Fraction of non-null values matching `regex` must be ≥ minFrac.
    * Keep the pattern inside the RE2∩Java common dialect (see q51/q57)
    * if the report is oracle-compared.
    */
  case class Matches(col: String, regex: String,
                     minFrac: Double = 1.0) extends Rule {
    def name = s"matches:$col"
  }

  /** Evaluate `rules` against `df`; returns (rule, metric, passed)
    * sorted by rule name. Row-local rules share one aggregate; each
    * Unique rule is its own distinct aggregate.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Quality.check needs at least one rule")
    // Two rules of the same kind on the same column (e.g. InRange with
    // different bounds at different minFrac) share a base name; keep
    // the first occurrence's name stable and disambiguate repeats with
    // a #k suffix so both report rows appear instead of colliding.
    // Aggregate aliases are positional (_m<i>), never the display name,
    // so duplicate display names can never produce an ambiguous col().
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val named: Seq[(Rule, String)] = rules.map { r =>
      val n = seen.updateWith(r.name)(c => Some(c.getOrElse(0) + 1)).get
      (r, if (n == 1) r.name else s"${r.name}#$n")
    }
    // degenerate-input conventions (0/0 would otherwise surface as
    // NaN): an empty table has null-fraction 0 (no violations); a
    // fraction-of-non-null rule over zero non-null values is vacuously
    // compliant (metric 1, deequ's convention)
    val rowLocal = named.zipWithIndex.collect {
      case ((r: NotNull, dn), i) =>
        val frac = when(count(lit(1)) === 0, 0.0)
          .otherwise(sum(when(col(r.col).isNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)))
        (dn, s"_m$i", frac, (m: Column) => m <= r.maxNullFrac)
      case ((r: InRange, dn), i) =>
        val frac = when(count(col(r.col)) === 0, 1.0)
          .otherwise(sum(when(col(r.col).between(r.lo, r.hi), 1L)
            .otherwise(0L)).cast("double") / count(col(r.col)))
        (dn, s"_m$i", frac, (m: Column) => m >= r.minFrac)
      case ((r: Matches, dn), i) =>
        val frac = when(count(col(r.col)) === 0, 1.0)
          .otherwise(sum(when(regexp_like(col(r.col), lit(r.regex)), 1L)
            .otherwise(0L)).cast("double") / count(col(r.col)))
        (dn, s"_m$i", frac, (m: Column) => m >= r.minFrac)
    }
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val agged = df.agg(rowLocal.head._3.as(rowLocal.head._2),
          rowLocal.tail.map { case (_, a, c, _) => c.as(a) }: _*)
        Some(agged.select(rowLocal.map { case (dn, a, _, pass) =>
          struct(lit(dn).as("rule"), col(a).cast("double").as("metric"),
            pass(col(a)).as("passed")).as(a)
        }: _*).select(explode(array(rowLocal.map(r => col(r._2)): _*)).as("r"))
          .select(col("r.rule"), col("r.metric"), col("r.passed")))
      }
    val uniqueReports = named.collect { case (r: Unique, dn) =>
      df.agg((count(lit(1)) -
        count_distinct(struct(r.cols.map(col): _*))).cast("double")
        .as("metric"))
        .select(lit(dn).as("rule"), col("metric"),
          (col("metric") === 0.0).as("passed"))
    }
    (localReport.toSeq ++ uniqueReports)
      .reduce(_.unionByName(_))
      .orderBy(col("rule"))
  }
}
