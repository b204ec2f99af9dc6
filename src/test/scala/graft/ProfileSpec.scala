package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.ops.Profile

class ProfileSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), Some(1.5)),
    (2L, Some("a"), None),
    (3L, None, Some(2.5)),
    (4L, Some("b"), Some(2.5))).toDF("id", "s", "x")

  test("profile reports rows, nulls and distincts per column") {
    val got = Profile.profile(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet == Set("id", "s", "x"))
    assert(got("id") == ((4L, 0L, 4L)))
    assert(got("s") == ((4L, 1L, 2L)))
    assert(got("x") == ((4L, 1L, 2L)))
  }

  test("profile restricted to a column subset") {
    val got = Profile.profile(df, Seq("s")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("s"))
  }

  test("approx profile matches exact counts on a small frame") {
    // HLL++ at default precision is exact at these cardinalities
    val exact = Profile.profile(df).collect().map(_.toSeq).toSet
    val approx = Profile.profile(df, approx = true).collect().map(_.toSeq).toSet
    assert(approx == exact)
  }

  test("an empty frame profiles as zeros, not nulls") {
    val got = Profile.profile(df.filter(col("id") < 0)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.values.toSet == Set((0L, 0L, 0L)))
  }

  test("exact profile runs as a single aggregation job (no per-column scans)") {
    val plan = Profile.profile(df).queryExecution.executedPlan
    def scans(p: SparkPlan): Int = collectWithSubqueries(p) {
      case s if s.nodeName.contains("Scan") => s
    }.size
    // one Expand-based multi-distinct aggregate over ONE scan of the input
    assert(scans(plan) == 1, s"expected a single input scan, got:\n$plan")
  }
}
