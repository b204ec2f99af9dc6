package graft

import graft.tools.PlanAudit

/** The plan-regression gate inside the test suite: every catalog query
  * must plan, contain no CartesianProduct, and not exceed its recorded
  * exchange count (tools/plan_exchanges.allow) — a change that adds an
  * avoidable shuffle to an existing query fails CI here instead of
  * passing silently. Re-baseline after an INTENTIONAL plan change with
  * `sbt "runMain graft.tools.PlanAudit /root/testdata/sf0.001 --record"`
  * and review the diff.
  */
class PlanAuditSpec extends SparkSpec {

  test("the gate fires on exceed, cartesian, plan failure, and missing entry") {
    import PlanAudit.Result
    val rs = Seq(
      Result("a", 3, "", cartesian = false, None), // 3 > allowed 2
      Result("b", 2, "", cartesian = true, None),
      Result("c", -1, "", cartesian = false, Some("boom")),
      Result("d", 1, "", cartesian = false, None)) // within allowance
    val v = PlanAudit.violations(rs, Map("a" -> 2, "b" -> 5, "c" -> 9, "d" -> 1))
    assert(v.exists(_.contains("3 exchanges > recorded 2")))
    assert(v.exists(_.contains("CARTESIAN")))
    assert(v.exists(_.contains("FAILED TO PLAN")))
    assert(!v.exists(_.startsWith("d:")) && v.size == 3)
    // a query absent from a non-empty allowlist is itself a violation
    assert(PlanAudit.violations(
      Seq(Result("x", 0, "", cartesian = false, None)), Map("y" -> 1))
      .exists(_.contains("not in")))
  }

  test("no catalog query exceeds its recorded exchange count") {
    val results = PlanAudit.audit(spark, sfDir)
    val allowed = PlanAudit.allowlist().getOrElse("sf0.001", Map.empty)
    assert(allowed.nonEmpty,
      s"${PlanAudit.AllowFile} has no sf0.001 section — record it")
    val bad = PlanAudit.violations(results, allowed)
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }
}
