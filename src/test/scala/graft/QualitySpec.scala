package graft

import org.apache.spark.sql.functions._

import graft.ops.Quality
import graft.ops.Quality.{InRange, Matches, NotNull, Unique}

/** Quality.check: rule semantics including FAILING rules (the catalog
  * query q108 exercises a mostly-green report; the gate only earns its
  * keep if violations actually trip it).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, Option[Double], Option[String])],
                     rules: Seq[Quality.Rule]) = {
    val df = rows.toDF("k", "v", "s")
    Quality.check(df, rules).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
  }

  test("all four rule kinds: metrics and pass/fail boundaries") {
    val rows = Seq(
      ("a", Some(1.0), Some("x1")),
      ("a", Some(5.0), Some("x2")),   // dup key "a"
      ("b", None, Some("zz")),        // null v, non-matching s
      ("c", Some(50.0), None))        // out-of-range v, null s
    val got = report(rows, Seq(
      NotNull("v", maxNullFrac = 0.3),   // 1/4 null -> pass
      NotNull("s"),                      // 1/4 null -> fail at 0.0
      Unique(Seq("k")),                  // one dup -> fail, metric 1
      InRange("v", 0, 10, minFrac = 0.5), // 2/3 non-null in range -> pass
      Matches("s", "^x[0-9]$", minFrac = 0.7))) // 2/3 match -> fail
    assert(got("not_null:v") == ((0.25, true)))
    assert(got("not_null:s") == ((0.25, false)))
    assert(got("unique:k") == ((1.0, false)))
    assert(got("in_range:v")._2 && math.abs(got("in_range:v")._1 - 2.0 / 3) < 1e-15)
    assert(!got("matches:s")._2 && math.abs(got("matches:s")._1 - 2.0 / 3) < 1e-15)
  }

  test("degenerate inputs: empty table and all-null column") {
    val empty = Seq.empty[(String, Option[Double], Option[String])]
      .toDF("k", "v", "s")
    val repEmpty = Quality.check(empty, Seq(
      NotNull("v"), Unique(Seq("k")), InRange("v", 0, 1), Matches("s", "x")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    // empty table: no nulls, no dups, fraction rules vacuously pass
    assert(repEmpty.values.forall(_._2))
    assert(repEmpty("not_null:v")._1 == 0.0)
    assert(repEmpty("in_range:v")._1 == 1.0)

    val allNull = Seq(("a", None: Option[Double], None: Option[String]),
      ("b", None, None)).toDF("k", "v", "s")
    val repNull = Quality.check(allNull, Seq(
      NotNull("v"), InRange("v", 0, 1), Matches("s", "x")))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(repNull("not_null:v") == ((1.0, false)))   // 100% null fails
    assert(repNull("in_range:v") == ((1.0, true)))    // vacuous over 0 values
    assert(repNull("matches:s") == ((1.0, true)))
  }

  test("unique over a composite key; clean table passes everything") {
    val df = Seq((1, "a"), (1, "b"), (2, "a")).toDF("x", "y")
    val rep = Quality.check(df, Seq(Unique(Seq("x", "y")), Unique(Seq("x"))))
      .collect().map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(rep("unique:x,y"))     // composite is unique
    assert(!rep("unique:x"))      // x alone is not
  }

  test("duplicate rules on one column disambiguate instead of colliding") {
    // a legitimate layered rule set: strict range at low minFrac plus a
    // loose range at 1.0 — same base name, must yield two report rows
    val df = Seq(1.0, 5.0, 9.0, 50.0).toDF("v")
    val rep = Quality.check(df, Seq(
      InRange("v", 0, 10, minFrac = 0.7),
      InRange("v", 0, 100, minFrac = 1.0),
      Unique(Seq("v")),
      Unique(Seq("v"))))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap
    assert(rep("in_range:v") == ((0.75, true)))     // 3/4 inside [0,10]
    assert(rep("in_range:v#2") == ((1.0, true)))    // all inside [0,100]
    assert(rep("unique:v") == rep("unique:v#2"))    // same rule, both rows
    assert(rep.size == 4)
  }
}
