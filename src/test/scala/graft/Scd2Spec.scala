package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim(rows: Seq[(Long, String, Long, Option[Long])]) =
    rows.toDF("k", "attr", "valid_from", "valid_to")

  private val initial = Seq(1L, 2L).map(k => (k, s"v$k", 0L, None: Option[Long]))

  test("merge closes changed rows, opens new keys, keeps the rest") {
    val inc = Seq((1L, "v1"), (2L, "CHANGED"), (3L, "v3")).toDF("k", "attr")
    val got = Scd2.merge(dim(initial), inc, Seq("k"), Seq("attr"), version = 1L)
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, "v1", 0L, None), // unchanged, stays open
      (2L, "v2", 0L, Some(1L)), // closed at version 1
      (2L, "CHANGED", 1L, None), // reopened with new attr
      (3L, "v3", 1L, None))) // brand-new key
  }

  test("re-merging the same snapshot is a no-op on the open slice") {
    val inc = Seq((1L, "v1"), (2L, "CHANGED"), (3L, "v3")).toDF("k", "attr")
    val v1 = Scd2.merge(dim(initial), inc, Seq("k"), Seq("attr"), 1L)
    val v2 = Scd2.merge(v1, inc, Seq("k"), Seq("attr"), 2L)
    assert(v2.count() == v1.count())
    assert(v2.filter(col("valid_to") === 2L).count() == 0)
  }

  test("missing keys in the snapshot do NOT close open rows") {
    val inc = Seq((1L, "other")).toDF("k", "attr")
    val got = Scd2.merge(dim(initial), inc, Seq("k"), Seq("attr"), 1L)
    // key 2 absent from the snapshot: its open row survives untouched
    assert(got.filter(col("k") === 2L && col("valid_to").isNull &&
      col("attr") === "v2").count() == 1)
  }

  test("null-safe attribute comparison: null == null is unchanged") {
    val cur = Seq((1L, Option.empty[String], 0L, Option.empty[Long]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val inc = Seq((1L, Option.empty[String])).toDF("k", "attr")
    val got = Scd2.merge(cur, inc, Seq("k"), Seq("attr"), 1L)
    assert(got.count() == 1 && got.filter(col("valid_to").isNull).count() == 1)
  }

  test("duplicate business keys in a snapshot dedupe keep-last") {
    val inc = Seq((1L, "first"), (1L, "second")).toDF("k", "attr")
    val got = Scd2.merge(dim(initial), inc, Seq("k"), Seq("attr"), 1L)
    val open1 = got.filter(col("k") === 1L && col("valid_to").isNull)
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(open1 == Seq((1L, "second", 1L, None))) // one open row, last wins
    assert(got.filter(col("k") === 1L).count() == 2) // closed v1 + open
  }

  test("untracked attribute columns are rejected, not silently dropped") {
    val cur = Seq((1L, "a", "Lima", 0L, Option.empty[Long]))
      .toDF("k", "attr", "city", "valid_from", "valid_to")
    val inc = Seq((1L, "a")).toDF("k", "attr")
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(cur, inc, Seq("k"), Seq("attr"), 1L)
    }
    assert(e.getMessage.contains("city"))
  }

  test("closed history is preserved verbatim across merges") {
    val inc1 = Seq((1L, "A")).toDF("k", "attr")
    val inc2 = Seq((1L, "B")).toDF("k", "attr")
    val v1 = Scd2.merge(dim(initial), inc1, Seq("k"), Seq("attr"), 1L)
    val v2 = Scd2.merge(v1, inc2, Seq("k"), Seq("attr"), 2L)
    val hist1 = v2.filter(col("k") === 1L)
      .orderBy("valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(hist1 == Seq(
      (1L, "v1", 0L, Some(1L)), (1L, "A", 1L, Some(2L)), (1L, "B", 2L, None)))
  }
}
