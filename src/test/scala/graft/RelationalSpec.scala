package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Relational._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepLast keeps the row with max order columns per key") {
    val df = Seq(
      ("A", 1, "old"), ("A", 2, "new"), ("B", 5, "only")).toDF("k", "ord", "v")
    val got = dedupKeepLast(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").collect()
    assert(got.map(_.getString(2)).toSeq == Seq("new", "only"))
  }

  test("dedup is idempotent") {
    val df = Seq(("A", 1), ("A", 2), ("B", 1)).toDF("k", "ord")
    val once = dedupKeepLast(df, Seq("k"), Seq(col("ord")))
    val twice = dedupKeepLast(once, Seq("k"), Seq(col("ord")))
    assert(once.count() == twice.count())
  }

  test("semiJoin subset + antiJoin complement partition the left side") {
    val left = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val right = Seq((1, "x"), (3, "y")).toDF("k", "w")
    val semi = semiJoin(left, right, Seq("k"))
    val anti = antiJoin(left, right, Seq("k"))
    assert(semi.count() + anti.count() == left.count())
    assert(semi.columns.toSeq == left.columns.toSeq) // no right cols attached
    assert(anti.select("k").as[Int].collect().toSeq == Seq(2))
  }

  test("requireNonNull splits into good/quarantine") {
    val df = Seq((1, Some("x")), (2, None), (3, Some("z")))
      .toDF("k", "req")
    val (good, bad) = requireNonNull(df, Seq("req"))
    assert(good.count() == 2 && bad.count() == 1)
    assert(bad.select("k").as[Int].head() == 2)
  }

  test("unionByNameSafe fills missing columns with null") {
    val a = Seq((1, "x")).toDF("k", "only_a")
    val b = Seq((2, 9.5)).toDF("k", "only_b")
    val u = unionByNameSafe(a, b).orderBy("k")
    assert(u.columns.sorted.toSeq == Seq("k", "only_a", "only_b"))
    val rows = u.collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 9.5)
  }

  test("dropDuplicateColumns keeps first occurrence (N6)") {
    val df = Seq((1, "a", 2.0)).toDF("k", "v", "k2")
      .toDF("k", "v", "k") // force duplicate name positionally
    val got = dropDuplicateColumns(df)
    assert(got.columns.toSeq == Seq("k", "v"))
    assert(got.head().getInt(0) == 1)
  }

  test("ensureColumn synthesizes missing all-null column (N7)") {
    val df = Seq((1, "a")).toDF("k", "v")
    val got = ensureColumn(df, "fecha_pago", StringType)
    assert(got.columns.contains("fecha_pago") && got.head().isNullAt(2))
    // no-op when present
    assert(ensureColumn(got, "fecha_pago", StringType).columns.length == 3)
  }

  test("renameNormalized dedupes colliding normalized names (N1+N5)") {
    val df = Seq((1, 2, 3)).toDF("Fecha de Pago", "FECHA__DE__PAGO", "ok")
    val got = renameNormalized(df, graft.functions.Functions.normalizeName)
    assert(got.columns.toSeq == Seq("fecha_de_pago", "fecha_de_pago_1", "ok"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import graft.ops.Relational.snapshotDiff
    val v1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "es"))
      .toDF("doc_id", "text", "lang")
    val v2 = Seq((2L, "b", "en"), (3L, "c CHANGED", "es"), (4L, "d", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = snapshotDiff(v1, v2, "doc_id", Seq("text", "lang"))
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
    // separator unambiguity: ("ab","c") must differ from ("a","bc")
    val x = Seq((1L, "ab", "c")).toDF("doc_id", "text", "lang")
    val y = Seq((1L, "a", "bc")).toDF("doc_id", "text", "lang")
    assert(snapshotDiff(x, y, "doc_id", Seq("text", "lang"))
      .select("status").head.getString(0) == "changed")
    // NULLs hash distinctly: ('x', NULL) vs (NULL, 'x') is a CHANGE
    // (concat_ws alone skips nulls and would collide them), and a
    // null column surviving unchanged is still 'unchanged'
    val n1 = Seq((1L, Some("x"), None: Option[String]),
      (2L, Some("x"), None: Option[String]))
      .toDF("doc_id", "text", "lang")
    val n2 = Seq((1L, None: Option[String], Some("x")),
      (2L, Some("x"), None: Option[String]))
      .toDF("doc_id", "text", "lang")
    val ngot = snapshotDiff(n1, n2, "doc_id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(ngot == Map(1L -> "changed", 2L -> "unchanged"))
  }
}
