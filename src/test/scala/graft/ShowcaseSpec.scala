package graft

import org.apache.spark.sql.functions._

import graft.functions.{Functions, KeepLast, PhoneCountryUdf}
import graft.ops.Relational

/** The two deliberate extension-surface showcases: the typed Aggregator
  * (keep-last) and the Scala UDF (phone country), each asserted against
  * its production-path equivalent.
  */
class ShowcaseSpec extends SparkSpec {
  import spark.implicits._

  test("KeepLast aggregator matches the window-function dedup") {
    val df = Seq(
      ("k1", 1L, "a"), ("k1", 3L, "c"), ("k1", 2L, "b"),
      ("k2", 10L, "x"), ("k3", 5L, "only")
    ).toDF("pk", "ord", "payload")

    val viaAgg = df.groupBy("pk")
      .agg(KeepLast.keepLast(col("ord"), col("payload")).as("payload"))
    val viaWindow = Relational
      .dedupKeepLast(df, Seq("pk"), Seq(col("ord")))
      .select("pk", "payload")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
    assert(viaAgg.filter(col("pk") === "k1")
      .collect()(0).getString(1) == "c")
  }

  test("KeepLast aggregator survives repartitioned partial aggregation") {
    val big = spark.range(0, 1000)
      .select((col("id") % 7).as("pk"), col("id").as("ord"),
        concat(lit("v"), col("id")).as("payload"))
      .repartition(13)
    val got = big.groupBy("pk")
      .agg(KeepLast.keepLast(col("ord"), col("payload")).as("payload"))
      .orderBy("pk").collect()
    // max ordinal for pk p is the largest id < 1000 with id % 7 == p
    got.foreach { r =>
      val pk = r.getLong(0)
      val maxId = (0L until 1000L).filter(_ % 7 == pk).max
      assert(r.getString(1) == s"v$maxId")
    }
  }

  test("phoneCountry UDF agrees with the Column-expression form") {
    val phones = Seq("+51 987 654 321", "+52 155 5555 5555", "549 11 5555",
      "56 9 8765 4321", "+1 305 555 0100", "999999", "", null)
      .toDF("phone")
    val both = phones.select(
      PhoneCountryUdf.phoneCountry(col("phone")).as("via_udf"),
      Functions.phoneCountry(col("phone")).as("via_expr"))
    val diff = both.filter(
      not(col("via_udf") <=> col("via_expr"))).count()
    assert(diff == 0)
  }
}
