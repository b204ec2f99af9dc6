package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Load

/** Load sink error paths and edge semantics beyond the happy-path
  * pipeline run: duplicate-PK abort (J3), first-write upsert, repeated
  * idempotent upsert, FK quarantine contents.
  */
class LoadSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString + "/t"

  test("insert aborts on duplicate PK against existing data (J3)") {
    val dir = tmp("ins")
    val a = Seq(("k1", 1), ("k2", 2)).toDF("pk", "v")
    assert(Load.insert(spark, a, dir, pk = Some("pk")) == 2)
    // overlapping PK -> abort BEFORE writing anything
    val b = Seq(("k2", 9), ("k3", 3)).toDF("pk", "v")
    val e = intercept[IllegalStateException] {
      Load.insert(spark, b, dir, pk = Some("pk"))
    }
    assert(e.getMessage.contains("duplicate existing PK"))
    assert(spark.read.parquet(dir).count() == 2) // target untouched
    // disjoint PKs -> appends
    val c = Seq(("k3", 3)).toDF("pk", "v")
    assert(Load.insert(spark, c, dir, pk = Some("pk")) == 1)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("upsert bootstraps an absent table and is idempotent") {
    val dir = tmp("ups")
    val a = Seq(("k1", "v1"), ("k2", "v2")).toDF("pk", "v")
    assert(Load.upsert(spark, a, dir, "pk") == 2) // first write = insert
    assert(Load.upsert(spark, a, dir, "pk") == 2) // replay = no growth
    val b = Seq(("k2", "v2b"), ("k3", "v3")).toDF("pk", "v")
    assert(Load.upsert(spark, b, dir, "pk") == 3)
    val got = spark.read.parquet(dir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("k1" -> "v1", "k2" -> "v2b", "k3" -> "v3"))
  }

  test("enforceFk quarantines exactly the orphans, keeps the rest") {
    val q = Files.createTempDirectory("fkq").toString + "/orphans"
    val facts = Seq(("k1", 10), ("kX", 20), ("k2", 30), ("kY", 40))
      .toDF("fk", "v")
    val dim = Seq("k1", "k2", "k3").toDF("fk")
    val kept = Load.enforceFk(facts, dim, "fk", q)
    assert(kept.select("fk").as[String].collect().sorted.toSeq == Seq("k1", "k2"))
    val quarantined = spark.read.option("header", "true").csv(q)
      .select("fk").as[String].collect().sorted.toSeq
    assert(quarantined == Seq("kX", "kY"))
  }
}
