package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Schema-drift parquet ingestion (q113's operator): a table dir whose
  * files disagree on schema must read as the by-name union with nulls
  * for what each file lacks — and without mergeSchema Spark's
  * single-footer default must NOT silently invent that union.
  */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions drifting files by name, null-filling gaps") {
    val dir = Files.createTempDirectory("drift").toString + "/t"
    Seq((1L, "a")).toDF("id", "old_col").write.mode("overwrite").parquet(dir)
    Seq((2L, 7.5, "x")).toDF("id", "new_col", "other")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "old_col", "new_col", "other"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[String]("old_col") == "a" &&
      byId(1L).isNullAt(byId(1L).fieldIndex("new_col")) &&
      byId(1L).isNullAt(byId(1L).fieldIndex("other")))
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("old_col")) &&
      byId(2L).getAs[Double]("new_col") == 7.5 &&
      byId(2L).getAs[String]("other") == "x")

    // without mergeSchema the schema comes from one arbitrary footer —
    // never the full union (guards against assuming the default is safe)
    val plain = spark.read.parquet(dir)
    assert(plain.columns.toSet != merged.columns.toSet)
  }

  test("incompatible drift (type conflict on one column) fails loudly") {
    val dir = Files.createTempDirectory("drift_bad").toString + "/t"
    Seq((1L, 5L)).toDF("id", "v").write.mode("overwrite").parquet(dir)
    Seq((2L, "not a long")).toDF("id", "v").write.mode("append").parquet(dir)
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    assert(e.getMessage.toLowerCase.contains("merge") ||
      e.getMessage.toLowerCase.contains("incompatible"))
  }
}
