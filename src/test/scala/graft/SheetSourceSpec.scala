package graft

import org.apache.spark.sql.functions._

import graft.etl.Extract

/** The graft.sheet DataSourceV2 against Extract.readSheet (same
  * semantics, same fixtures) and its column-pruning pushdown.
  */
class SheetSourceSpec extends SparkSpec {

  private val fixtures = graft.queries.PipelineQueries.FixtureDir
  private val headerRows = Seq(
    ("raw_cursos.csv", 2), ("raw_estudiantes.csv", 2),
    ("raw_matriculas.csv", 3), ("raw_pagos.csv", 6))

  test("source matches Extract.readSheet on every fixture") {
    headerRows.foreach { case (f, h) =>
      val viaSource = spark.read.format("graft.sheet")
        .option("headerRow", h).load(s"$fixtures/$f")
      val viaExtract = Extract.readSheet(spark, s"$fixtures/$f", h)
      assert(viaSource.schema == viaExtract.schema, s"$f schema")
      assert(viaSource.exceptAll(viaExtract).isEmpty &&
        viaExtract.exceptAll(viaSource).isEmpty, s"$f rows")
    }
  }

  test("header row sizes the schema even after a short title row") {
    val dir = java.nio.file.Files.createTempDirectory("sheet_src")
    val p = dir.resolve("short_title.csv")
    java.nio.file.Files.writeString(p,
      "TITLE\na,b,c\n1,2,3\n,,\n4,,6\n")
    val df = spark.read.format("graft.sheet")
      .option("headerRow", 2).load(p.toString)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    // the ,,  row is fully empty -> dropped; empty cell -> null
    assert(df.count() == 2)
    assert(df.filter(col("b").isNull).count() == 1)
  }

  test("column pruning reaches the scan") {
    val p = s"$fixtures/raw_matriculas.csv"
    val df = spark.read.format("graft.sheet")
      .option("headerRow", 3).load(p)
      .select(col("Código de matrícula"))
    val scan = df.queryExecution.executedPlan.toString
    // SheetScan.description advertises kept/total column counts
    assert(scan.contains("cols=1/12"), s"expected pruned scan in:\n$scan")
    assert(df.count() > 0)
  }

  test("usable from SQL DDL (CREATE TEMP VIEW ... USING graft.sheet)") {
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW sheet_cursos
      USING `graft.sheet`
      OPTIONS (path '$fixtures/raw_cursos.csv', headerRow '2')""")
    val out = spark.sql(
      "SELECT `CÓDIGO_C` FROM sheet_cursos ORDER BY `CÓDIGO_C`")
    assert(out.collect().map(_.getString(0)).toSeq ==
      Seq("P101", "P101", "P102"))
  }

  test("inferNumeric types columns like readSheet(inferNumeric=true)") {
    headerRows.foreach { case (f, h) =>
      val viaSource = spark.read.format("graft.sheet")
        .option("headerRow", h).option("inferNumeric", true)
        .load(s"$fixtures/$f")
      val viaExtract = Extract.readSheet(spark, s"$fixtures/$f", h,
        inferNumeric = true)
      assert(viaSource.schema == viaExtract.schema, s"$f schema")
      assert(viaSource.exceptAll(viaExtract).isEmpty &&
        viaExtract.exceptAll(viaSource).isEmpty, s"$f rows")
    }
  }

  test("quoted empty cells match the Spark CSV reader's semantics") {
    val dir = java.nio.file.Files.createTempDirectory("sheet_src3")
    val p = dir.resolve("quoted.csv")
    // row 1: quoted empties (present empty strings); row 2: unquoted
    // empties (missing); row 3: mixed
    java.nio.file.Files.writeString(p,
      "a,b\n\"\",\"\"\n,\ny,\"\"\n")
    val viaSource = spark.read.format("graft.sheet").load(p.toString)
    val viaExtract = Extract.readSheet(spark, p.toString, 1)
    assert(viaSource.schema == viaExtract.schema)
    assert(viaSource.exceptAll(viaExtract).isEmpty &&
      viaExtract.exceptAll(viaSource).isEmpty,
      s"source=${viaSource.collect().toSeq} extract=${viaExtract.collect().toSeq}")
  }

  test("inferNumeric LONG overflow falls back to null like a cast") {
    val dir = java.nio.file.Files.createTempDirectory("sheet_src4")
    val p = dir.resolve("big.csv")
    java.nio.file.Files.writeString(p,
      "id\n42\n99999999999999999999\n")
    val df = spark.read.format("graft.sheet")
      .option("inferNumeric", true).load(p.toString)
    assert(df.schema.head.dataType ==
      org.apache.spark.sql.types.LongType)
    assert(df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet ==
      Set(Some(42L), None))
  }

  test("duplicate and empty headers are renamed like readSheet") {
    val dir = java.nio.file.Files.createTempDirectory("sheet_src2")
    val p = dir.resolve("dups.csv")
    java.nio.file.Files.writeString(p, "x, x ,,y\n1,2,3,4\n")
    val df = spark.read.format("graft.sheet").load(p.toString)
    assert(df.columns.toSeq == Seq("x", "x_1", "col_2", "y"))
  }

  test("a generated dedup suffix never collides with a later header") {
    val dir = java.nio.file.Files.createTempDirectory("sheet_src3")
    val p = dir.resolve("collide.csv")
    // ['a','a','a_1']: suffixing the second 'a' to 'a_1' would duplicate
    // the literal third header — must probe past it to 'a_2'
    java.nio.file.Files.writeString(p, "a,a,a_1\n1,2,3\n")
    val df = spark.read.format("graft.sheet").load(p.toString)
    assert(df.columns.toSeq == Seq("a", "a_2", "a_1"))
    assert(df.columns.distinct.length == 3)
  }

  test("blank pre-header lines do not shift data rows (both paths)") {
    val dir = java.nio.file.Files.createTempDirectory("sheet_src4")
    val p = dir.resolve("blank_filler.csv")
    // line 2 is TRULY empty (not ',,'): Spark's CSV reader drops such
    // lines, which previously desynchronized readSheet's text-scan
    // header index from its CSV-parsed data rows — losing data row 1
    java.nio.file.Files.writeString(p, "TITLE\n\na,b\n1,x\n2,y\n")
    val viaExtract = graft.etl.Extract.readSheet(spark, p.toString, headerRow = 3)
    val viaSource = spark.read.format("graft.sheet")
      .option("headerRow", 3).load(p.toString)
    for (df <- Seq(viaExtract, viaSource)) {
      assert(df.columns.toSeq == Seq("a", "b"))
      assert(df.orderBy("a").collect().map(_.getString(0)).toSeq ==
        Seq("1", "2"), s"lost or shifted data rows:\n${df.collect().toSeq}")
    }
  }
}
