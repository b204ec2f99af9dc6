package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.Functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("phoneCountry follows the reference prefix table order") {
    val cases = Seq(
      "+54 9 11 2345 6789" -> "Argentina", // 549 before 54
      "+56 9 8765 4321" -> "Chile",
      "+51 987 654 321" -> "Perú",
      "57 300 123 4567" -> "Colombia",
      "593-99-123-4567" -> "Ecuador",
      "591 7 123 4567" -> "Bolivia",
      "507 6123-4567" -> "Panamá",
      "+52 1 55 1234 5678" -> "México", // 521
      "52 55 1234 5678" -> "México",
      "+55 11 91234-5678" -> "Brasil",
      "+1 (305) 555-0100" -> "Estados Unidos / Puerto Rico", // 11 digits
      "1305555010" -> "Desconocido", // 10 digits starting 1: US rule needs 11
      "+39 06 1234 567" -> "Italia",
      "+34 612 34 56 78" -> "España",
      "+33 6 12 34 56 78" -> "Francia",
      "+49 30 123456" -> "Alemania",
      "99 1234" -> "Desconocido",
      "" -> "Desconocido")
    val df = cases.toDF("num", "want")
      .withColumn("got", phoneCountry(col("num")))
    val bad = df.filter(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, bad.mkString("; "))
    // null input
    val r = Seq((Option.empty[String], "x")).toDF("num", "d")
      .select(phoneCountry(col("num"))).head()
    assert(r.getString(0) == "Desconocido")
  }

  test("phoneInfo returns struct with code and e164") {
    val r = Seq("+51 987-654-321").toDF("num")
      .select(phoneInfo(col("num")).as("i")).select("i.*").head()
    assert(r.getString(0) == "Perú")
    assert(r.getString(1) == "51")
    assert(r.getString(2) == "+51987654321")
    // unknown prefix keeps e164, null code
    val u = Seq("990 123").toDF("num")
      .select(phoneInfo(col("num")).as("i")).select("i.*").head()
    assert(u.getString(0) == "Desconocido" && u.isNullAt(1) && u.getString(2) == "+990123")
  }

  test("accountNormalize: map hit, case-fold hit, miss→initcap, falsy→null") {
    val df = Seq("YAPE", "  bcp ", "efectivo tienda", "", "BANCO DE MÉXICO / P")
      .toDF("m").select(accountNormalize(col("m"), AccountMapRegular).as("v"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("Yape"), Some("BCP"), Some("Efectivo Tienda"), None,
        Some("Banco de México")))
  }

  test("currencyForMethod matches raw-value quirk semantics") {
    val df = Seq("Banco de México", "PAYPAL", "Banco de Chile", "Yape",
      "BANCO DE CHILE", "Banco de Ecuador / P").toDF("m")
      .select(currencyForMethod(col("m")).as("c"))
    // note: raw "BANCO DE CHILE" → PEN (reference applies rule to raw value)
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("MXN", "USD", "CLP", "PEN", "PEN", "MXN"))
  }

  test("lenientDate: day-first ladder, unparseable → null") {
    val df = Seq("15/3/2026", "11/8/2026 14:32:05", "2026-08-11", "31/2/2026", "zzz")
      .toDF("s").select(isoDate(lenientDate(col("s"))).as("d"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("2026-03-15"), Some("2026-08-11"), Some("2026-08-11"), None, None))
  }

  test("courseCode + numCursosFixed conditional semantics") {
    val df = Seq(
      ("P101 Diseño Estructural", "2"),
      ("Taller libre", "3"),
      ("  P7", "x"),
      (null, "4")).toDF("course", "n")
      .select(courseCode(col("course")).as("c"),
        numCursosFixed(col("course"), col("n")).as("k"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "P101" && rows(0).getInt(1) == 2)
    assert(rows(1).getString(0) == "Taller libre" && rows(1).getInt(1) == 0)
    assert(rows(2).getString(0) == "P7" && rows(2).getInt(1) == 0) // "x" → 0
    assert(rows(3).isNullAt(0) && rows(3).getInt(1) == 0)
  }

  test("emptyToNull and coerceMoney") {
    val df = Seq(("", "350.50"), ("  ", "abc"), ("x", null))
      .toDF("a", "b")
      .select(emptyToNull(col("a")).as("a"), coerceMoney(col("b")).as("b"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).getDouble(1) == 350.5)
    assert(rows(1).isNullAt(0) && rows(1).getDouble(1) == 0.0)
    assert(rows(2).getString(0) == "x" && rows(2).getDouble(1) == 0.0)
  }

  test("normalizeName NFKD-folds and squeezes") {
    assert(normalizeName("Fecha de pago") == "fecha_de_pago")
    assert(normalizeName("  GRADO DE INSTRUCCIÓN_E ") == "grado_de_instruccion_e")
    assert(normalizeName("Código##de--matrícula") == "codigo_de_matricula")
  }

  test("fuzzyLookup: exact then substring") {
    val cols = Seq("Fecha de Pago ", "Estado actual", "Monto")
    assert(fuzzyLookup(cols, "fecha de pago").contains("Fecha de Pago "))
    assert(fuzzyLookup(cols, "Estado").contains("Estado actual"))
    assert(fuzzyLookup(cols, "inexistente").isEmpty)
  }
}
