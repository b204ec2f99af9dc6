package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.etl.{EtlPaths, Load, Pipeline, Transform}

/** Faithful four-table pipeline over sheet-shaped CSV fixtures
  * (FIXTURES.md §A, SURVEY.md §7.3 M3): golden-output assertions for
  * every reference behavior the flow exercises — positional headers,
  * keep-last dedup, lenient dates, phone country, account map, derived
  * currency, W1/W2 filters, J1/J2 semi-joins (incl. the skip-if-empty
  * quirk), J4/J5 FK quarantine, W3 required-column quarantine, K2
  * upsert.
  */
class EtlPipelineSpec extends SparkSpec {

  private def write(path: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), String.join("\n", lines: _*).getBytes("UTF-8"))
  }

  private val root = Files.createTempDirectory("graft_etl").toString

  private def fixtures(): EtlPaths = fixtures(root)

  private def fixtures(root: String): EtlPaths = {
    write(s"$root/raw_cursos.csv", Seq(
      "REGISTRO DE CURSOS 2026,,,,,,",
      "CÓDIGO_C,NOMBRE_C,I1,FECHA DE INICIO,FECHA DE TERMINO,PROFESOR,HORARIOS",
      "P101,Diseño Estructural I,3,15/3/2026,20/6/2026,T07 María Quispe,Lun-Mie 19:00",
      "P102,Concreto Armado,2,bad-date,,T08 Luis Vega,Mar-Jue 18:00",
      "P101,Diseño Estructural I v2,3,16/3/2026,20/6/2026,T07 María Quispe,Lun-Mie 19:00"))
    write(s"$root/raw_estudiantes.csv", Seq(
      "REGISTRO DE ESTUDIANTES,,,,,,,",
      "CODIGO_E,NOMBRES_E,APELLIDOS_E,CORREO_E,NUMERO_E,GÉNERO_E,RED DE CONTACTO_E,GRADO DE INSTRUCCIÓN_E",
      "E001,\"  juan carlos \",\"pérez rojas\",\" Juan.Perez@Mail.COM \",+51 987 654 321,Masculino,Facebook,Universitario",
      "E002,maria,lópez,M@X.com,+52 155 5555 5555,Femenino,Instagram,Secundaria",
      "E003,ana,díaz,a@b.co,999999,Femenino,Facebook,Universitario"))
    write(s"$root/raw_matriculas.csv", Seq(
      "MATRICULAS,,,,,,,,,,,",
      ",,,,,,,,,,,",
      "Marca temporal,Código de matrícula,Cursos de matrícula,num cursos," +
        "Fecha de pago de la primera cuota,Condición del alumno," +
        "Código de estudiante FINAL,Monto de Pago,Primera Cuota,Método de Pago," +
        "Moneda,Encargado de Registro",
      "11/8/2026 14:32:05,M-001,P101 Diseño Estructural,2,10/8/2026,Regular,E001,350.50,150.00,YAPE,PEN,A. Torres",
      "11/8/2026 09:00:00,M-002,Taller libre,1,10/8/2026,Regular,E002,100,50,banco de la nación,PEN,A. Torres",
      "10/8/2026 10:00:00,M-003,P102 Concreto,1,9/8/2026,Regular,E001,200,80,BCP,PEN,A. Torres",
      "11/8/2026 11:00:00,M-004,P102 Concreto,1,10/8/2026,Becado,E999,abc,60,Efectivo Tienda,PEN,B. Ramos",
      "11/8/2026 12:00:00,M-001,P101 Diseño Estructural,2,10/8/2026,Regular,E001,360.00,150.00,YAPE,PEN,A. Torres"))
    write(s"$root/raw_pagos.csv", Seq(
      "PAGOS REGULARES,,,,,",
      ",,,,,",
      ",,,,,",
      ",,,,,",
      ",,,,,",
      // header variant "fecha de pago" exercises the N3 canonical rename
      "Marca temporal,Código de matrícula,Monto de Pago,Método de Pago,fecha de pago,Encargado de Registro",
      // exact-cased "Banco de México": the reference's currency_fixed
      // matches raw cell values literally (etl/transform.py:246-249), so
      // only this casing yields MXN — an uppercase cell would be PEN
      "11/8/2026 09:10:00,M-001,175.25,Banco de México,11/8/2026,B. Ramos",
      "11/8/2026 10:00:00,M-001,80.00,PAYPAL,11/8/2026,B. Ramos",
      "11/8/2026 10:30:00,M-009,50.00,BANCO DE CHILE,11/8/2026,B. Ramos",
      "11/8/2026 11:00:00,M-001,60.00,Efectivo Tienda,,B. Ramos",
      "10/8/2026 09:00:00,M-001,99.00,BCP,10/8/2026,B. Ramos"))
    EtlPaths(
      rawCursos = s"$root/raw_cursos.csv",
      rawEstudiantes = s"$root/raw_estudiantes.csv",
      rawMatriculas = s"$root/raw_matriculas.csv",
      rawPagos = s"$root/raw_pagos.csv",
      warehouseDir = s"$root/warehouse",
      quarantineDir = s"$root/quarantine")
  }

  private lazy val summary = Pipeline.run(spark, fixtures(), LocalDate.of(2026, 8, 11))

  test("cursos: keep-last dedup, lenient date, teacher-code extract") {
    assert(summary.cursos == 2)
    val rows = spark.read.parquet(s"$root/warehouse/cursos")
      .orderBy("codigo_curso").collect()
    val p101 = rows(0)
    assert(p101.getAs[String]("codigo_curso") == "P101")
    assert(p101.getAs[String]("nombre_curso") == "Diseño Estructural I v2")
    assert(p101.getAs[String]("fecha_inicio") == "2026-03-16")
    assert(p101.getAs[String]("codigo_profesor") == "T07")
    assert(p101.getAs[Int]("numero_modulo") == 3)
    assert(rows(1).getAs[String]("fecha_inicio") == null) // bad-date → null
  }

  test("estudiantes: strip/title/lower + phone-prefix country") {
    val byId = spark.read.parquet(s"$root/warehouse/estudiantes")
      .collect().map(r => r.getAs[String]("codigo_estudiante") -> r).toMap
    assert(byId("E001").getAs[String]("nombres") == "Juan Carlos")
    assert(byId("E001").getAs[String]("correo") == "juan.perez@mail.com")
    assert(byId("E001").getAs[String]("pais") == "Perú")
    assert(byId("E002").getAs[String]("pais") == "México")
    assert(byId("E003").getAs[String]("pais") == "Desconocido")
  }

  test("matriculas: date filter, P-filter, keep-last, FK quarantine") {
    val rows = spark.read.parquet(s"$root/warehouse/matriculas").collect()
    assert(rows.length == 1)
    val m = rows(0)
    assert(m.getAs[String]("codigo_matricula") == "M-001")
    assert(m.getAs[String]("codigo_curso") == "P101")
    assert(m.getAs[Int]("num_cursos") == 2)
    assert(m.getAs[String]("fecha_matricula") == "2026-08-10")
    assert(m.getAs[Double]("valor_matricula") == 360.0) // keep-last wins
    // M-004 referenced missing student E999 → quarantined
    val fkQ = spark.read.option("header", "true")
      .csv(s"$root/quarantine/matriculas_fk").collect()
    assert(fkQ.map(_.getAs[String]("codigo_matricula")).toSeq == Seq("M-004"))
  }

  test("pagos: two branches unioned, currency map, W3+J2 drops") {
    val rows = spark.read.parquet(s"$root/warehouse/pagos").collect()
    assert(rows.length == 4)
    assert(summary.pagos == 4)
    val monedas = rows.map(_.getAs[String]("moneda")).sorted.toSeq
    assert(monedas == Seq("MXN", "PEN", "PEN", "USD"))
    val metodos = rows.map(_.getAs[String]("metodo_pago")).toSet
    assert(metodos == Set("Yape", "Banco de México", "Paypal"))
    assert(math.abs(rows.map(_.getAs[Double]("monto_pago")).sum - 555.25) < 1e-9)
    // R4 (null fecha_pago) quarantined by W3
    val nullQ = spark.read.option("header", "true")
      .csv(s"$root/quarantine/pagos_nulls").collect()
    assert(nullQ.length == 1 && nullQ(0).getAs[String]("monto_pago") == "60.0")
    // R3 (orphan M-009) was dropped by the J2 semi-join, never reaching
    // the FK quarantine
    assert(rows.forall(_.getAs[String]("codigo_matricula") == "M-001"))
  }

  test("two-day incremental runs accumulate without dup-PK conflicts") {
    // the reference's actual operating mode: one run per day against
    // the same warehouse - master data upserts stay idempotent,
    // transactional inserts accumulate day by day
    val r2 = Files.createTempDirectory("graft_etl2").toString
    val paths = fixtures(r2)
    val day1 = Pipeline.run(spark, paths, LocalDate.of(2026, 8, 10))
    assert(day1.matriculas == 1) // M-003 (the 10/8 row)
    assert(day1.pagos == 1)      // its first installment; orphan R5 dropped
    val day2 = Pipeline.run(spark, paths, LocalDate.of(2026, 8, 11))
    assert(day2.cursos == 2 && day2.estudiantes == 3) // upserts: no growth
    assert(day2.matriculas == 1) // M-001, disjoint PK -> insert succeeds
    assert(day2.pagos == 4)
    assert(spark.read.parquet(s"$r2/warehouse/matriculas").count() == 2)
    assert(spark.read.parquet(s"$r2/warehouse/pagos").count() == 5)
  }

  test("upsert: incoming row replaces existing on PK match") {
    summary // ensure pipeline ran
    val updated = Transform.cursos(
      graft.etl.Extract.readSheet(spark, s"$root/raw_cursos.csv", headerRow = 2))
      .withColumn("nombre_curso",
        when(col("codigo_curso") === "P101", lit("RENAMED"))
          .otherwise(col("nombre_curso")))
    val n = Load.upsert(spark, updated, s"$root/warehouse/cursos", "codigo_curso")
    assert(n == 2) // merged, not appended
    val name = spark.read.parquet(s"$root/warehouse/cursos")
      .filter(col("codigo_curso") === "P101")
      .select("nombre_curso").collect()(0).getString(0)
    assert(name == "RENAMED")
  }
}
