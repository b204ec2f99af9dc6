package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.functions.Functions.{fuzzyLookup, normalizeName}
import graft.ops.Relational.ensureColumn

/** Sheet-shaped CSV extraction (SURVEY.md §2.1 S2–S6 + §2.2 N1–N7):
  * positional header rows, hostile-header normalization, ragged rows,
  * empty-cell → null.
  *
  * Scale note: sheet-like inputs are small by nature (human-edited),
  * so the header row is fetched driver-side; the data rows remain a
  * distributed plan. Big data enters the engine via parquet
  * (graft.tables.Tables), not here.
  */
object Extract {

  /** S5/S2–S4: read a CSV whose header is at 1-based row `headerRow`
    * (reference sheets: row 2 / 3 / 6 — etl/extract.py:172-180,
    * 222-230, 271-279); all columns string-typed, empty cells null.
    * Headers are trimmed (N4), empty headers become `col_{i}` and
    * duplicates get a `_N` suffix (N5, etl/extract.py:49-62); fully
    * empty rows are dropped (W4, etl/extract.py:98-100).
    */
  def readSheet(spark: SparkSession, path: String, headerRow: Int): DataFrame = {
    val raw = spark.read
      .option("header", "false")
      .option("inferSchema", "false")
      .csv(path)
    // zipWithIndex preserves file/split order — the positional contract
    // "row N is the header" only exists in file order
    val n = raw.columns.length
    val indexed = raw.rdd.zipWithIndex()

    val headerVals = indexed
      .filter(_._2 == headerRow - 1)
      .map(_._1)
      .collect()
      .headOption
      .getOrElse(throw new IllegalArgumentException(
        s"$path has fewer than $headerRow rows — no header row"))

    // N4 trim + N5 unique-ify + empty header → col_{i}
    val seen = scala.collection.mutable.Map[String, Int]()
    val names = (0 until n).map { i =>
      val rawName = Option(headerVals.get(i)).map(_.toString.trim).getOrElse("")
      val base = if (rawName.isEmpty) s"col_$i" else rawName
      val k = seen.getOrElse(base, 0)
      seen(base) = k + 1
      if (k == 0) base else s"${base}_$k"
    }

    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val dataRows = indexed
      .filter(_._2 >= headerRow)
      .map { case (row, _) => Row.fromSeq(row.toSeq) }
    val df = spark.createDataFrame(dataRows, schema)
    // W4: drop rows where every cell is null (CSV already maps empty
    // unquoted cells to null — F14)
    df.na.drop("all")
  }

  /** N2/N3 canonical rename (etl/extract.py:136-155): fuzzy-match the
    * known hostile header variants onto canonical names.
    */
  private val CanonicalColumns: Seq[(String, Seq[String])] = Seq(
    "Fecha de pago" -> Seq("Fecha de pago", "fecha de pago", "fecha_pago",
      "fechadepago", "fechapago"),
    "FECHA_P" -> Seq("FECHA_P", "FECHA P", "fecha_p", "fecha p"),
    "FechaEntrega" -> Seq("FechaEntrega", "fecha entrega", "fecha_entrega",
      "fechaentrega"),
    "Estado" -> Seq("Estado", "estado", "ESTADO"))

  def normalizeColumns(df: DataFrame): DataFrame = {
    val renames = CanonicalColumns.flatMap { case (canonical, candidates) =>
      val hit = candidates.view
        .flatMap(cand => fuzzyLookup(df.columns.toSeq, cand))
        .headOption
      hit.filter(_ != canonical).map(_ -> canonical)
    }.toMap
    if (renames.isEmpty) df else df.withColumnsRenamed(renames)
  }

  /** S4's date-column guarantee (N7, etl/extract.py:291-295): the pagos
    * sheet must expose `Fecha de pago`, synthesized all-null if absent.
    */
  def withFechaDePago(df: DataFrame): DataFrame =
    ensureColumn(normalizeColumns(df), "Fecha de pago", StringType)
}
