package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reusable scalar Column functions re-expressing the reference's row
  * lambdas (SURVEY.md §2.4–2.6) as codegen-friendly Catalyst built-ins.
  *
  * Every function here is a pure `Column → Column` composition of
  * `org.apache.spark.sql.functions._` — no UDFs in the hot path, so
  * whole-stage codegen stays intact and all expressions remain visible
  * to Catalyst for pushdown/pruning/constant-folding at 100 TB scale.
  */
object Functions {

  // -------------------------------------------------------------------
  // Null / empty handling
  // -------------------------------------------------------------------

  /** Empty or whitespace-only string → null (reference etl/extract.py:77-79). */
  def emptyToNull(c: Column): Column =
    when(c.isNull || trim(c) === "", lit(null).cast(StringType)).otherwise(c)

  // -------------------------------------------------------------------
  // Token extraction (reference etl/transform.py:20-21, :68-92)
  // -------------------------------------------------------------------

  /** First space-delimited token — `"T07 María"` → `"T07"` (F1). */
  def firstToken(c: Column): Column = substring_index(c, " ", 1)

  /** Conditional course-code extract (F2, etl/transform.py:68-78):
    * if trimmed value starts with "P" → first token of the trimmed value,
    * else pass through unchanged (nulls pass through).
    */
  def courseCode(c: Column): Column =
    when(c.isNotNull && trim(c).startsWith("P"), substring_index(trim(c), " ", 1))
      .otherwise(c)

  /** Conditional zeroing of course count (F3, etl/transform.py:81-92):
    * count kept only when the course value starts with "P"; null/other → 0.
    */
  def numCursosFixed(course: Column, n: Column): Column =
    when(course.isNotNull && trim(course).startsWith("P"),
      coalesce(n.cast(StringType).try_cast(IntegerType), lit(0)))
      .otherwise(lit(0))

  // -------------------------------------------------------------------
  // Numeric coercion (P8, etl/transform.py:111,182,262)
  // -------------------------------------------------------------------

  /** pandas `to_numeric(errors="coerce").fillna(0).round(2)` equivalent.
    * Uses try_cast so hostile strings → 0.0 regardless of ANSI mode.
    */
  def coerceMoney(c: Column): Column =
    round(coalesce(c.cast(StringType).try_cast(DoubleType), lit(0.0)), 2)

  // -------------------------------------------------------------------
  // Lenient day-first date parsing (D1/D2, etl/transform.py:17 et al.)
  // -------------------------------------------------------------------

  /** pandas `to_datetime(dayfirst=True, errors="coerce")` equivalent:
    * try a day-first format ladder, unparseable → null.
    */
  def lenientTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("d/M/yyyy H:mm:ss")),
    try_to_timestamp(c, lit("d/M/yyyy H:mm")),
    try_to_timestamp(c, lit("d/M/yyyy")),
    try_to_timestamp(c, lit("yyyy-MM-dd H:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** Lenient parse straight to DateType. */
  def lenientDate(c: Column): Column = lenientTimestamp(c).cast(DateType)

  /** Date/timestamp → `"yyyy-MM-dd"` string (D2). Null-safe. */
  def isoDate(c: Column): Column = date_format(c, "yyyy-MM-dd")

  // -------------------------------------------------------------------
  // Account normalization + derived currency (F8/F9,
  // etl/transform.py:156-178, :221-256)
  // -------------------------------------------------------------------

  /** Bank/account normalization map of transform_pagos_primera_cuota
    * (etl/transform.py:156-172).
    */
  val AccountMapPrimeraCuota: Map[String, String] = Map(
    "BANCO DE LA NACIÓN" -> "Banco de la Nación",
    "SCOTIABANK" -> "Scotiabank",
    "INTERBANK" -> "Interbank",
    "YAPE" -> "Yape",
    "PLIN" -> "Plin",
    "BBVA" -> "BBVA",
    "BCP" -> "BCP",
    "TARJETA LINK" -> "Tarjeta LINK",
    "PAYPAL" -> "Paypal",
    "BANCO DE MÉXICO" -> "Banco de México",
    "BANCO DE MEXICO" -> "Banco de México",
    "BANCO DE ECUADOR" -> "Banco de Ecuador",
    "BANCO DE COLOMBIA" -> "Banco de Colombia",
    "BANCO DE CHILE" -> "Banco de Chile",
    "OTROS" -> "Sin Especificar")

  /** Superset map of transform_regular_pagos (etl/transform.py:221-239). */
  val AccountMapRegular: Map[String, String] = AccountMapPrimeraCuota ++ Map(
    "BANCO DE ECUADOR / P" -> "Banco de Ecuador",
    "BANCO DE MÉXICO / P" -> "Banco de México")

  /** `ACCOUNT_MAP.get(upper(trim(v)), title(v))`, falsy → null (F8).
    * Python `str.title()` ≈ Spark `initcap` (documented divergence on
    * punctuation-adjacent letters — SURVEY.md §7.5).
    */
  def accountNormalize(c: Column, accountMap: Map[String, String]): Column =
    when(c.isNull || c === "", lit(null).cast(StringType))
      .otherwise(coalesce(
        element_at(typedLit(accountMap), upper(trim(c))),
        initcap(c)))

  /** Currency derived from the RAW payment-method string (F9,
    * etl/transform.py:248-256 — applied to the un-normalized column at
    * :264, a reference quirk preserved here).
    */
  def currencyForMethod(raw: Column): Column =
    when(raw.isin("Banco de México", "Banco de Mexico", "Banco de México / P",
      "Banco de Ecuador / P"), "MXN")
      .when(raw.isin("Banco de Ecuador", "PAYPAL", "Paypal"), "USD")
      .when(raw === "Banco de Chile", "CLP")
      .otherwise("PEN")

  // -------------------------------------------------------------------
  // Phone-country detection (F10–F12, etl/transform.py:291-339)
  // -------------------------------------------------------------------

  /** Strip all non-digits (F10). */
  def digitsOnly(c: Column): Column = regexp_replace(c.cast(StringType), "\\D", "")

  /** Phone-prefix country rules, ordered exactly as the reference's
    * longest-prefix-first table (etl/transform.py:301-321).
    * Each entry: (country, dial code, predicate over the digit string).
    */
  private def phoneRules(n: Column): Seq[(String, String, Column)] = Seq(
    ("Argentina", "54", n.startsWith("549")),
    ("Chile", "56", n.startsWith("569")),
    ("Perú", "51", n.startsWith("51")),
    ("Colombia", "57", n.startsWith("57")),
    ("Ecuador", "593", n.startsWith("593")),
    ("Bolivia", "591", n.startsWith("591")),
    ("Panamá", "507", n.startsWith("507")),
    ("México", "52", n.startsWith("521") || n.startsWith("52")),
    ("Brasil", "55", n.startsWith("55")),
    ("Estados Unidos / Puerto Rico", "1", length(n) === 11 && n.startsWith("1")),
    ("Italia", "39", n.startsWith("39")),
    ("España", "34", n.startsWith("34")),
    ("Francia", "33", n.startsWith("33")),
    ("Alemania", "49", n.startsWith("49")))

  /** Country name for a phone value; null/unmatched → "Desconocido" (F11). */
  def phoneCountry(c: Column): Column =
    phoneCountryFromDigits(c, digitsOnly(c))

  /** [[phoneCountry]] over a pre-extracted digit column. The digit
    * extraction is referenced by every prefix predicate, so when the
    * caller can stage it in its own projection (Catalyst won't inline a
    * non-cheap expression referenced more than once across a Project
    * boundary) the regexp runs once per row instead of once per rule.
    */
  def phoneCountryFromDigits(c: Column, n: Column): Column = {
    val matched = phoneRules(n).foldRight(lit("Desconocido")) {
      case ((pais, _, pred), acc) => when(pred, lit(pais)).otherwise(acc)
    }
    when(c.isNull, "Desconocido").otherwise(matched)
  }

  /** Full phone info struct `{pais, codigo_pais, numero_e164}` (F11/F12). */
  def phoneInfo(c: Column): Column =
    phoneInfoFromDigits(c, digitsOnly(c))

  /** [[phoneInfo]] over a pre-extracted digit column — see
    * [[phoneCountryFromDigits]] for why staging the digits matters.
    */
  def phoneInfoFromDigits(c: Column, n: Column): Column = {
    val nullStr = lit(null).cast(StringType)
    val fallback = struct(
      lit("Desconocido").as("pais"),
      nullStr.as("codigo_pais"),
      when(n =!= "", concat(lit("+"), n)).otherwise(nullStr).as("numero_e164"))
    val matched = phoneRules(n).foldRight(fallback) {
      case ((pais, cod, pred), acc) =>
        when(pred, struct(
          lit(pais).as("pais"),
          lit(cod).as("codigo_pais"),
          concat(lit("+"), n).as("numero_e164"))).otherwise(acc)
    }
    when(c.isNull, struct(
      lit("Desconocido").as("pais"),
      nullStr.as("codigo_pais"),
      nullStr.as("numero_e164"))).otherwise(matched)
  }

  // -------------------------------------------------------------------
  // Column-name normalization (N1–N3, etl/extract.py:107-155) —
  // driver-side metadata ops over df.columns, plain Scala.
  // -------------------------------------------------------------------

  /** NFKD fold → ASCII → lowercase → non-alnum runs → `_` → trim `_` (N1). */
  def normalizeName(s: String): String = {
    val folded = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
      .replaceAll("\\p{M}", "")
    folded.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_+|_+$", "")
  }

  /** Fuzzy column lookup (N2): exact normalized match, then bidirectional
    * substring match. Returns the actual column name if found.
    */
  def fuzzyLookup(columns: Seq[String], wanted: String): Option[String] = {
    val w = normalizeName(wanted)
    val norm = columns.map(c => c -> normalizeName(c))
    norm.collectFirst { case (c, n) if n == w => c }
      .orElse(norm.collectFirst { case (c, n) if n.contains(w) || w.contains(n) => c })
  }
}
