package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Scala-UDF showcase (SURVEY.md §7.1: "one showcase Scala UDF path").
  *
  * Same semantics as the pure-Column `Functions.phoneCountry` (F11,
  * etl/transform.py:291-339), implemented as plain Scala behind
  * `udf(...)`. The Column form is the production path — a UDF is a
  * codegen black box (no pushdown through it, ser/de per row); this
  * exists to demonstrate the escape hatch for logic that genuinely
  * can't be expressed as Column algebra.
  */
object PhoneCountryUdf {

  /** (country, matches-digit-string) in the reference's longest-prefix
    * priority order.
    */
  private val rules: Seq[(String, String => Boolean)] = Seq(
    "Argentina" -> (_.startsWith("549")),
    "Chile" -> (_.startsWith("569")),
    "Perú" -> (_.startsWith("51")),
    "Colombia" -> (_.startsWith("57")),
    "Ecuador" -> (_.startsWith("593")),
    "Bolivia" -> (_.startsWith("591")),
    "Panamá" -> (_.startsWith("507")),
    "México" -> (n => n.startsWith("521") || n.startsWith("52")),
    "Brasil" -> (_.startsWith("55")),
    "Estados Unidos / Puerto Rico" -> (n => n.length == 11 && n.startsWith("1")),
    "Italia" -> (_.startsWith("39")),
    "España" -> (_.startsWith("34")),
    "Francia" -> (_.startsWith("33")),
    "Alemania" -> (_.startsWith("49")))

  def phoneCountryScala(value: String): String = {
    if (value == null) return "Desconocido"
    val digits = value.replaceAll("\\D", "")
    rules.collectFirst { case (pais, p) if p(digits) => pais }
      .getOrElse("Desconocido")
  }

  val phoneCountry: UserDefinedFunction = udf(phoneCountryScala _)
}
