package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Load

/** Mojibake (encoding-damage) repair — the ftfy core cases: text that
  * was UTF-8 encoded but decoded as windows-1252/latin-1, so "é"
  * renders as "Ã©" and "'" as "â€™". Undoing the damage is exact: map
  * each damaged character back to the BYTE the cp1252 decoder consumed
  * (the "sloppy cp1252" convention — the 27 remapped printables by
  * table, everything else its codepoint), and re-decode the byte
  * sequence as UTF-8.
  *
  * The operator ships that inverse as DATA: a (rank, moji, fixed)
  * mapping table — one row per repairable codepoint, `moji` the 2- or
  * 3-char damaged form of its UTF-8 bytes, ranked by codepoint — and
  * repair = the ordered fold of plain string replaces over the
  * mapping, exactly the q149 BPE-apply machinery:
  *
  *  - non-overlap is structural: a 2-byte lead char (U+00C2-U+00DF)
  *    is never a continuation char, and no 3-byte lead (U+00E0-U+00EF)
  *    is a 2-byte lead, so passes can't corrupt each other's matches;
  *  - DOUBLE-encoded text repairs in the same fold: codepoint rank
  *    order fixes the inner layer's sequences before the pass that
  *    matches the outer layer's (e.g. "ÃƒÂ©" → "Ã©" → "é");
  *  - the fold is codegen'd string work in Spark and byte-exactly
  *    replayable in DuckDB via a recursive CTE over the persisted
  *    mapping parquet (q151's oracle).
  *
  * 100 TB note: ~120 replace passes per row is the cross-engine-
  * verifiable CONTRACT form; a single-pass trie as a custom codegen
  * Expression is the drop-in hot-path form of the same mapping if a
  * profile ever demands it (the VecDot precedent).
  */
object Mojibake {

  /** windows-1252's 27 remapped printables (0x80-0x9F bytes that do
    * NOT decode to their codepoint); all other bytes decode to
    * themselves, including the 5 cp1252-undefined bytes, per the
    * "sloppy" convention real-world decoders follow.
    */
  val Cp1252: Map[Int, Char] = Map(
    0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
    0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
    0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
    0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
    0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
    0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
    0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')

  /** How a cp1252 decoder renders byte `b` (sloppy form). */
  private def cp1252Char(b: Int): Char =
    Cp1252.getOrElse(b, b.toChar)

  /** Damage a string the way the bug does: UTF-8 encode, then render
    * each byte as cp1252 decoded it. Apply twice for double-encoding.
    */
  def damage(s: String): String =
    s.getBytes("UTF-8").map(b => cp1252Char(b & 0xff)).mkString

  /** The damaged (mojibake) rendering of codepoint `cp`. */
  def mojibakeOf(cp: Int): String =
    damage(new String(Character.toChars(cp)))

  /** Repairable targets: the Latin-1 Supplement printables
    * (U+00A1-U+00FF — the accented-Latin workhorse) plus every cp1252
    * printable above U+00FF (curly quotes, dashes, €, ™, …). Ranked
    * by codepoint — the order that makes double-encoding cascade
    * correctly inside one fold.
    */
  val Targets: Seq[Int] =
    ((0xA1 to 0xFF) ++ Cp1252.values.map(_.toInt).filter(_ > 0xFF)).sorted

  /** (rank, moji, fixed) rows, rank dense from 1 in codepoint order. */
  def mappingRows: Seq[(Int, String, String)] =
    Targets.zipWithIndex.map { case (cp, i) =>
      (i + 1, mojibakeOf(cp), new String(Character.toChars(cp)))
    }

  /** Persist the mapping as a warehouse table. */
  def saveMapping(spark: SparkSession, dir: String): Long = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("moji", StringType, nullable = false),
      StructField("fixed", StringType, nullable = false)))
    Load.replaceTable(spark, spark.createDataFrame(
      mappingRows.map { case (r, m, f) =>
        org.apache.spark.sql.Row(r, m, f)
      }.asJava, schema).coalesce(1), dir)
  }

  /** Read a persisted mapping back in rank order (bounded collect). */
  def loadMapping(spark: SparkSession, dir: String): Seq[(String, String)] =
    Load.readTable(spark, dir).getOrElse(
      throw new IllegalStateException(s"no mojibake mapping at $dir"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getAs[String]("moji"), r.getAs[String]("fixed"))).toSeq

  /** The repair fold: ordered string replaces over the mapping. */
  def repair(c: Column, mapping: Seq[(String, String)]): Column =
    mapping.foldLeft(c) { case (s, (m, f)) => replace(s, lit(m), lit(f)) }
}
