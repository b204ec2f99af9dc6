package graft

import org.apache.spark.sql.functions._

import graft.ops.Mojibake

/** Mojibake repair semantics: the inverse property over every mapped
  * codepoint, double-encoding cascade, ASCII invariance, and the
  * save/load round-trip the q151 oracle consumes.
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val mapping = Mojibake.mappingRows.map(r => (r._2, r._3))

  private def repairOne(s: String): String =
    Seq(s).toDF("t").select(Mojibake.repair(col("t"), mapping))
      .collect()(0).getString(0)

  test("repair inverts the damage for every mapped codepoint") {
    // one batched column pass over all targets at once
    val rows = Mojibake.Targets
      .map(cp => (new String(Character.toChars(cp)), Mojibake.mojibakeOf(cp)))
    val out = rows.toDF("clean", "moji")
      .select(col("clean"), Mojibake.repair(col("moji"), mapping).as("rep"))
      .collect()
    for (r <- out) assert(r.getString(1) == r.getString(0),
      s"codepoint ${r.getString(0)} did not repair")
  }

  test("double-encoded text cascades clean inside one fold") {
    val once = Mojibake.mojibakeOf(0xE9)          // "é" damaged once
    val twice = Mojibake.damage(once)             // damaged again
    assert(twice != once)
    assert(repairOne(twice) == "é")
    assert(repairOne(s"x $twice y $once z") == "x é y é z")
  }

  test("sentences repair in place; ASCII is untouched") {
    val dirty = s"caf${Mojibake.mojibakeOf(0xE9)} costs " +
      s"${Mojibake.mojibakeOf(0x20AC)}5 ${Mojibake.mojibakeOf(0x2013)} ok"
    assert(repairOne(dirty) == "café costs €5 – ok")
    val ascii = "plain ascii text stays exactly as it is 123"
    assert(repairOne(ascii) == ascii)
  }

  test("mapping persists and loads in rank order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_moji_spec")
      .toString + "/mapping"
    Mojibake.saveMapping(spark, dir)
    assert(Mojibake.loadMapping(spark, dir) == mapping)
  }
}
