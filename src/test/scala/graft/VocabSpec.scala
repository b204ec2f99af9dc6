package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Load
import graft.ops.Vocab

/** Persisted-vocab tokenizer: train/extend/encode with the id-stability
  * drift contract — extending the vocabulary must never re-map a
  * previously issued id (or every already-encoded corpus silently
  * changes meaning).
  */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("vocab").toString + "/v"

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def vocabMap(dir: String): Map[String, Int] =
    Load.readTable(spark, dir).get.collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Int]("tok_id")).toMap

  test("train ranks by frequency then word; extend keeps old ids stable") {
    val dir = tmp()
    // counts: a=3, b=1, c=1 -> a:1, b:2, c:3 (cnt desc, word asc)
    Vocab.train(spark, docs("a b a", "c a"), dir, size = 3)
    assert(vocabMap(dir) == Map("a" -> 1, "b" -> 2, "c" -> 3))

    // drift: d (x2) and e (x1) are new -> ids 4 and 5; b re-occurs but
    // KEEPS id 2; z misses the maxNew cut and stays OOV
    Vocab.extend(spark, docs("d d b e z e d"), dir, maxNew = 2)
    assert(vocabMap(dir) ==
      Map("a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4, "e" -> 5))
  }

  test("encode maps OOV to 0 and preserves token order") {
    val dir = tmp()
    Vocab.train(spark, docs("a b a", "c a"), dir, size = 3)
    val out = Vocab.encode(docs("a z c b"), Load.readTable(spark, dir).get)
      .collect()(0)
    assert(out.getAs[scala.collection.Seq[Int]]("ids").toSeq ==
      Seq(1, 0, 3, 2))
    assert(out.getAs[Long]("n_tokens") == 4 && out.getAs[Long]("n_oov") == 1)
  }

  test("encode against the extended vocab: old text encodes identically") {
    val dir = tmp()
    Vocab.train(spark, docs("a b a", "c a"), dir, size = 3)
    val before = Vocab.encode(docs("a c b"), Load.readTable(spark, dir).get)
      .collect()(0).getAs[scala.collection.Seq[Int]]("ids").toSeq
    Vocab.extend(spark, docs("d d e"), dir, maxNew = 2)
    val after = Vocab.encode(docs("a c b"), Load.readTable(spark, dir).get)
      .collect()(0).getAs[scala.collection.Seq[Int]]("ids").toSeq
    assert(before == after && before == Seq(1, 3, 2))
  }
}
