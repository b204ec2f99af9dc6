package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Functions
import graft.functions.PhoneCountryUdf
import graft.ops.Relational

/** Property-based invariants (SURVEY.md §5.2 item 3): algebraic laws of
  * the operator library over generated inputs, complementing the
  * example-based specs.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic generator sampling (the scalatest-scalacheck bridge
    * is not in the offline artifact cache — raw Gen + fixed seeds).
    */
  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(42L + i)))

  import spark.implicits._

  private val kvGen = Gen.listOfN(60,
    Gen.zip(Gen.choose(0, 9), Gen.choose(0L, 50L), Gen.alphaStr.map(_.take(6))))

  test("dedupKeepLast is idempotent and keeps exactly one row per key") {
    samples(kvGen, 5).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      val once = Relational.dedupKeepLast(df, Seq("k"), Seq(col("ord")))
      val twice = Relational.dedupKeepLast(once, Seq("k"), Seq(col("ord")))
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      assert(once.count() == rows.map(_._1).distinct.size)
    }
  }

  test("semiJoin output is a subset of the left input; anti is complement") {
    samples(Gen.zip(kvGen, kvGen), 5).foreach { case (l, r) =>
      val left = l.toDF("k", "ord", "v")
      val right = r.toDF("k", "ord", "v")
      val semi = Relational.semiJoin(left, right, Seq("k"))
      val anti = Relational.antiJoin(left, right, Seq("k"))
      assert(semi.exceptAll(left).isEmpty) // subset (multiset-wise)
      assert(semi.count() + anti.count() == left.count()) // partition
    }
  }

  test("unionByNameSafe row count is additive; missing columns nulled") {
    samples(Gen.zip(kvGen, kvGen), 5).foreach { case (a, b) =>
      val da = a.toDF("k", "ord", "v")
      val db = b.toDF("k", "ord", "extra") // no "v" on this side
      val u = Relational.unionByNameSafe(da, db)
      assert(u.count() == da.count() + db.count())
      assert(u.columns.toSet == Set("k", "ord", "v", "extra"))
      assert(u.filter(col("extra").isNull).count() >= da.count())
    }
  }

  test("phoneCountry is total and never null, expr == udf") {
    val phoneGen = Gen.oneOf(
      Gen.numStr.map(_.take(13)),
      Gen.asciiPrintableStr.map(_.take(15)),
      Gen.const(""), Gen.const("+51 999"))
    samples(Gen.listOfN(50, phoneGen), 5).foreach { phones =>
      val df = phones.toDF("phone")
      val out = df.select(
        Functions.phoneCountry(col("phone")).as("e"),
        PhoneCountryUdf.phoneCountry(col("phone")).as("u"))
      assert(out.filter(col("e").isNull).count() == 0)
      assert(out.filter(not(col("e") <=> col("u"))).count() == 0)
    }
  }

  test("maxScoreSearch == search over random corpora, queries, and k") {
    // the pruning proof (θ lower-bounds the true k-th best; docs with
    // only non-essential terms score below θ) must hold for ANY df
    // skew, tie pattern, and k — not just the planted stopword case
    val vocab = Vector("a", "b", "c", "d", "e", "stop")
    val docGen = Gen.listOfN(24, Gen.nonEmptyListOf(
      Gen.frequency(4 -> Gen.oneOf(vocab.init), 6 -> Gen.const("stop"))
        ).map(_.take(8)))
    samples(Gen.zip(docGen, Gen.choose(1, 12)), 4)
      .foreach { case (texts, k) =>
        val dir = java.nio.file.Files
          .createTempDirectory("msprop").toString + "/ix"
        val docs = texts.zipWithIndex
          .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
          .toDF("doc_id", "text")
        graft.ops.InvertedIndex.build(spark, docs, dir)
        Seq(Seq("stop", "a"), Seq("a", "b", "c"), Seq("stop"),
          Seq("e", "stop", "d")).foreach { q =>
          val a = graft.ops.InvertedIndex.search(spark, dir, q, k)
            .collect().toSeq.map(_.toSeq)
          val b = graft.ops.InvertedIndex.maxScoreSearch(spark, dir, q, k)
            .collect().toSeq.map(_.toSeq)
          assert(a == b, s"maxscore diverged for q=$q k=$k:\n$a\nvs\n$b")
        }
      }
  }

  test("requireNonNull is a partition of the input") {
    samples(kvGen, 5).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
        .withColumn("v", when(col("ord") % 3 === 0, lit(null)).otherwise(col("v")))
      val (good, bad) = Relational.requireNonNull(df, Seq("v"))
      assert(good.count() + bad.count() == df.count())
      assert(good.filter(col("v").isNull).count() == 0)
      assert(bad.filter(col("v").isNotNull).count() == 0)
    }
  }
}
