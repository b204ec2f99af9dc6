package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.functions.ShingleExpression.wordShingles
import graft.functions.SimHashExpression.simhash32
import graft.functions.VectorExpressions.{signProjection, vecDot, vecNorm}

/** Native Catalyst expressions: VecDot, SimHash32, WordShingles.
  * Each is asserted against the equivalent built-in HOF formulation so
  * the compiled path can never drift from the declarative semantics.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vecDot matches HOF fold and handles nulls") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -0.5f), Array(2.0f, 2.0f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(vecDot(col("a"), col("b")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach { r => assert(r.getDouble(0) == r.getDouble(1)) }
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(2).getDouble(0) == 0.0)

    // mismatched lengths and null input → null
    val bad = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(vecDot(col("a"), col("b")))
    assert(bad.collect()(0).isNullAt(0))
    val nul = spark.sql("SELECT CAST(NULL AS ARRAY<FLOAT>) a, ARRAY(CAST(1.0 AS FLOAT)) b")
      .select(vecDot(col("a"), col("b")))
    assert(nul.collect()(0).isNullAt(0))
  }

  test("vecDot codegen and interpreted paths agree on testdata") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val hof = aggregate(zip_with(col("embedding"), col("embedding"),
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val diff = e.select(
      (vecDot(col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, "native dot must be bit-identical to the HOF fold")
    assert(e.select(vecNorm(col("embedding"))).collect().forall(!_.isNullAt(0)))
  }

  test("simhash32 majority vote: strict majority, ties round down") {
    // 2 of 3 hashes have bit 0 set -> majority -> bit set
    // 1 of 3 have bit 1 set -> no; exactly half of 2? use 4th row
    val df = Seq(
      Seq(1L, 1L, 2L),      // bit0: 2/3 -> set; bit1: 1/3 -> unset  => 1
      Seq(3L, 3L, 3L),      // bits 0,1: 3/3 -> both set             => 3
      Seq(1L, 2L),          // each bit 1/2 -> tie -> unset          => 0
      Seq.empty[Long]       // no features                           => 0
    ).toDF("h")
    val got = df.select(simhash32(col("h"))).as[Long].collect()
    assert(got.toSeq == Seq(1L, 3L, 0L, 0L))
  }

  test("wordShingles matches the HOF chain on testdata") {
    val t = split(col("text"), " ")
    val hof = when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
          element_at(t, i + 3)))))
      .otherwise(array().cast(ArrayType(StringType)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mismatches = docs
      .select(wordShingles(t).as("native"), hof.as("ref"))
      .filter(not(col("native") === col("ref")))
      .count()
    assert(mismatches == 0)
  }

  test("wordShingles edge cases: short input, duplicates, k") {
    val df = Seq(
      "a b",                 // < 3 tokens -> empty
      "a b c",               // exactly one shingle
      "x y x y x y x y"      // repeating -> distinct collapses
    ).toDF("text")
    val got = df.select(wordShingles(split(col("text"), " ")).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq("a b c"))
    assert(got(2) == Seq("x y x", "y x y"))
    val k2 = df.select(wordShingles(split(col("text"), " "), 2).as("sh"))
      .as[Seq[String]].collect()
    assert(k2(0) == Seq("a b"))
  }

  test("signProjection: reference recompute, determinism, nulls, locality") {
    // recompute the signature in plain Scala with the documented formula
    // — the compiled expression can never drift from the spec the
    // DuckDB oracle replays
    def ref(v: Array[Float], bits: Int): Long = {
      val n = v.length
      val sums = new Array[Long](bits)
      for (i <- 0 until n; j <- 0 until bits) {
        val q = math.floor(v(i).toDouble * 1000.0).toLong
        val h = (n.toLong * j + i + 1) * 2654435761L % 1000000007L
        sums(j) += (if (h % 2 == 0) q else -q)
      }
      (0 until bits).foldLeft(0L)((s, j) => if (sums(j) >= 0) s | (1L << j) else s)
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(100)
    val got = e.select(col("embedding"),
      signProjection(col("embedding"), 32).as("sig"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](0).toArray
      assert(r.getLong(1) == ref(v, 32))
    }

    // null array and null element → null
    val nul = spark.sql(
      "SELECT CAST(NULL AS ARRAY<FLOAT>) a UNION ALL SELECT ARRAY(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT))")
      .select(signProjection(col("a"), 8))
    assert(nul.collect().forall(_.isNullAt(0)))

    // locality: identical vectors share the signature; a vector and its
    // negation disagree (every bit with a nonzero projection flips)
    val v = Array.tabulate(16)(i => (math.sin(i + 1) * 2).toFloat)
    val df = Seq(v, v, v.map(x => -x)).toDF("a")
      .select(signProjection(col("a"), 16).as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("nfcNormalize: composition, fast path, nulls, java parity") {
    import graft.functions.NfcNormalize.nfcNormalize
    // decomposed e + U+0301 composes to é (2 code points → 1); composed
    // input is the fast path (returned untouched); ASCII unaffected
    val df = Seq("e\u0301clair", "\u00E9clair", "plain ascii", "")
      .toDF("s")
      .select(col("s"), nfcNormalize(col("s")).as("n"),
        length(col("s")).as("ls"), length(col("n")).as("ln"))
    val rows = df.collect()
    assert(rows(0).getString(1) == "\u00E9clair")
    assert(rows(0).getInt(2) == 7 && rows(0).getInt(3) == 6)
    assert(rows(1).getString(1) == "\u00E9clair")
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "")

    // null → null
    val nul = spark.sql("SELECT CAST(NULL AS STRING) s")
      .select(nfcNormalize(col("s")))
    assert(nul.collect()(0).isNullAt(0))

    // whole-corpus parity with java.text.Normalizer applied row-side
    // (the codegen path must agree with the library semantics exactly),
    // over text with injected decomposed accents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
      .select(regexp_replace(col("text"), "a", "a\u0300").as("s"))
    val got = docs.select(col("s"), nfcNormalize(col("s")).as("n")).collect()
    got.foreach { r =>
      val want = java.text.Normalizer.normalize(
        r.getString(0), java.text.Normalizer.Form.NFC)
      assert(r.getString(1) == want)
      assert(r.getString(1).length < r.getString(0).length)
    }
  }

  test("weightedTokenSum matches the HOF map-literal formulation") {
    import graft.functions.WeightedTokenSum.weightedTokenSum
    val w = Map("a" -> 10L, "bb" -> -7L, "ccc" -> 100L)
    val df = Seq("a bb ccc zz a", "", "zz zz", "a  a", "bb")
      .toDF("text").withColumn("t", split(col("text"), " "))
    val wmap = typedlit(w)
    val toksNE = filter(col("t"), x => length(x) > 0)
    val ref = df.select(
      size(toksNE).cast("long").as("n_tokens"),
      size(filter(toksNE, x => element_at(wmap, x).isNotNull))
        .cast("long").as("n_hits"),
      aggregate(toksNE, lit(5L),
        (acc, x) => acc + coalesce(element_at(wmap, x), lit(0L)))
        .as("margin_micro")).collect().map(_.toSeq)
    val got = df.select(weightedTokenSum(col("t"), w, 5L).as("s"))
      .select(col("s.n_tokens"), col("s.n_hits"), col("s.margin_micro"))
      .collect().map(_.toSeq)
    assert(got.toSeq == ref.toSeq)
    // null array -> null struct
    val n = Seq((1L, null: String)).toDF("id", "text")
      .select(weightedTokenSum(split(col("text"), " "), w, 5L)).head
    assert(n.isNullAt(0))
  }
}
