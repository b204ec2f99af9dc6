package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** The block-tiled all-pairs kernel must return EXACTLY the brute-force
  * pair set for every tile count — including tile counts that don't
  * divide the vector count and off-diagonal tiles where the a-side id
  * is the larger of the pair (the case a naive `da < db` filter drops).
  */
class TiledCosineSpec extends SparkSpec {

  test("cosinePairsTiled == brute force for every tile count") {
    import spark.implicits._
    val n = 120
    val dim = 8
    val vs = spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        k => (pmod(hash(col("id") * lit(dim) + k), lit(100)) / 50.0 - 1.0)
          .cast("float")).as("embedding"))
    // driver-side brute force over the same data — the ground truth
    val raw = vs.as[(Long, Array[Float])].collect().sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val thr = 0.2
    val expected = (for {
      i <- raw.indices; j <- (i + 1) until raw.length
      (da, va) = raw(i); (db, vb) = raw(j)
      c = dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb)))
      if c >= thr
    } yield (da, db)).toSet
    assert(expected.nonEmpty, "degenerate fixture: no pair above threshold")

    for (tiles <- Seq(1, 2, 3, 5, 8, 16)) {
      val got = VectorQueries.cosinePairsTiled(vs, tiles, thr)
        .select(col("da"), col("db")).as[(Long, Long)].collect().toSet
      assert(got == expected,
        s"tiles=$tiles: missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")
    }
  }
}
