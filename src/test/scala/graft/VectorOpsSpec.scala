package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Spherical k-means: three well-separated synthetic blobs must be
  * recovered exactly, deterministically, with every vector assigned to
  * its own blob's centroid.
  */
class VectorOpsSpec extends SparkSpec {

  private def blobs(n: Int) = {
    import spark.implicits._
    // blob b lives on axis-triple 3b..3b+2 with small deterministic
    // jitter elsewhere — cosines within a blob ≈ 1, across blobs ≈ 0
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(11)), k => {
        val blob = (col("vec_id") % 3).cast("int")
        when(k >= blob * 3 && k < blob * 3 + 3,
          lit(10.0) + pmod(col("vec_id") * (k + 1), lit(7)) / 7.0)
          .otherwise(pmod(col("vec_id") * (k + 13), lit(5)) / 50.0)
          .cast("float")
      }).as("embedding"))
  }

  test("kmeansFit recovers separated blobs; assignment is pure") {
    val v = blobs(300)
    val cents = VectorOps.kmeansFit(v, k = 3, iters = 3)
    assert(cents.length == 3)
    // each centroid's dominant axis-triple identifies its blob
    val blobOf = cents.map { case (cid, c) =>
      cid -> (0 until 4).maxBy(b => c.slice(b * 3, b * 3 + 3).sum)
    }.toMap
    assert(blobOf.values.toSet == Set(0, 1, 2), s"degenerate clustering: $blobOf")
    val assigned = VectorOps.assignClusters(v, cents)
      .withColumn("blob", (col("vec_id") % 3).cast("int"))
    val wrong = assigned.collect().count { r =>
      blobOf(r.getAs[Int]("cluster_id")) != r.getAs[Int]("blob")
    }
    assert(wrong == 0, s"$wrong of 300 vectors assigned across blobs")
    // determinism: a second fit yields bit-identical centroids
    val cents2 = VectorOps.kmeansFit(v, k = 3, iters = 3)
    assert(cents.zip(cents2).forall { case ((_, a), (_, b)) => a.sameElements(b) })
  }

  test("ivfTopK: exact at full probe count, in-blob recall at nprobe=1") {
    val v = blobs(300)
    val cents = VectorOps.kmeansFit(v, k = 3, iters = 2)
    val q = v.filter(col("vec_id") < 6)
    // probing every cluster ≡ brute force: compare against a direct
    // all-pairs top-5 on the collected data
    val full = VectorOps.ivfTopK(v, cents, q, k = 5, nprobe = 3)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    val raw = {
      import spark.implicits._
      v.as[(Long, Array[Float])].collect()
    }
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    for (qid <- 0L until 6L) {
      val qv = raw.find(_._1 == qid).get._2
      val expect = raw.filter(_._1 != qid)
        .map { case (id, w) =>
          (id, dot(qv, w) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(w, w)))) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      expect.zipWithIndex.foreach { case (id, i) =>
        assert(full((qid, i + 1)) == id, s"query $qid rank ${i + 1}")
      }
    }
    // nprobe=1 on separated blobs: every neighbor is from the query's blob
    val one = VectorOps.ivfTopK(v, cents, q, k = 5, nprobe = 1).collect()
    assert(one.length == 30)
    assert(one.forall(r =>
      r.getAs[Long]("neighbor_id") % 3 == r.getAs[Long]("query_id") % 3))
  }
}
