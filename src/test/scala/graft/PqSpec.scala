package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Pq

/** True product quantization: subspace split algebra, deterministic
  * codebook training, exact-roundtrip encode/reconstruct when every
  * sub-vector is its own codeword, and the m-codes payload shape.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def centDf = Seq((0L, Array(0f, 0f, 0f, 0f)))
    .toDF("cluster_id", "ce")

  private def assigned(rows: (Long, Array[Float])*) = rows.toSeq
    .toDF("vec_id", "embedding").withColumn("cluster_id", lit(0L))

  test("subResiduals splits the residual into m ordered sub-vectors") {
    val sub = Pq.subResiduals(
      assigned(1L -> Array(1f, 2f, 3f, 4f)), centDf, m = 2)
      .select("vec_id", "sub", "subres")
      .as[(Long, Int, Array[Double])].collect().sortBy(_._2)
    assert(sub.map(_._2).toSeq == Seq(0, 1))
    assert(sub(0)._3.toSeq == Seq(1.0, 2.0) && sub(1)._3.toSeq == Seq(3.0, 4.0))
  }

  test("residuals subtract the assigned centroid") {
    val c = Seq((0L, Array(1f, 1f, 1f, 1f))).toDF("cluster_id", "ce")
    val sub = Pq.subResiduals(
      assigned(1L -> Array(3f, 1f, 0f, 5f)), c, m = 2)
      .select("sub", "subres").as[(Int, Array[Double])]
      .collect().sortBy(_._1)
    assert(sub(0)._2.toSeq == Seq(2.0, 0.0) && sub(1)._2.toSeq == Seq(-1.0, 4.0))
  }

  test("trainCodebooks: deterministic init, Lloyd means, empty codeword keeps value") {
    // 4 vectors in 1 cluster at the origin, m=1 so subres = vector;
    // ks=2 -> init codewords are vec 1 (0,0) and vec 2 (10,10);
    // one Lloyd round: {(0,0),(0,2)} -> (0,1); {(10,10),(10,12)} -> (10,11)
    val sub = Pq.subResiduals(assigned(
      1L -> Array(0f, 0f), 2L -> Array(10f, 10f),
      3L -> Array(0f, 2f), 4L -> Array(10f, 12f)),
      Seq((0L, Array(0f, 0f))).toDF("cluster_id", "ce"), m = 1)
    val cb = Pq.trainCodebooks(spark, sub, ks = 2, iters = 1)
      .select("sub", "code_id", "cw").as[(Int, Int, Array[Double])]
      .collect().sortBy(_._2)
    assert(cb.length == 2)
    assert(cb(0)._3.toSeq == Seq(0.0, 1.0))
    assert(cb(1)._3.toSeq == Seq(10.0, 11.0))
    // rerun is bit-identical (deterministic train)
    val cb2 = Pq.trainCodebooks(spark, sub, ks = 2, iters = 1)
      .select("sub", "code_id", "cw").as[(Int, Int, Array[Double])]
      .collect().sortBy(_._2)
    assert(cb.toSeq.map(x => (x._1, x._2, x._3.toSeq)) ==
      cb2.toSeq.map(x => (x._1, x._2, x._3.toSeq)))
  }

  test("encode emits m codes per vector; exact roundtrip when ks covers every sub-vector") {
    val vecs = Seq(
      1L -> Array(1f, 2f, 3f, 4f), 2L -> Array(5f, 6f, 7f, 8f),
      3L -> Array(-1f, 0f, 2f, -3f))
    val c = Seq((0L, Array(1f, 1f, 1f, 1f))).toDF("cluster_id", "ce")
    val a = assigned(vecs: _*)
    val sub = Pq.subResiduals(a, c, m = 2)
    // ks = 3 >= distinct sub-vectors per subspace -> at init every
    // sub-vector IS a codeword, d2 = 0, reconstruction is exact:
    // c + (v - c) == v in doubles (float differences are exact)
    val cb = Pq.trainCodebooks(spark, sub, ks = 3, iters = 0)
    val index = Pq.encode(a, c, cb)
    assert(index.select(size(col("codes"))).as[Int].collect().toSet == Set(2))
    val vhat = Pq.reconstruct(index, cb, c)
      .select("vec_id", "vhat").as[(Long, Array[Double])]
      .collect().toMap
    vecs.foreach { case (id, v) =>
      assert(vhat(id).toSeq == v.map(_.toDouble).toSeq,
        s"vec $id not exactly reconstructed")
    }
  }

  test("fused PqCodes encode == relational assignCodes argmin, bit-exact") {
    // 60 pseudo-random vectors, 2 clusters, m=2, ks=4 — enough to
    // exercise real ties-free argmin geometry through both paths
    val vecs = (0 until 60).map { i =>
      i.toLong -> Array(
        (i * 37 % 11) - 5f, (i * 13 % 7) - 3f,
        (i * 29 % 13) - 6f, (i * 41 % 5) - 2f)
    }
    val cents = Seq(
      (0L, Array(0f, 0f, 0f, 0f)), (1L, Array(2f, -1f, 3f, 0f)))
      .toDF("cluster_id", "ce")
    val a = vecs.toDF("vec_id", "embedding")
      .withColumn("cluster_id", col("vec_id") % 2)
    val sub = Pq.subResiduals(a, cents, m = 2)
    val cb = Pq.trainCodebooks(spark, sub, ks = 4, iters = 1)
    val fused = Pq.encode(a, cents, cb)
      .select(col("vec_id"), col("codes").cast("array<int>"))
      .as[(Long, Seq[Int])].collect().toMap
    val relational = Pq.assignCodes(sub, cb)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code_id")))),
        x => x.getField("code_id")).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(fused == relational)
  }

  test("assignCodes picks nearest codeword with smallest-id tie-break") {
    val sub = Seq((1L, 0L, 0, Array(0.4, 0.0))).toDF(
      "vec_id", "cluster_id", "sub", "subres")
    val cb = Seq((0, 0, Array(0.0, 0.0)), (0, 1, Array(1.0, 0.0)),
      (0, 2, Array(0.4, 0.0)), (0, 3, Array(0.4, 0.0)))
      .toDF("sub", "code_id", "cw")
    val got = Pq.assignCodes(sub, cb)
      .select("vec_id", "code_id").as[(Long, Int)].head()
    // codes 2 and 3 tie at d2=0 -> smallest id wins
    assert(got == ((1L, 2)))
  }
}
