package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{IvfPq, VectorOps}

/** ops/IvfPq — the int8-residual quantized search path (q150's
  * operator): quantization round-trip accuracy, coarse-candidate
  * containment of the true neighbors on a planted-cluster fixture,
  * and exactness of the re-ranked top-k vs brute force.
  */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** 4 planted centers, 25 vectors each, small deterministic noise. */
  private lazy val vecs: DataFrame = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 100).map { i =>
      val c = i % 4
      val v = centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private lazy val model = VectorOps.kmeansFit(vecs, k = 4, iters = 2)

  private lazy val cdf = model.toSeq.toDF("cluster_id", "ce")
    .withColumn("cluster_id", col("cluster_id").cast(LongType))
    .withColumn("cn", sqrt(graft.functions.VectorExpressions
      .vecDot(col("ce"), col("ce"))))

  private lazy val assigned = VectorOps.assignClusters(vecs, model)
    .withColumn("cluster_id", col("cluster_id").cast(LongType))

  private def nrm(c: org.apache.spark.sql.Column) =
    sqrt(graft.functions.VectorExpressions.vecDot(c, c))

  test("int8 residual reconstruction error is bounded by maxabs/254") {
    val idx = IvfPq.quantizeIndex(assigned, cdf)
    // reconstruct and compare per-dimension against the original
    val joined = idx.join(vecs, Seq("vec_id"))
      .select(col("vec_id"), col("maxabs"),
        array_max(transform(
          zip_with(
            zip_with(col("ce"), col("qr"), (c, q) =>
              c.cast(DoubleType) + q.cast(DoubleType) * col("maxabs") / 127.0),
            col("embedding"),
            (vh, v) => vh - v.cast(DoubleType)),
          abs(_))).as("maxerr"))
    // scalar quantization with round-half-up: per-dim error ≤ scale/2
    // where scale = maxabs/127 — allow a float-arithmetic epsilon
    val bad = joined
      .filter(col("maxerr") > col("maxabs") / 254.0 + lit(1e-6)).count()
    assert(bad === 0)
  }

  test("zero residual (vector == centroid) quantizes to all-zero codes") {
    val exact = model.toSeq.toDF("cluster_id", "embedding")
      .withColumn("cluster_id", col("cluster_id").cast(LongType))
      .withColumn("vec_id", col("cluster_id") + 1000L)
    val idx = IvfPq.quantizeIndex(exact, cdf)
    val nonzero = idx.filter(exists(col("qr"), _ =!= 0)).count()
    assert(nonzero === 0)
  }

  test("pack_int8/unpack_int8 round-trips codes; out-of-range nulls") {
    import graft.functions.VectorExpressions.{packInt8, unpackInt8}
    val df = Seq(
      (1L, Seq(-128, -127, -1, 0, 1, 126, 127)),
      (2L, Seq.empty[Int]),
      (3L, Seq(42))
    ).toDF("id", "codes")
    val rt = df.select(col("id"),
      unpackInt8(packInt8(col("codes"))).as("back"),
      col("codes"))
    assert(rt.filter(not(col("back") === col("codes"))).count() === 0)
    // packed width is exactly one byte per code
    val widths = df.select(length(packInt8(col("codes"))).as("w"),
      size(col("codes")).as("n")).collect()
    widths.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // out-of-range values null the row rather than silently clamping
    val bad = Seq((1L, Seq(128)), (2L, Seq(-129))).toDF("id", "codes")
      .select(packInt8(col("codes")).as("p"))
    assert(bad.filter(col("p").isNotNull).count() === 0)
  }

  test("a packed index reconstructs the same top-k as the unpacked one") {
    import graft.functions.VectorExpressions.{packInt8, unpackInt8}
    val idx = IvfPq.quantizeIndex(assigned, cdf)
    val packed = idx.select(col("vec_id"), col("cluster_id"), col("ce"),
      col("maxabs"), unpackInt8(packInt8(col("qr"))).as("qr"))
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        nrm(col("embedding")).as("qn"))
    val e = vecs.select(col("vec_id"), col("embedding"),
      nrm(col("embedding")).as("nrm"))
    val probes = IvfPq.probeRoute(q, cdf, nprobe = 2)
    def topk(i: org.apache.spark.sql.DataFrame) =
      IvfPq.rerank(IvfPq.coarseSearch(i, probes, topC = 15), e, topK = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("coarse_cosine"))
        .collect().map(_.toSeq).toSet
    assert(topk(packed) === topk(idx))
  }

  test("re-ranked top-k equals brute force on the planted fixture") {
    val idx = IvfPq.quantizeIndex(assigned, cdf)
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        nrm(col("embedding")).as("qn"))
    val e = vecs.select(col("vec_id"), col("embedding"),
      nrm(col("embedding")).as("nrm"))
    val probes = IvfPq.probeRoute(q, cdf, nprobe = 2)
    val cand = IvfPq.coarseSearch(idx, probes, topC = 15)
    val got = IvfPq.rerank(cand, e, topK = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    val brute = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (graft.functions.VectorExpressions.vecDot(col("qe"), col("embedding"))
          / (col("qn") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(wB).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // planted clusters are well-separated: the probed clusters contain
    // every true neighbor, so the quantized path is EXACT here
    assert(got === brute)
  }

  test("coarse candidates contain the exact same-cluster top neighbors") {
    val idx = IvfPq.quantizeIndex(assigned, cdf)
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        nrm(col("embedding")).as("qn"))
    val probes = IvfPq.probeRoute(q, cdf, nprobe = 1)
    val coarse = IvfPq.coarseSearch(idx, probes, topC = 10)
      .select(col("neighbor_id")).as[Long].collect().toSet
    assert(coarse.size === 10)
    // exact float top-3 WITHIN the probed cluster must all surface in
    // the coarse top-10 — the containment property the re-rank relies on
    val probedCluster = probes.select(col("cluster_id")).as[Long].head()
    val e = assigned.filter(col("cluster_id") === probedCluster)
      .select(col("vec_id"), col("embedding"), nrm(col("embedding")).as("nrm"))
    val exactTop3 = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("vec_id"),
        (graft.functions.VectorExpressions.vecDot(col("qe"), col("embedding"))
          / (col("qn") * col("nrm"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id")).limit(3)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(exactTop3.subsetOf(coarse))
  }
}
