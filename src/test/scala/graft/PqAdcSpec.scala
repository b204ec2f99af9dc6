package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{IvfPq, Pq}

/** ADC search (Pq.adcIndex / probeLuts / adcSearch + the fused PqLut /
  * AdcSum / PqReconNorm expressions): LUT algebra against hand-computed
  * sub-dots, the stored reconstruction norm bit-identical to the
  * assembled-vector norm, ADC scores within 1e-9 of the reconstruction
  * coarse scores (they differ only in floating-point association), the
  * re-ranked top-k identical across both coarse paths, and the plan
  * contrast that motivates ADC — the reconstruction pass shuffles to
  * re-assemble vectors, the ADC pass scans codes straight into the
  * top-C window.
  */
class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  private val m = 2
  private val dsub = 4

  // dim-8 deterministic pseudo-random vectors, 2 fixed clusters
  private def vecs(n: Int) = spark.range(n).select(
    col("id").as("vec_id"),
    transform(sequence(lit(0), lit(7)), j =>
      (pmod(hash(col("id") * 13 + j), lit(1000)).cast(DoubleType) / 100.0)
        .cast(FloatType)).as("embedding"))

  private def cdf = Seq(
    (0L, Array(1f, 2f, 0f, -1f, 3f, 0f, 1f, 2f)),
    (1L, Array(4f, 0f, 2f, 1f, -2f, 1f, 0f, 3f)))
    .toDF("cluster_id", "ce")
    .withColumn("cn",
      sqrt(graft.functions.VectorExpressions.vecDot(col("ce"), col("ce"))))

  private def fixture(n: Int) = {
    val assigned = vecs(n).withColumn("cluster_id", col("vec_id") % 2)
    val sub = Pq.subResiduals(assigned, cdf, m)
    val cbDf = Pq.trainCodebooks(spark, sub, ks = 4, iters = 1)
    (assigned, cbDf, Pq.collectCodebook(cbDf))
  }

  test("PqLut entries are the per-subspace query·codeword dots; AdcSum folds them") {
    val (_, cbDf, cbSeq) = fixture(64)
    val qe = Array(0.5f, -1f, 2f, 0f, 1f, 1f, -0.5f, 3f)
    val lut = Seq(Tuple1(qe)).toDF("qe")
      .select(graft.functions.PqAdc.pqLut(col("qe"), cbSeq).as("lut"))
      .as[Array[Double]].head()
    val ks = cbSeq.map(_._2).max + 1
    assert(lut.length == m * ks)
    cbSeq.foreach { case (s, c, cw) =>
      var expect = 0.0
      (0 until dsub).foreach { k =>
        expect += qe(s * dsub + k).toDouble * cw(k)
      }
      assert(lut(s * ks + c) == expect, s"lut($s,$c)")
    }
    val codes = Array(2, 1)
    val got = Seq((codes, lut)).toDF("codes", "lut")
      .select(graft.functions.PqAdc.adcSum(col("codes"), col("lut")))
      .as[Double].head()
    assert(got == lut(0 * ks + 2) + lut(1 * ks + 1))
  }

  test("stored vn is bit-identical to the assembled-reconstruction norm") {
    val (assigned, cbDf, cbSeq) = fixture(128)
    val index = Pq.encode(assigned, cdf, cbDf)
    val vn = Pq.adcIndex(index, cdf, cbSeq)
      .select(col("vec_id"), col("vn")).as[(Long, Double)].collect().toMap
    val fromVhat = Pq.reconstruct(index, cbDf, cdf)
      .select(col("vec_id"),
        sqrt(graft.functions.VectorExpressions.vecDot(col("vhat"),
          col("vhat"))).as("n"))
      .as[(Long, Double)].collect().toMap
    assert(vn.size == 128)
    vn.foreach { case (id, n) =>
      assert(n == fromVhat(id), s"vn($id) not bit-identical")
    }
  }

  test("ADC scores match reconstruction cosines to 1e-9; re-ranked top-k identical") {
    val (assigned, cbDf, cbSeq) = fixture(200)
    val e = assigned.select(col("vec_id"), col("embedding"),
      sqrt(graft.functions.VectorExpressions.vecDot(col("embedding"),
        col("embedding"))).as("nrm"))
    val index = Pq.encode(assigned, cdf, cbDf)
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val probes = IvfPq.probeRoute(q, cdf, nprobe = 2)
    // topC = corpus so BOTH paths score every vector — the comparison
    // is over the full probed set, not just the agreeing prefix
    val adcCand = Pq.adcSearch(Pq.adcIndex(index, cdf, cbSeq),
      Pq.probeLuts(probes, cdf, cbSeq), topC = 1000)
    val reconCand = Pq.coarseSearch(Pq.reconstruct(index, cbDf, cdf),
      probes, topC = 1000)
    val a = adcCand.select(col("query_id"), col("neighbor_id"),
      col("approx")).as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val b = reconCand.select(col("query_id"), col("neighbor_id"),
      col("approx")).as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (k, v) =>
      assert(math.abs(v - b(k)) <= 1e-9, s"score diverged at $k")
    }
    val topA = IvfPq.rerank(adcCand, e, topK = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val topB = IvfPq.rerank(reconCand, e, topK = 5)
      .select("query_id", "rank", "neighbor_id", "cosine")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(topA.toSeq == topB.toSeq)
  }

  test("plan shape: ADC scan reaches the top-C window with no extra exchange; reconstruction cannot") {
    val (assigned, cbDf, cbSeq) = fixture(256)
    // pin the inputs so the measured plans are the SEARCH only
    val index = Pq.encode(assigned, cdf, cbDf).localCheckpoint()
    val q = assigned.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"),
      sqrt(graft.functions.VectorExpressions.vecDot(col("embedding"),
        col("embedding"))).as("qn")).filter(col("query_id") < 2)
    val probes = IvfPq.probeRoute(q, cdf, nprobe = 2).localCheckpoint()
    val adcIdx = Pq.adcIndex(index, cdf, cbSeq).localCheckpoint()
    val pl = Pq.probeLuts(probes, cdf, cbSeq).localCheckpoint()
    // Count SHUFFLE exchanges in the FINAL adaptive plan only: the
    // raw "Exchange" regex also matches BroadcastExchange (the probe
    // LUT broadcast is by design) and the AQE toString prints the
    // whole tree twice ("Final Plan" + "Initial Plan") — both inflate
    // the count without any data moving twice.
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val fin = s.indexOf("== Initial Plan ==") match {
        case -1 => s
        case i  => s.substring(0, i)
      }
      "Exchange (hash|range)partitioning".r.findAllIn(fin).length
    }
    // ADC: the ONLY shuffle is the top-C window's hash partitioning
    val adcEx = exchanges(Pq.adcSearch(adcIdx, pl, topC = 10))
    assert(adcEx == 1, s"ADC coarse pass should have 1 shuffle, got $adcEx")
    // reconstruction: explode → codebook join → groupBy re-assembly
    // adds corpus-sized exchanges before the same window
    val reconEx = exchanges(
      Pq.coarseSearch(Pq.reconstruct(index, cbDf, cdf), probes, topC = 10))
    assert(reconEx > adcEx,
      s"expected the reconstruction path to shuffle more: $reconEx vs $adcEx")
  }

  test("semantic decon catches a paraphrase the n-gram rewrite provably misses") {
    // the q193 contract: two documents that share NO token (disjoint
    // vocabulary -> no 13-gram can match, the q178 detector strikes
    // zero positions) but whose EMBEDDINGS are near-identical — the
    // paraphrased-contamination shape n-gram decontamination cannot
    // see and embedding screening exists for
    val evalText = "which planet is closest to the sun in our solar " +
      "system answer mercury orbits nearest"
    val paraText = "el planeta mas cercano al astro central resulta " +
      "ser mercurio segun la astronomia moderna"
    assert(evalText.split(" ").toSet.intersect(
      paraText.split(" ").toSet).isEmpty)
    // 1) the n-gram span rewrite strikes NOTHING
    val struck = graft.queries.TextQueries.decontaminateRewrite(
      Seq((5L, paraText)).toDF("doc_id", "text"),
      Seq((100L, evalText)).toDF("doc_id", "text"), winLen = 13)
      .head()
    assert(struck.getAs[Long]("n_removed") == 0L)
    // 2) the embedding path flags exactly the paraphrase: train corpus
    // = 20 pseudo-random vectors with vec 5 REPLACED by the eval
    // item's embedding plus a one-coordinate nudge (cosine ~ 0.999)
    val evalEmb = transform(sequence(lit(0), lit(7)), j =>
      (pmod(hash(lit(4242L) * 13 + j), lit(1000)).cast(DoubleType) / 100.0)
        .cast(FloatType))
    val train = vecs(20).select(col("vec_id"),
      when(col("vec_id") === 5,
        transform(evalEmb, (x, k) =>
          (x.cast(DoubleType) + when(k === 0, lit(0.01)).otherwise(lit(0.0)))
            .cast(FloatType)))
        .otherwise(col("embedding")).as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("semdecon")
      .toString + "/w"
    graft.ops.AdcIngest.bootstrap(spark, train, dir, k = 2, m = 2, ks = 4)
    val cdf = graft.ops.VectorOps.loadCentroids(spark, s"$dir/centroids")
      .toSeq.toDF("cluster_id", "ce")
      .withColumn("cluster_id", col("cluster_id").cast(LongType))
      .withColumn("cn",
        sqrt(graft.functions.VectorExpressions.vecDot(col("ce"), col("ce"))))
    val cb = graft.ops.Pq.collectCodebook(
      graft.etl.Load.readTable(spark, s"$dir/codebooks").get)
    val q = Seq(100L).toDF("query_id")
      .select(col("query_id"), evalEmb.as("qe"))
      .withColumn("qn",
        sqrt(graft.functions.VectorExpressions.vecDot(col("qe"), col("qe"))))
    val pl = graft.ops.Pq.probeLuts(
      graft.ops.IvfPq.probeRoute(q, cdf, nprobe = 2), cdf, cb)
    val cand = graft.ops.Pq.adcScreen(
      graft.ops.AdcIngest.index(spark, dir), pl, tauPre = 0.6)
    val tn = train.withColumn("nrm",
      sqrt(graft.functions.VectorExpressions.vecDot(
        col("embedding"), col("embedding"))))
    val flagged = cand
      .join(tn, cand("neighbor_id") === tn("vec_id"))
      .select(col("vec_id"),
        round(graft.functions.VectorExpressions.vecDot(
          col("qe"), col("embedding")) / (col("qn") * col("nrm")), 6)
          .as("cosine"))
      .filter(col("cosine") >= 0.99)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(5L),
      s"semantic screen must flag exactly the paraphrase, got $flagged")
  }
}
