package graft

import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Lloyd refinement vs the bare seed rule on a planted-degenerate
  * fixture: SemDeDup's pair work is Σ size² over clusters, so one
  * mega-cluster quietly reintroduces the N² the operator exists to
  * avoid. With the k lowest vec_ids as seeds all planted IDENTICAL,
  * iters=0 assigns every vector to cluster 0 (all similarities tie,
  * tie-break = smallest id) — maximal skew. Trained centroids must
  * split the space and raise the assignment objective.
  */
class KmeansSkewSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim fixture: ids 0..15 are exactly e0 (degenerate seeds); then
  // 8 groups of 25 vectors, group g pointing along basis direction g
  // (with a deterministic off-axis nudge so means are informative).
  private lazy val fixture = {
    def vec(dir: Int, nudge: Float): Array[Float] = {
      val v = Array.fill(8)(0.05f * nudge)
      v(dir) = 1.0f
      v
    }
    val seeds = (0L until 16L).map(i => (i, vec(0, 0f)))
    val rest = for (g <- 0 until 8; j <- 0 until 25)
      yield ((16 + g * 25 + j).toLong, vec(g, (j % 3 + 1).toFloat * 0.1f))
    (seeds ++ rest).toDF("vec_id", "embedding")
  }

  private def maxClusterFrac(cents: Array[(Int, Array[Float])]): Double = {
    val sizes = VectorOps.assignClusters(fixture, cents)
      .groupBy(col("cluster_id")).count().collect().map(_.getLong(1))
    sizes.max.toDouble / sizes.sum
  }

  private def meanAssignedCosine(cents: Array[(Int, Array[Float])]): Double = {
    import graft.functions.VectorExpressions.vecDot
    val cdf = cents.toSeq.toDF("cluster_id", "ce")
    VectorOps.assignClusters(fixture, cents)
      .join(broadcast(cdf), Seq("cluster_id"))
      .select(avg(vecDot(col("embedding"), col("ce")) /
        (sqrt(vecDot(col("embedding"), col("embedding"))) *
          sqrt(vecDot(col("ce"), col("ce"))))).as("m"))
      .collect()(0).getDouble(0)
  }

  test("iters=0 seed rule collapses the planted fixture to one cluster") {
    val seed = VectorOps.kmeansFit(fixture, k = 16, iters = 0)
    assert(maxClusterFrac(seed) == 1.0)
  }

  test("Lloyd iters>=2 drops skew and raises the assignment objective") {
    val seed = VectorOps.kmeansFit(fixture, k = 16, iters = 0)
    val trained = VectorOps.kmeansFit(fixture, k = 16, iters = 2)
    val (f0, f2) = (maxClusterFrac(seed), maxClusterFrac(trained))
    assert(f2 < f0, s"skew did not drop: iters=0 $f0, iters=2 $f2")
    val (c0, c2) = (meanAssignedCosine(seed), meanAssignedCosine(trained))
    assert(c2 > c0, s"objective did not improve: $c0 -> $c2")
  }

  test("save/load round-trips the model bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cents_spec")
      .toString + "/model"
    val trained = VectorOps.kmeansFit(fixture, k = 16, iters = 2)
    VectorOps.saveCentroids(spark, trained, dir)
    val back = VectorOps.loadCentroids(spark, dir)
    assert(back.length == trained.length)
    for (((ia, va), (ib, vb)) <- trained.zip(back)) {
      assert(ia == ib)
      assert(va.toSeq == vb.toSeq) // float32 parquet round-trip is exact
    }
  }
}
