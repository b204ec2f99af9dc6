package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.vecDot

/** Distributed vector-index training ops — the piece that turns the
  * q35 IVF *search* skeleton into a real index build at 100 TB.
  *
  * Spherical k-means (Lloyd iterations with cosine assignment):
  *  - ASSIGN is a broadcast of the k×dim centroid model against the
  *    full vector table — a BroadcastNestedLoop-shaped crossJoin with
  *    the codegen'd VecDot, then a per-vector argmax as a partial
  *    aggregate: the shuffle carries one pre-reduced row per vector,
  *    not the N·k crossJoin output.
  *  - UPDATE is posexplode → groupBy(cluster, dim) avg — one shuffle of
  *    N·dim scalar rows with map-side partial aggregation, then a k×dim
  *    collect. The model (k×dim doubles) is the ONLY driver-side data;
  *    at k=4096, dim=1024 that is 32 MB — legitimately driver-sized.
  *
  * Deterministic by construction: init = lowest-k vec_ids, ties in the
  * argmax broken by cluster id, means are exact double sums per (
  * cluster, dim) group — reruns give identical models.
  */
object VectorOps {

  /** Assign each vector to its max-cosine centroid. Input needs
    * (vec_id: long, embedding: array<float>); output adds cluster_id.
    *
    * The argmax is a partial-aggregating groupBy — max(struct(sim,
    * -cluster_id, payload)) — NOT a window over the crossJoin output: a
    * window would hash-exchange all N·k broadcast-joined rows every
    * Lloyd iteration, while the hash aggregate map-side-combines the k
    * candidates of each vector down to one row before the shuffle, so
    * the exchange carries N rows regardless of k. Struct ordering is
    * field-by-field, so max picks highest sim, ties broken toward the
    * SMALLEST cluster_id via the negated id (both sides of a tie are
    * the same bit-identical double — deterministic).
    */
  def assignClusters(df: DataFrame,
                     centroids: Array[(Int, Array[Float])]): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val cdf = centroids.toSeq.toDF("cluster_id", "ce")
    val sim = vecDot(col("embedding"), col("ce")) /
      (sqrt(vecDot(col("embedding"), col("embedding"))) *
        sqrt(vecDot(col("ce"), col("ce"))))
    val payload = df.columns.filter(_ != "vec_id")
    val best = max(struct(
      sim.as("s"),
      (-col("cluster_id")).as("nc"),
      struct(payload.map(col).toIndexedSeq: _*).as("p")))
    df.crossJoin(broadcast(cdf))
      .groupBy(col("vec_id"))
      .agg(best.as("b"))
      .select((col("vec_id") +:
        payload.map(c => col(s"b.p.$c").as(c)) :+
        (-col("b.nc")).as("cluster_id")).toIndexedSeq: _*)
  }

  /** Multi-probe IVF top-k search: each query is routed to its `nprobe`
    * nearest centroids and ranked against only those clusters' vectors.
    * `nprobe` is the recall/cost lever (nprobe = k(clusters) ≡ exact
    * brute force). Plan shape at scale: the vector table shuffles once
    * on cluster_id (or is pre-bucketed by it at index-build time); the
    * query set and its probe lists are broadcast. Output:
    * (query_id, rank, neighbor_id, cosine).
    */
  def ivfTopK(df: DataFrame, centroids: Array[(Int, Array[Float])],
              queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    require(k > 0 && nprobe > 0)
    val assigned = df.transform(a => assignClusters(a, centroids))
    val cdf = centroids.toSeq.toDF("cluster_id", "ce")
    // probe lists: tiny (|queries| × |centroids|) cross product
    val qsim = vecDot(col("qe"), col("ce")) /
      (sqrt(vecDot(col("qe"), col("qe"))) * sqrt(vecDot(col("ce"), col("ce"))))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cluster_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(cdf))
      .withColumn("__csim", qsim)
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      // query norm staged once here, not recomputed per candidate row
      .select(col("query_id"), col("qe"),
        sqrt(vecDot(col("qe"), col("qe"))).as("qn"), col("cluster_id"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assigned
      .withColumn("__nrm", sqrt(vecDot(col("embedding"), col("embedding"))))
      .join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (vecDot(col("qe"), col("embedding")) / (col("qn") * col("__nrm")))
          .as("cosine"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Persist a trained centroid model as a warehouse table
    * (cluster_id, embedding). The model is k×dim — driver-sized by
    * definition — and parquet round-trips float32 exactly, so a reader
    * (including a cross-engine oracle) sees bit-identical centroids.
    */
  def saveCentroids(spark: SparkSession,
                    centroids: Array[(Int, Array[Float])],
                    dir: String): Long = {
    import spark.implicits._
    graft.etl.Load.replaceTable(spark,
      centroids.toSeq.toDF("cluster_id", "embedding").coalesce(1), dir)
  }

  /** Read a persisted centroid model back (bounded k-row collect). */
  def loadCentroids(spark: SparkSession,
                    dir: String): Array[(Int, Array[Float])] =
    graft.etl.Load.readTable(spark, dir).getOrElse(
      throw new IllegalStateException(s"no centroid table at $dir"))
      .orderBy(col("cluster_id")).collect()
      .map(r => (r.getAs[Int]("cluster_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))

  /** Train k spherical-k-means centroids with `iters` Lloyd iterations.
    * Returns (cluster_id, centroid) — feed to [[assignClusters]] for
    * index build / query routing.
    */
  def kmeansFit(df: DataFrame, k: Int, iters: Int): Array[(Int, Array[Float])] = {
    val s = df.sparkSession
    import s.implicits._
    require(k > 0 && iters >= 0)
    // deterministic seed: the k lowest vec_ids (TakeOrderedAndProject —
    // a k-row collect, not a full sort)
    var cents: Array[(Int, Array[Float])] = df
      .orderBy(col("vec_id")).limit(k)
      .select(col("embedding")).as[Array[Float]].collect()
      .zipWithIndex.map { case (v, i) => (i, v) }
    for (_ <- 0 until iters) {
      val means = assignClusters(df, cents)
        .select(col("cluster_id"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getAs[Int]("cluster_id"))
      cents = cents.map { case (cid, old) =>
        byCluster.get(cid) match {
          case Some(rows) =>
            val v = new Array[Float](old.length)
            rows.foreach { r: Row =>
              v(r.getAs[Int]("pos")) = r.getAs[Double]("m").toFloat
            }
            (cid, v)
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Cluster-balanced pruning (Sorscher et al., NeurIPS 2022; the
    * DataComp curation recipe): given an assigned frame with
    * (vec_id, cluster_id, proto_cos = rounded cosine-to-centroid),
    * rank members per cluster by proto_cos ASC (least prototypical
    * kept first — prototypical examples are the redundant ones when
    * data is abundant) and keep a ceil(sqrt(n_c)) quota, so dense
    * clusters are pruned hardest and the kept set is balanced across
    * the embedding space instead of mirroring its density.
    *
    * ONE shuffle: rank, count and quota all ride the same cluster_id
    * window partitioning. Adds cluster_n, rk, quota, is_kept.
    */
  def clusterBalancedSample(assigned: DataFrame): DataFrame = {
    val wCl = Window.partitionBy(col("cluster_id"))
    val wRank = Window.partitionBy(col("cluster_id"))
      .orderBy(col("proto_cos"), col("vec_id"))
    assigned
      .withColumn("cluster_n", count(lit(1)).over(wCl))
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("quota", ceil(sqrt(col("cluster_n"))))
      .withColumn("is_kept", col("rk") <= col("quota"))
  }
}
