package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorExpressions.vecDot

/** Memory-bounded ANN: IVF with int8-RESIDUAL scalar quantization —
  * the IVF-PQ/SQ shape (Jégou et al. 2011's coarse+residual split with
  * a scalar quantizer). The operator behind q150, shared with the
  * Stress 1M-vector A/B.
  *
  * Why residuals: after subtracting the assigned centroid the vector
  * that remains is SMALL, so 8 bits of residual (per-vector max-abs
  * scale) carry far more precision than 8 bits of the raw value —
  * coarse ranking from the reconstruction ĉ = centroid + q·scale/127
  * is accurate enough that an exact re-rank over only the top-C
  * coarse candidates recovers the true top-k.
  *
  * Scale shape: the quantized index stores (int8[dim] + 1 double
  * scale) per vector — ~dim bytes against 4·dim for floats, so the
  * resident search set shrinks ~4× (parquet bit-packs the small ints;
  * the Stress phase records the actual on-disk ratio). The coarse
  * pass touches ONLY the quantized table (broadcast-joined against
  * the probe list); the float table is read back for C rows per query
  * via an id join. All quantized math is integer-derived double
  * arithmetic in a fixed fold order, so candidate sets — and
  * therefore the re-ranked top-k — replay bit-exactly cross-engine.
  */
object IvfPq {

  /** Quantized index rows from cluster-assigned vectors.
    * `assigned` needs (vec_id, embedding, cluster_id); `centDf` is the
    * broadcast-sized model frame (cluster_id, ce). Output:
    * (vec_id, cluster_id, ce, maxabs, qr int8-valued ints).
    */
  def quantizeIndex(assigned: DataFrame, centDf: DataFrame): DataFrame = {
    val res = zip_with(col("embedding"), col("ce"),
      (v, c) => v.cast(DoubleType) - c.cast(DoubleType))
    assigned.join(broadcast(centDf.select(col("cluster_id"), col("ce"))),
        Seq("cluster_id"))
      .withColumn("res", res)
      .withColumn("maxabs", array_max(transform(col("res"), abs(_))))
      .withColumn("qr", when(col("maxabs") > 0,
          transform(col("res"), x =>
            floor(x * 127.0 / col("maxabs") + 0.5).cast(IntegerType)))
        .otherwise(transform(col("res"), _ => lit(0))))
      .select(col("vec_id"), col("cluster_id"), col("ce"),
        col("maxabs"), col("qr"))
  }

  /** Route each query to its `nprobe` max-cosine centroids at full
    * precision (the model is broadcast-sized). `q` needs
    * (query_id, qe, qn); `centDf` needs (cluster_id, ce, cn).
    */
  def probeRoute(q: DataFrame, centDf: DataFrame, nprobe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__csim").desc, col("cluster_id"))
    q.crossJoin(broadcast(centDf))
      .withColumn("__csim",
        vecDot(col("qe"), col("ce")) / (col("qn") * col("cn")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qe"), col("qn"), col("cluster_id"))
  }

  /** Coarse pass: score probed clusters' candidates against the
    * RECONSTRUCTION only (centroid + int8 residual · scale — never the
    * float table), keep top-`topC` per query. Output keeps (query_id,
    * qe, qn, neighbor_id, approx) for the re-rank join.
    */
  def coarseSearch(index: DataFrame, probes: DataFrame,
                   topC: Int): DataFrame = {
    val vhat = zip_with(col("ce"), col("qr"),
      (c, qv) => c.cast(DoubleType) +
        qv.cast(DoubleType) * col("maxabs") / 127.0)
    val qeD = transform(col("qe"), _.cast(DoubleType))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    index.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("vh", vhat)
      .select(col("query_id"), col("qe"), col("qn"),
        col("vec_id").as("neighbor_id"),
        (vecDot(qeD, col("vh")) /
          (col("qn") * sqrt(vecDot(col("vh"), col("vh"))))).as("approx"))
      .withColumn("__cr", row_number().over(wCoarse))
      .filter(col("__cr") <= topC)
  }

  /** Exact re-rank: join ONLY the coarse candidates back to the
    * full-precision table `e` (vec_id, embedding, nrm), exact cosine
    * top-`topK`. Output: (query_id, neighbor_id, coarse_cosine,
    * cosine, rank).
    */
  def rerank(cand: DataFrame, e: DataFrame, topK: Int): DataFrame = {
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    cand.join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding"), col("nrm")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("approx"), 6).as("coarse_cosine"),
        round(vecDot(col("qe"), col("embedding")) /
          (col("qn") * col("nrm")), 6).as("cosine"))
      .withColumn("rank", row_number().over(wRank).cast(LongType))
      .filter(col("rank") <= topK)
  }
}
