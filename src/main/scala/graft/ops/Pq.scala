package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorExpressions.vecDot

/** TRUE product quantization (Jégou, Douze & Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011 §III) on IVF
  * residuals — the codebook upgrade of [[IvfPq]]'s scalar quantizer:
  * the residual v − c is split into `m` sub-vectors and each sub-vector
  * is replaced by the id of its nearest codeword from a PER-SUBSPACE
  * k-means codebook (ks codewords), so a vector stores m small ints
  * (m bytes at ks=256) plus its cluster id against 4·dim bytes of
  * float — dim/2·m the compression of the int8-scalar path, with
  * recall recovered by exact re-rank over the coarse top-C exactly as
  * in q150.
  *
  * Codebook training is DISTRIBUTED and deterministic: all m subspaces
  * train simultaneously in one frame — ASSIGN is a broadcast join of
  * the (m·ks)-row codebook against the (vec, sub) rows with the
  * codegen'd VecDot L2, argmin as a partial-aggregating max(struct)
  * (ties to the smallest code_id, the assignClusters trick — the
  * exchange carries one row per (vec, sub), never the ×ks join
  * output); UPDATE is posexplode → groupBy(sub, code, pos) avg with a
  * (m·ks·dsub)-row collect — the only driver-side data is the codebook
  * itself (16 KB at m=8, ks=256, dsub=8). Init = sub-vectors of the ks
  * lowest vec_ids per subspace.
  *
  * Everything downstream of the persisted codebook is replayable
  * cross-engine: encode (L2 argmin, same left-to-right double fold in
  * both engines), reconstruction ĉ = c + concat(cw_0…cw_{m−1}), coarse
  * ranking and exact re-rank — the oracle CONSUMES the codebook
  * parquet (q141 rule) and re-derives codes, reconstructions and the
  * final top-k bit-exactly.
  */
object Pq {

  /** Residual sub-vector rows of an assigned frame: (vec_id,
    * cluster_id, sub, subres array<double>). `assigned` needs
    * (vec_id, embedding, cluster_id); `centDf` (cluster_id, ce).
    * dim must divide evenly into `m` subspaces.
    */
  def subResiduals(assigned: DataFrame, centDf: DataFrame,
                   m: Int): DataFrame = {
    val res = zip_with(col("embedding"), col("ce"),
      (v, c) => v.cast(DoubleType) - c.cast(DoubleType))
    assigned
      .join(broadcast(centDf.select(col("cluster_id"), col("ce"))),
        Seq("cluster_id"))
      .withColumn("res", res)
      .withColumn("dsub", (size(col("res")) / m).cast(IntegerType))
      .select(col("vec_id"), col("cluster_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("res"), col("dsub"))
      .select(col("vec_id"), col("cluster_id"), col("sub"),
        slice(col("res"), col("sub") * col("dsub") + 1, col("dsub"))
          .as("subres"))
  }

  /** Nearest codeword per (vec_id, sub): broadcast codebook join on
    * sub, L2 distance, ties to the smallest code_id. The argmin is a
    * partial-aggregating max(struct) — map-side combine reduces the
    * ×ks join output to one row per (vec, sub) before any exchange.
    * Keeps cluster_id and subres as payload.
    */
  def assignCodes(sub: DataFrame, codebook: DataFrame): DataFrame = {
    val diff = zip_with(col("subres"), col("cw"), (a, b) => a - b)
    sub
      .join(broadcast(codebook.select(col("sub"), col("code_id"),
        col("cw"))), Seq("sub"))
      .withColumn("__d2", vecDot(diff, diff))
      .groupBy(col("vec_id"), col("cluster_id"), col("sub"))
      .agg(max(struct((-col("__d2")).as("nd"), (-col("code_id")).as("nc"),
        col("subres").as("sr"))).as("b"))
      .select(col("vec_id"), col("cluster_id"), col("sub"),
        (-col("b.nc")).cast(IntegerType).as("code_id"),
        col("b.sr").as("subres"))
  }

  private def cbToDf(spark: SparkSession,
                     cb: Array[(Int, Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cb.toSeq.toDF("sub", "code_id", "cw")
  }

  /** Train per-subspace codebooks (`ks` codewords each) with `iters`
    * Lloyd rounds over the (vec_id, cluster_id, sub, subres) frame.
    * Deterministic: init from the ks lowest vec_ids per subspace,
    * argmin ties to the smallest code_id, exact double means; an
    * empty codeword keeps its previous value. Returns (sub, code_id,
    * cw) — persist with [[graft.etl.Load.replaceTable]].
    */
  def trainCodebooks(spark: SparkSession, sub: DataFrame, ks: Int,
                     iters: Int): DataFrame = {
    val wInit = Window.partitionBy(col("sub")).orderBy(col("vec_id"))
    var cb: Array[(Int, Int, Array[Double])] = sub
      .withColumn("rn", row_number().over(wInit))
      .filter(col("rn") <= ks)
      .select(col("sub"), (col("rn") - 1).cast(IntegerType).as("code_id"),
        col("subres"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]]("subres").toArray))
    for (_ <- 0 until iters) {
      val means = assignCodes(sub, cbToDf(spark, cb))
        .select(col("sub"), col("code_id"),
          posexplode(col("subres")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("code_id"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .collect() // m·ks·dsub rows — the codebook itself, driver-sized
      val byKey = means.groupBy(r =>
        (r.getAs[Int]("sub"), r.getAs[Int]("code_id")))
      cb = cb.map { case (s, c, old) =>
        byKey.get((s, c)) match {
          case Some(rows) =>
            val v = new Array[Double](old.length)
            rows.foreach { r: Row =>
              v(r.getAs[Int]("pos")) = r.getAs[Double]("m")
            }
            (s, c, v)
          case None => (s, c, old) // empty codeword keeps its value
        }
      }
    }
    cbToDf(spark, cb).coalesce(1)
  }

  /** PQ index rows: (vec_id, cluster_id, codes array<int>) — m code
    * ids per vector, ordered by subspace. This IS the resident search
    * payload: m bytes at ks=256 against 4·dim float bytes.
    *
    * Encoding is the FUSED [[graft.functions.PqCodes]] expression —
    * one codegen pass doing the m·ks·dsub multiply-adds per vector
    * with zero extra rows (the relational explode→join→argmin form
    * multiplies the corpus ×ks and lands a struct-max in a SORT
    * aggregate: 2B sorted rows at 1M vectors, ks=256 — it OOMs long
    * before a cluster would bother). PqSpec pins the expression
    * bit-identical to [[assignCodes]].
    */
  /** Bounded collect of a (sub, code_id, cw) codebook table — m·ks
    * rows, the model itself — into the Seq form the fused expressions
    * embed.
    */
  def collectCodebook(codebook: DataFrame): Seq[(Int, Int, Seq[Double])] =
    codebook
      .select(col("sub"), col("code_id"), col("cw"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]]("cw").toSeq))
      .toSeq

  def encode(assigned: DataFrame, centDf: DataFrame,
             codebook: DataFrame,
             extraCols: Seq[String] = Nil): DataFrame = {
    val cbSeq = collectCodebook(codebook)
    val res = zip_with(col("embedding"), col("ce"),
      (v, c) => v.cast(DoubleType) - c.cast(DoubleType))
    assigned
      .join(broadcast(centDf.select(col("cluster_id"), col("ce"))),
        Seq("cluster_id"))
      .select(col("vec_id") +: col("cluster_id") +:
        graft.functions.PqCodes.pqCodes(res, cbSeq).as("codes") +:
        extraCols.map(col): _*)
  }

  /** Reconstruction ĉ = centroid + concat(codewords): join the m code
    * ids back to the broadcast codebook, splice in subspace order,
    * add the coarse centroid. Output (vec_id, cluster_id, vhat).
    */
  def reconstruct(index: DataFrame, codebook: DataFrame,
                  centDf: DataFrame): DataFrame =
    index
      .select(col("vec_id"), col("cluster_id"),
        posexplode(col("codes")).as(Seq("sub", "code_id")))
      .join(broadcast(codebook.select(col("sub"), col("code_id"),
        col("cw"))), Seq("sub", "code_id"))
      .groupBy(col("vec_id"), col("cluster_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("cw")))),
        x => x.getField("cw"))).as("rq"))
      .join(broadcast(centDf.select(col("cluster_id"), col("ce"))),
        Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"),
        zip_with(col("ce"), col("rq"),
          (c, r) => c.cast(DoubleType) + r).as("vhat"))

  /** ADC-ready index: the PQ [[encode]] output plus the query-
    * independent reconstruction norm ‖ĉ‖, computed by the fused
    * [[graft.functions.PqReconNorm]] expression in one zero-shuffle
    * pass (the only join is the broadcast centroid frame). Persist
    * this beside the codes: at search time the coarse scan then never
    * assembles a float vector — [[reconstruct]]'s explode → codebook
    * join → groupBy re-assembly (a probed-set-sized shuffle per search
    * batch) disappears entirely.
    */
  def adcIndex(index: DataFrame, centDf: DataFrame,
               codebook: Seq[(Int, Int, Seq[Double])],
               extraCols: Seq[String] = Nil): DataFrame =
    index
      .join(broadcast(centDf.select(col("cluster_id"), col("ce"))),
        Seq("cluster_id"))
      .select(col("vec_id") +: col("cluster_id") +: col("codes") +:
        graft.functions.PqAdc.pqReconNorm(col("ce"), col("codes"), codebook)
          .as("vn") +: extraCols.map(col): _*)

  /** Per-probe ADC query state: the [[IvfPq.probeRoute]] output plus
    * qc = dot(q, centroid) and the m·ks sub-dot LUT — ALL dim-length
    * arithmetic of the coarse pass, hoisted onto the (nq·nprobe)-row
    * probe frame. The LUT costs m·ks·dsub madds per probe row (≅ one
    * scan of ks full vectors) and is reused across every indexed row
    * of the probed cluster.
    */
  def probeLuts(probes: DataFrame, centDf: DataFrame,
                codebook: Seq[(Int, Int, Seq[Double])]): DataFrame =
    probes
      .join(broadcast(centDf.select(col("cluster_id"), col("ce"))),
        Seq("cluster_id"))
      .select(col("query_id"), col("qe"), col("qn"), col("cluster_id"),
        vecDot(col("qe"), col("ce")).as("qc"),
        graft.functions.PqAdc.pqLut(col("qe"), codebook).as("lut"))

  /** ADC coarse pass (Jégou et al. 2011 §IV.A): score the codes
    * directly — per indexed row, m primitive lookups
    * ([[graft.functions.AdcSum]]) plus one divide:
    * cos ≈ (qc + Σ_s lut[s·ks+code_s]) / (qn · vn). No explode, no
    * reconstruction, no shuffle before the top-C window; the scan
    * reads only (codes, vn) — the compressed payload the index paid
    * for. Output shape matches [[coarseSearch]] → [[IvfPq.rerank]].
    *
    * The ADC association qc + Σ sd differs from the reconstruction
    * form Σ_j q_j·ĉ_j only in floating-point rounding (PqAdcSpec pins
    * 1e-9 agreement); the q170 oracle replays the ADC association
    * bit-exactly.
    */
  def adcSearch(adcIdx: DataFrame, probeLut: DataFrame,
                topC: Int): DataFrame = {
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    adcIdx.join(broadcast(probeLut), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("qn"),
        col("vec_id").as("neighbor_id"),
        ((col("qc") + graft.functions.PqAdc.adcSum(col("codes"), col("lut")))
          / (col("qn") * col("vn"))).as("approx"))
      .withColumn("__cr", row_number().over(wCoarse))
      .filter(col("__cr") <= topC)
      .drop("__cr")
  }

  /** Threshold variant of [[adcSearch]] — the screening shape for
    * semantic decontamination / near-duplicate FLAGGING, where the
    * contract is "everything approximately above τ", not a top-k
    * window: same LUT scoring, but candidates pass by
    * approx ≥ `tauPre` instead of rank. ZERO exchanges — without the
    * per-query window even the rank shuffle disappears; the scan
    * reads only (codes, vn) inside the probed clusters and the filter
    * is pure map-side expression work. `tauPre` is the loose ADC
    * pre-threshold; callers verify survivors EXACTLY (one bounded
    * embedding join) against the real τ — the standard
    * screen-then-verify contract.
    */
  def adcScreen(adcIdx: DataFrame, probeLut: DataFrame,
                tauPre: Double): DataFrame =
    adcIdx.join(broadcast(probeLut), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("qn"),
        col("vec_id").as("neighbor_id"),
        ((col("qc") + graft.functions.PqAdc.adcSum(col("codes"), col("lut")))
          / (col("qn") * col("vn"))).as("approx"))
      .filter(col("approx") >= tauPre)

  /** Coarse pass over PQ reconstructions: cosine of query vs ĉ inside
    * probed clusters, top-`topC` per query — the float table is never
    * touched; feed the output to [[IvfPq.rerank]] for the exact top-k.
    */
  def coarseSearch(recon: DataFrame, probes: DataFrame,
                   topC: Int): DataFrame = {
    val qeD = transform(col("qe"), _.cast(DoubleType))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id"))
    recon.join(broadcast(probes), Seq("cluster_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qe"), col("qn"),
        col("vec_id").as("neighbor_id"),
        (vecDot(qeD, col("vhat")) /
          (col("qn") * sqrt(vecDot(col("vhat"), col("vhat")))))
          .as("approx"))
      .withColumn("__cr", row_number().over(wCoarse))
      .filter(col("__cr") <= topC)
      .drop("__cr")
  }
}
