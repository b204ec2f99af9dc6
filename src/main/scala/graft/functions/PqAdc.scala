package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** ADC — asymmetric distance computation (Jégou et al., TPAMI 2011
  * §IV.A) — the search-side counterpart of the fused [[PqCodes]]
  * encoder: score PQ codes DIRECTLY against a per-query lookup table
  * instead of reconstructing ĉ = c + concat(codewords) per indexed
  * vector.
  *
  * Why: the reconstruction coarse pass (Pq.reconstruct → coarseSearch)
  * explodes every probed code row ×m, joins the codebook, and
  * re-assembles full float vectors through a groupBy — a probed-set-
  * sized shuffle PER SEARCH BATCH, and the assembled vhat is 8·dim
  * bytes/row, forfeiting at query time the very compression the index
  * paid for. ADC hoists all dim-length arithmetic to the per-query
  * frame: dot(q, ĉ) = dot(q, c) + Σ_s dot(q_s, cw_s[code_s]), where
  * the m·ks sub-dots depend only on (query, codebook) — computed ONCE
  * per query ([[PqLut]], m·ks·dsub madds ≅ one ks-vector scan) — and
  * each indexed row then costs m array lookups ([[AdcSum]]). ‖ĉ‖ is
  * query-independent, so it is computed once at index-build time
  * ([[PqReconNorm]], zero shuffle) and stored beside the codes, as
  * production IP/cosine PQ indexes do. The coarse scan touches only
  * (codes, vn): no explode, no join-per-row arithmetic, no shuffle
  * before the top-C window.
  *
  * Cross-engine determinism: every fold is strictly left-to-right in
  * doubles — LUT sub-dots over k, AdcSum over subspace order, the
  * reconstruction norm over the global dimension index — so the DuckDB
  * oracle replays scores bit-exactly from the persisted codebook
  * (q141 consume-the-model rule). Note the ADC association
  * qc + Σ_s sd_s is NOT floating-point-identical to the reconstruction
  * form Σ_j q_j·ĉ_j (PqAdcSpec pins them equal to 1e-9); the oracle
  * replays the ADC association.
  */
object PqAdc {

  /** Column API: flat m·ks LUT of sub-dot-products of `qe` against the
    * codebook — lut(s·ks + c) = Σ_k qe(s·dsub+k)·cw(s)(c)(k).
    */
  def pqLut(qe: Column, codebook: Seq[(Int, Int, Seq[Double])]): Column =
    graftbridge.column(PqLut(graftbridge.expression(qe), codebook))

  /** Column API: Σ_s lut(s·ks + codes(s)), folded in subspace order. */
  def adcSum(codes: Column, lut: Column): Column =
    graftbridge.column(AdcSum(graftbridge.expression(codes),
      graftbridge.expression(lut)))

  /** Column API: ‖ce + concat(cw[codes])‖ — the reconstruction norm,
    * folded left-to-right over the global dimension index exactly like
    * sqrt(vec_dot(vhat, vhat)) on the assembled vector.
    */
  def pqReconNorm(ce: Column, codes: Column,
                  codebook: Seq[(Int, Int, Seq[Double])]): Column =
    graftbridge.column(PqReconNorm(graftbridge.expression(ce),
      graftbridge.expression(codes), codebook))

  /** Dense [sub][code][dim] view of a (sub, code_id, cw) codebook. */
  private[functions] def dense(codebook: Seq[(Int, Int, Seq[Double])])
      : Array[Array[Array[Double]]] = {
    val m = codebook.map(_._1).max + 1
    val ks = codebook.map(_._2).max + 1
    val a = Array.ofDim[Array[Double]](m, ks)
    codebook.foreach { case (s, c, w) => a(s)(c) = w.toArray }
    require(a.forall(_.forall(_ != null)),
      "codebook must be dense over sub × code_id")
    a
  }

  private[functions] def arrayOfFloatOrDouble(t: DataType): TypeCheckResult =
    t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got $other")
    }
}

/** Per-query ADC lookup table: array<double> of length m·ks. */
case class PqLut(child: Expression,
                 codebook: Seq[(Int, Int, Seq[Double])])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult =
    PqAdc.arrayOfFloatOrDouble(child.dataType)

  @transient private lazy val cb = PqAdc.dense(codebook)
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public so generated code calls it through the reference object. */
  def lut(qe: ArrayData): ArrayData = {
    val m = cb.length
    val ks = cb(0).length
    val dsub = cb(0)(0).length
    require(qe.numElements() == m * dsub,
      s"query length ${qe.numElements()} != m*dsub = ${m * dsub}")
    val out = new Array[Double](m * ks)
    var s = 0
    while (s < m) {
      val off = s * dsub
      var c = 0
      while (c < ks) {
        val w = cb(s)(c)
        var acc = 0.0
        var k = 0
        while (k < dsub) {
          val q = if (isFloat) qe.getFloat(off + k).toDouble
                  else qe.getDouble(off + k)
          acc += q * w(k)
          k += 1
        }
        out(s * ks + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    lut(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLutExpr", this, "graft.functions.PqLut")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.lut($a);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Σ over subspaces of lut[s·ks + codes[s]] — the per-row ADC score
  * term; m primitive array reads inside whole-stage codegen, zero
  * allocation. ks is derived as lut.length / codes.length. Null if
  * the lengths are inconsistent or a code is out of range.
  */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (array<int> codes, array<double> lut), got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val ks = lut.numElements() / m
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ks) return null
      acc += lut.getDouble(s * ks + c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val ks = ctx.freshName("ks")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
        int $m = $a.numElements();
        if ($m == 0 || $b.numElements() % $m != 0) {
          ${ev.isNull} = true;
        } else {
          int $ks = $b.numElements() / $m;
          double $acc = 0.0;
          for (int $s = 0; $s < $m; $s++) {
            int $c = $a.getInt($s);
            if ($c < 0 || $c >= $ks) { ${ev.isNull} = true; break; }
            $acc += $b.getDouble($s * $ks + $c);
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

/** ‖ce + concat(cw[codes])‖ — reconstruction norm without assembling
  * the reconstruction: one fused pass (dim madds), folded left-to-
  * right over the GLOBAL dimension index so the result is bit-
  * identical to sqrt(vec_dot(vhat, vhat)) over the zip_with-assembled
  * vhat (PqAdcSpec pins this). Computed once per indexed vector at
  * build time and stored beside the codes.
  */
case class PqReconNorm(left: Expression, right: Expression,
                       codebook: Seq[(Int, Int, Seq[Double])])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_recon_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    (PqAdc.arrayOfFloatOrDouble(left.dataType), right.dataType) match {
      case (TypeCheckResult.TypeCheckSuccess, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (f: TypeCheckResult.TypeCheckFailure, _) => f
      case (_, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_recon_norm requires array<int> codes, got $r")
    }

  @transient private lazy val cb = PqAdc.dense(codebook)
  @transient private lazy val isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public so generated code calls it through the reference object. */
  def reconNorm(ce: ArrayData, codes: ArrayData): Any = {
    val m = cb.length
    val dsub = cb(0)(0).length
    if (codes.numElements() != m || ce.numElements() != m * dsub) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= cb(s).length) return null
      val w = cb(s)(c)
      val off = s * dsub
      var k = 0
      while (k < dsub) {
        val base = if (isFloat) ce.getFloat(off + k).toDouble
                   else ce.getDouble(off + k)
        val v = base + w(k)
        acc += v * v
        k += 1
      }
      s += 1
    }
    math.sqrt(acc)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    reconNorm(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqReconNormExpr", this,
      "graft.functions.PqReconNorm")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("tmp")
      s"""
        Object $tmp = $ref.reconNorm($a, $b);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Double) $tmp).doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqReconNorm =
    copy(left = newLeft, right = newRight)
}
