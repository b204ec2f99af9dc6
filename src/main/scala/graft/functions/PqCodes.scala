package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._

/** FUSED product-quantization encoder: given a residual vector
  * (array<double>, length m·dsub) and a broadcast-embedded codebook,
  * emits the m nearest-codeword ids in one codegen pass.
  *
  * Why a custom expression: the relational formulation — explode into
  * (vec, sub) rows, broadcast-join ×ks codewords, argmin via
  * max(struct) — multiplies the corpus by ks before the aggregate,
  * and a struct-typed max lands in a sort aggregate: at 1M vectors ×
  * m=8 × ks=256 that is a 2-billion-row sort. Encoding is
  * embarrassingly per-vector — this expression does the m·ks·dsub
  * multiply-adds in a tight loop with ZERO extra rows, shuffles or
  * allocations (FAISS encodes exactly this way).
  *
  * Semantics locked to [[graft.ops.Pq.assignCodes]] (PqSpec pins the
  * parity): per subspace, d² accumulates left-to-right in doubles and
  * ties break to the SMALLEST code_id — the same fold order the
  * DuckDB oracle replays, so codes are cross-engine bit-exact.
  */
case class PqCodes(child: Expression,
                   codebook: Seq[(Int, Int, Seq[Double])])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<double>, got $t")
  }

  // codebook as [sub][code][dim], dense in both sub and code ids
  @transient lazy val cb: Array[Array[Array[Double]]] = {
    val m = codebook.map(_._1).max + 1
    val ks = codebook.map(_._2).max + 1
    val a = Array.ofDim[Array[Double]](m, ks)
    codebook.foreach { case (s, c, w) => a(s)(c) = w.toArray }
    require(a.forall(_.forall(_ != null)),
      "codebook must be dense over sub × code_id")
    a
  }

  /** Public so the generated code calls it through the reference. */
  def encode(res: ArrayData): ArrayData = {
    val m = cb.length
    val dsub = cb(0)(0).length
    require(res.numElements() == m * dsub,
      s"residual length ${res.numElements()} != m*dsub = ${m * dsub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val codewords = cb(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < codewords.length) {
        val w = codewords(c)
        var d = 0.0
        var k = 0
        while (k < dsub) {
          val x = res.getDouble(off + k) - w(k)
          d += x * x
          k += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict: ties keep lowest id
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodesExpr", this,
      "graft.functions.PqCodes")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $ref.encode($a);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** Column-API entry point; `codebook` rows are (sub, code_id, cw). */
  def pqCodes(res: Column, codebook: Seq[(Int, Int, Seq[Double])]): Column =
    graftbridge.column(PqCodes(graftbridge.expression(res), codebook))
}
