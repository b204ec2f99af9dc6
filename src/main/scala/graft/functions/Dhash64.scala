package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FUSED 64-bit dHash of a payload under the q176/q188 stub decode —
  * the codegen twin of the `dhashPix`/`dhashHalf` Column ladder
  * (TextQueries), which per row materialized the payload's FULL hex
  * string and then ran 128 `conv(substr(hex, 2·⌊i·n/72⌋+1, 2), 16,
  * 10)` parses (64 bits × 2 pixels) plus 64 `when` branches per half —
  * every pixel decode allocating a 2-char substring and a decimal
  * parse of bytes the row already holds. Here the whole grid reads
  * directly from the payload bytes in ONE pass: pixel i is byte
  * ⌊i·n/72⌋ (+ brightness, clamped to 255), bit b (= r·8+c, b ∈
  * [0,64)) is set iff pix(r·9+c) < pix(r·9+c+1) — bit-identical to the
  * ladder's h0 (bits 0–31) and h1 (bits 32–63) packing:
  * h0 = hash & 0xFFFFFFFF, h1 = hash >>> 32, both non-negative.
  *
  * DhashSpec pins the equivalence against the Column formulation over
  * brightness shifts, non-ASCII payloads, and 1-byte inputs. Empty
  * payloads return 0 (both call sites filter octet_length > 0 first —
  * the ladder's behavior on empty input is a null-pixel artifact no
  * row reaches). Index arithmetic uses long multiplication, so
  * payloads past the ladder's 2^31/71-byte int-overflow point get the
  * mathematically-intended byte instead of wrapped-substring junk.
  */
case class Dhash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "dhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dhash64 requires (binary|string, int), got ($l, $r)")
    }

  /** The 8×9-grid difference hash over `n` payload bytes fetched by
    * `at` — shared by the byte[] and UTF8String entry points.
    */
  private def hashOf(n: Int, bright: Int, at: Int => Int): Long = {
    if (n <= 0) return 0L
    var h = 0L
    var b = 0
    while (b < 64) {
      val r = b >> 3
      val c = b & 7
      val i = r * 9 + c
      val p1 = math.min(255, at((i.toLong * n / 72).toInt) + bright)
      val p2 = math.min(255, at(((i + 1).toLong * n / 72).toInt) + bright)
      if (p1 < p2) h |= 1L << b
      b += 1
    }
    h
  }

  def hash(bytes: Array[Byte], bright: Int): Long =
    hashOf(bytes.length, bright, i => bytes(i) & 0xFF)

  def hash(s: UTF8String, bright: Int): Long =
    hashOf(s.numBytes(), bright, i => s.getByte(i) & 0xFF)

  override def nullSafeEval(payload: Any, bright: Any): Any =
    payload match {
      case b: Array[Byte] => hash(b, bright.asInstanceOf[Int])
      case s: UTF8String => hash(s, bright.asInstanceOf[Int])
    }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dhashExpr", this,
      "graft.functions.Dhash64")
    nullSafeCodeGen(ctx, ev, (p, b) => s"${ev.value} = $ref.hash($p, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dhash64 =
    copy(left = newLeft, right = newRight)
}

object Dhash64 {
  /** Column-API entry point: the packed 64-bit dHash; halves are
    * `h & 0xFFFFFFFF` and `h >>> 32`.
    */
  def dhash64(payload: Column, bright: Column): Column =
    graftbridge.column(Dhash64(
      graftbridge.expression(payload), graftbridge.expression(bright)))
}
