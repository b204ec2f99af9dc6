package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** FUSED md5 hashed-n-gram linear scorer — the ORACLE-EXACT twin of
  * [[HashedNgramScore]] for the DSIR gate's cross-engine hash
  * (`conv(substring(md5(f), 1, 8), 16, 10) % B` — DuckDB replays it as
  * `CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % B`). Semantically
  * identical to `Dsir.featureBuckets` fed through [[WeightedTokenSum]]
  * over a DENSE model, but executed as ONE pass over the text bytes:
  *
  *  - tokens are byte spans between 0x20 bytes (exactly
  *    `filter(split(text, " "), length > 0)` — no UTF-8 continuation
  *    byte equals 0x20);
  *  - each unigram/bigram digests through a thread-local reused
  *    MessageDigest; the bucket is the digest's first 4 bytes read as
  *    an unsigned 32-bit int mod B — bit-equal to the Column ladder's
  *    hex-substring parse, without materializing the hex string, the
  *    feature string, or the per-feature decimal bucket STRING the
  *    Column form allocated just to probe [[WeightedTokenSum]]'s hash
  *    table;
  *  - the model is dense over [0, B): flat long[] index, no hash table.
  *
  * The bigram feature "t1 t2" digests the contiguous input span when
  * the tokens are separated by exactly one space (those bytes ARE
  * t1 ++ ' ' ++ t2) and a scratch-joined copy across multi-space gaps
  * — the [[HashedNgramScore]] discipline. DsirSpec pins this
  * expression bit-identical to the unfused md5 Column formulation,
  * including multi-space, single-token, empty and non-ASCII text.
  */
case class Md5NgramScore(child: Expression, buckets: Int,
                         weights: Array[Long], prior: Long)
    extends UnaryExpression {

  require(weights.length == buckets,
    s"dense model expected: ${weights.length} weights for $buckets buckets")

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("lr_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "md5_ngram_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_ngram_score requires string, got $t")
  }

  // reused per thread: the digest instance, its 16-byte output, and a
  // scratch buffer features are copied into before digesting
  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  @transient private lazy val out = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }
  @transient private lazy val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  private def grow(n: Int): Array[Byte] = {
    var buf = scratch.get()
    if (buf.length < n) {
      buf = new Array[Byte](Integer.highestOneBit(n) * 2)
      scratch.set(buf)
    }
    buf
  }

  /** Bucket of the scratch buffer's first `n` bytes: first 4 md5
    * digest bytes as an unsigned 32-bit value, mod B — exactly
    * `conv(substring(md5(f), 1, 8), 16, 10) % B`.
    */
  private def bucketOf(buf: Array[Byte], n: Int): Int = {
    val d = md5.get()
    d.reset()
    d.update(buf, 0, n)
    val o = out.get()
    d.digest(o, 0, 16)
    val u32 = ((o(0) & 0xFFL) << 24) | ((o(1) & 0xFFL) << 16) |
      ((o(2) & 0xFFL) << 8) | (o(3) & 0xFFL)
    (u32 % buckets).toInt
  }

  /** The full fold — public so the generated code can call it through
    * the expression reference object.
    */
  def score(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var i = 0
    var start = 0
    var nFeats = 0L
    var total = prior
    var prevStart = -1
    var prevEnd = -1
    while (i <= len) {
      val isSpace = i == len || Platform.getByte(base, off + i) == 0x20
      if (isSpace) {
        if (i > start) { // non-empty token span [start, i)
          val n1 = i - start
          var buf = grow(n1)
          Platform.copyMemory(base, off + start, buf,
            Platform.BYTE_ARRAY_OFFSET, n1.toLong)
          total += weights(bucketOf(buf, n1))
          nFeats += 1
          if (prevStart >= 0) {
            val nb =
              if (start == prevEnd + 1) {
                // contiguous "t1 t2": the raw span IS the feature bytes
                val n = i - prevStart
                buf = grow(n)
                Platform.copyMemory(base, off + prevStart, buf,
                  Platform.BYTE_ARRAY_OFFSET, n.toLong)
                n
              } else {
                val n = (prevEnd - prevStart) + 1 + n1
                buf = grow(n)
                Platform.copyMemory(base, off + prevStart, buf,
                  Platform.BYTE_ARRAY_OFFSET, (prevEnd - prevStart).toLong)
                buf(prevEnd - prevStart) = ' '.toByte
                Platform.copyMemory(base, off + start, buf,
                  Platform.BYTE_ARRAY_OFFSET + (prevEnd - prevStart) + 1,
                  n1.toLong)
                n
              }
            total += weights(bucketOf(buf, nb))
            nFeats += 1
          }
          prevStart = start
          prevEnd = i
        }
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nFeats, total))
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mnsExpr", this,
      "graft.functions.Md5NgramScore")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
          $ref.score($s);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5NgramScore =
    copy(child = newChild)
}

object Md5NgramScore {
  /** Column-API entry point. `weights` must be dense over [0, buckets). */
  def md5NgramScore(text: Column, buckets: Int, weights: Array[Long],
                    prior: Long): Column =
    graftbridge.column(Md5NgramScore(
      graftbridge.expression(text), buckets, weights, prior))
}
