package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** FUSED hashed-n-gram linear scorer — the production fast path of the
  * DSIR gate (ops/Dsir, q161 family). Semantically identical to
  * `featureBucketsFast` (xxhash64 unigram+bigram buckets) fed through
  * [[WeightedTokenSum]] over a DENSE model, but executed as ONE pass
  * over the raw text bytes with zero intermediate allocation:
  *
  *  - tokens are byte spans between 0x20 bytes (safe under UTF-8: no
  *    continuation byte equals 0x20), never materialized as strings;
  *  - unigram buckets hash the span in place
  *    (XXH64.hashUnsafeBytes, seed 42 — exactly Spark's xxhash64);
  *  - bigram buckets hash the CONTIGUOUS byte span [t1 .. t2] when the
  *    tokens are separated by exactly one space — which is the raw
  *    substring and therefore equals xxhash64(t1 || ' ' || t2) — and
  *    fall back to a thread-local scratch join only across multi-space
  *    gaps;
  *  - the model is dense over [0, B), so the weight lookup is a flat
  *    long[] index — no hash table, no boxing, no per-feature bucket
  *    STRING (the Column formulation allocates a decimal string per
  *    feature just to look it up).
  *
  * The md5 (cross-engine oracle) path keeps the Column formulation;
  * DsirSpec pins this expression bit-identical to the unfused xxhash64
  * path, including multi-space, single-token, empty and non-ASCII text.
  */
case class HashedNgramScore(child: Expression, buckets: Int,
                            weights: Array[Long], prior: Long)
    extends UnaryExpression {

  require(weights.length == buckets,
    s"dense model expected: ${weights.length} weights for $buckets buckets")

  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("lr_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_ngram_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_ngram_score requires string, got $t")
  }

  // scratch for bigrams across multi-space gaps; thread-local because
  // one reference object serves every task of the codegen'd stage
  @transient private lazy val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  private def bucketOf(h: Long): Int = {
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }

  private def hashJoined(base: AnyRef, off: Long, s1: Int, e1: Int,
                         s2: Int, e2: Int): Long = {
    val n = (e1 - s1) + 1 + (e2 - s2)
    var buf = scratch.get()
    if (buf.length < n) {
      buf = new Array[Byte](Integer.highestOneBit(n) * 2)
      scratch.set(buf)
    }
    Platform.copyMemory(base, off + s1, buf, Platform.BYTE_ARRAY_OFFSET,
      (e1 - s1).toLong)
    buf(e1 - s1) = ' '.toByte
    Platform.copyMemory(base, off + s2, buf,
      Platform.BYTE_ARRAY_OFFSET + (e1 - s1) + 1, (e2 - s2).toLong)
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, n, 42L)
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
          val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
          total += weights(bucketOf(h))
          nFeats += 1
          if (prevStart >= 0) {
            val bh =
              if (start == prevEnd + 1)
                XXH64.hashUnsafeBytes(base, off + prevStart,
                  i - prevStart, 42L)
              else hashJoined(base, off, prevStart, prevEnd, start, i)
            total += weights(bucketOf(bh))
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
    val ref = ctx.addReferenceObj("hnsExpr", this,
      "graft.functions.HashedNgramScore")
    nullSafeCodeGen(ctx, ev, s => {
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
          $ref.score($s);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedNgramScore =
    copy(child = newChild)
}

object HashedNgramScore {
  /** Column-API entry point. `weights` must be dense over [0, buckets). */
  def hashedNgramScore(text: Column, buckets: Int, weights: Array[Long],
                       prior: Long): Column =
    graftbridge.column(HashedNgramScore(
      graftbridge.expression(text), buckets, weights, prior))
}
