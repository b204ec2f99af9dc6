package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass linear-model scorer over a token array: returns
  * struct(n_tokens, n_hits, margin_micro) where margin_micro =
  * `prior` + Σ weight(token) over in-vocab tokens, using a REAL hash
  * table for the vocabulary.
  *
  * Why a custom expression: the Column-API formulation
  * (`element_at(mapLiteral, t)` inside `aggregate`/`filter`) performs
  * a LINEAR scan of the map literal per lookup — Spark's
  * GetMapValue on a literal map is O(V) — and walks the token array
  * three times (size + filter-count + aggregate). At V=512 weights ×
  * 30 tokens × 1M docs that is ~1.5·10¹⁰ string comparisons per
  * scoring pass. This expression embeds the weight table as a
  * reference object (`java.util.HashMap` keyed by UTF8String — O(1)
  * lookups on the zero-copy tokens) and folds count, hit count and
  * margin in ONE traversal, inside whole-stage codegen.
  *
  * Semantics (locked to the Column formulation it replaces): empty
  * tokens are skipped entirely (the upstream `filter(length > 0)`),
  * null elements are skipped, OOV tokens count toward n_tokens but
  * add no weight; a null array yields a null struct.
  */
case class WeightedTokenSum(child: Expression, weights: Map[String, Long],
                            prior: Long) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("margin_micro", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "weighted_token_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"weighted_token_sum requires array<string>, got $t")
  }

  @transient private lazy val table: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](weights.size * 2)
    weights.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v))
    }
    m
  }

  private def score(arr: ArrayData): InternalRow = {
    val len = arr.numElements()
    var n = 0L; var hits = 0L; var margin = prior
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) {
          n += 1
          val w = table.get(t)
          if (w != null) { hits += 1; margin += w.longValue() }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, hits, margin))
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wtsTable", table,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String,java.lang.Long>")
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len")
      val n = ctx.freshName("n")
      val hits = ctx.freshName("hits")
      val margin = ctx.freshName("margin")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val w = ctx.freshName("w")
      s"""
        int $len = $a.numElements();
        long $n = 0L; long $hits = 0L; long $margin = ${prior}L;
        for (int $i = 0; $i < $len; $i++) {
          if (!$a.isNullAt($i)) {
            org.apache.spark.unsafe.types.UTF8String $t = $a.getUTF8String($i);
            if ($t.numBytes() > 0) {
              $n++;
              java.lang.Long $w = (java.lang.Long) $tableRef.get($t);
              if ($w != null) { $hits++; $margin += $w.longValue(); }
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          new Object[]{java.lang.Long.valueOf($n),
            java.lang.Long.valueOf($hits), java.lang.Long.valueOf($margin)});
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WeightedTokenSum =
    copy(child = newChild)
}

object WeightedTokenSum {
  /** Column-API entry point. */
  def weightedTokenSum(tokens: Column, weights: Map[String, Long],
                       prior: Long): Column =
    graftbridge.column(WeightedTokenSum(
      graftbridge.expression(tokens), weights, prior))
}
