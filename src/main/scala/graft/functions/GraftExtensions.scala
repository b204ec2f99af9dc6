package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the library's native expressions, both ways
  * Spark supports:
  *
  *  - cluster deploy: `--conf spark.sql.extensions=graft.functions.
  *    GraftExtensions` injects them at session build time;
  *  - live session: `GraftExtensions.registerAll(spark)` adds them to
  *    the running session's function registry.
  *
  * After either, `SELECT vec_dot(a, b)`, `simhash32(...)`,
  * `word_shingles(...)` work from SQL text as well as the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptions.foreach(ext.injectFunction)
    // whole-operator extension: plans graft.plans.AsofJoinPlan
    // (AsofJoin.asof also self-registers on live sessions)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofColumnPruning)
  }
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getName, name)

  private val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"), info("vec_dot", classOf[VecDot]),
      { args: Seq[Expression] =>
        require(args.length == 2, "vec_dot(a, b) takes 2 arguments")
        VecDot(args.head, args(1))
      }),
    (FunctionIdentifier("simhash32"), info("simhash32", classOf[SimHash32]),
      { args: Seq[Expression] =>
        require(args.length == 1, "simhash32(hashes) takes 1 argument")
        SimHash32(args.head)
      }),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", classOf[WordShingles]),
      { args: Seq[Expression] =>
        require(args.length == 1, "word_shingles(tokens) takes 1 argument")
        WordShingles(args.head, 3)
      }),
    (FunctionIdentifier("sign_projection"),
      info("sign_projection", classOf[SignProjection]),
      { args: Seq[Expression] =>
        require(args.length == 2,
          "sign_projection(vec, bits) takes 2 arguments")
        val bits = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case e => throw new IllegalArgumentException(
            s"sign_projection bits must be an integer literal, got $e")
        }
        SignProjection(args.head, bits)
      }))

  /** Register on a live session (tests, spark-shell). */
  def registerAll(spark: SparkSession): Unit =
    descriptions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
