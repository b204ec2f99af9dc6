package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved Column onto ColumnNode; ExpressionUtils is the supported
  * internal shim). Lives in the spark package solely to satisfy the
  * access modifier — the common pattern for third-party expression
  * libraries.
  */
object graftbridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
