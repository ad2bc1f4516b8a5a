package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge.
  *
  * Spark 4 split the public `Column` API from Catalyst: a `Column`
  * wraps a `ColumnNode`, and the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`. Declaring this one object inside an
  * `org.apache.spark.sql` subpackage is the supported-by-the-language
  * way to reach them (the same trick spark-connect and several Spark
  * ecosystem libraries use). Everything else in the engine stays in
  * `graft.*` and goes through this seam.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
