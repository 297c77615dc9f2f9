package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4 hid the Expression-backed Column constructor
  * behind `private[sql]` (`ExpressionUtils` in classic/columnNodeSupport);
  * this shim lives under `org.apache.spark.sql` solely to re-export the
  * two conversions — the standard extension-library pattern.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
