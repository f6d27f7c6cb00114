package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 hides the Column↔Expression conversion behind
  * `private[sql] ExpressionUtils` (columnNodeSupport.scala); this object
  * lives under `org.apache.spark.sql` solely to re-export those two
  * functions to graft code. No other internals are touched.
  */
object Internals {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
