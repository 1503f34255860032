/* Bridge into Spark's private[sql] surface. Spark 4 removed the public
 * Column(Expression) constructor; the supported internal path is
 * org.apache.spark.sql.classic.ExpressionUtils. Keeping this single file
 * inside the org.apache.spark.sql package confines the private-API use to
 * one place; everything else in graft stays on the public API. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
