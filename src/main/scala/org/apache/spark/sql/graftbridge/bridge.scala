package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Thin bridge into Spark's `private[sql]` Column ⇄ Expression
  * conversions, the standard technique for libraries that ship native
  * Catalyst expressions on Spark 4.x (where `Column` wraps a
  * `ColumnNode` rather than an `Expression`). Lives under
  * `org.apache.spark.sql` solely for access; contains no logic.
  */
object Bridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
