package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionColumnNode, ExpressionUtils}

/** Thin bridge into Spark's `private[sql]` Column ⇄ Expression and
  * LogicalPlan ⇄ DataFrame conversions, the standard technique for
  * libraries that ship native Catalyst expressions / custom logical
  * operators on Spark 4.x (where `Column` wraps a `ColumnNode` rather
  * than an `Expression`). Lives under `org.apache.spark.sql` solely
  * for access; contains no logic.
  */
object Bridge {
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — `Dataset.ofRows`
    * for custom operators built from analyzed child plans.
    */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a scalar function builder on a LIVE session's registry —
    * the runtime twin of `SparkSessionExtensions.injectFunction`
    * (which only applies at session build). Used by
    * `graft.GraftFunctions.register`.
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
