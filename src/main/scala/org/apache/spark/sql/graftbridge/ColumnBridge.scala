package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column↔Expression converters, the
  * sanctioned extension-point pattern for libraries shipping custom
  * Catalyst expressions (the converters live in
  * org.apache.spark.sql.classic.columnNodeSupport in the Spark source).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A one-row one-column DataFrame as a scalar-subquery Column — the
    * shape Spark's own InjectRuntimeFilter uses to carry a bloom
    * filter's bytes into a probe-side predicate without inlining a
    * megabyte binary literal into the plan (and its explain string).
    */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Column =
    ExpressionUtils.column(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed))

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]); the plan must reference resolved child plans.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
