package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProductLong

/** Session extensions registering the engine's native functions for SQL
  * use. Install with
  * `spark.sql.extensions=graft.GraftExtensions` or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_product_long"),
      exprs => DotProductLong(exprs.head, exprs(1))))
    e.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
  }
}

object GraftExtensions {
  /** Register on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_long", exprs => DotProductLong(exprs.head, exprs(1)), "built-in")
}
