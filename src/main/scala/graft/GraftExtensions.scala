package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{BpeApply, CountMinEstimate, DotProductLong, MinHashWindows, MinShingleMd5, ShingleSet, SimHash16, TopKByLong}

/** Session extensions registering the engine's native functions for SQL
  * use. Install with
  * `spark.sql.extensions=graft.GraftExtensions` or call
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{litInt, builders}

  override def apply(e: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(getClass.getName, name), b))
    }
    e.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
    e.injectOptimizerRule(s => new graft.plans.RewriteToMv(s))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def litInt(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product_long" -> (exprs => DotProductLong(exprs.head, exprs(1))),
    "min_shingle_md5" -> (exprs =>
      MinShingleMd5(exprs.head, litInt(exprs(1), "shingle size"))),
    "shingle_set" -> (exprs =>
      ShingleSet(exprs.head, litInt(exprs(1), "shingle size"))),
    "min_hash_windows" -> (exprs =>
      MinHashWindows(exprs.head, litInt(exprs(1), "salts"), litInt(exprs(2), "windows"))),
    "simhash16" -> (exprs => SimHash16(exprs.head)),
    "bpe_apply" -> (exprs => BpeApply(exprs.head, exprs(1))),
    "cms_estimate" -> (exprs => CountMinEstimate(exprs.head, exprs(1))),
    "topk_by" -> (exprs =>
      TopKByLong(exprs.head, exprs(1), litInt(exprs(2), "k"))
        .toAggregateExpression()))

  /** Register on an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies ++= Seq(graft.plans.AsOfJoinStrategy)
    // MV substitution (q298): as an extra optimization it runs AFTER
    // scan pushdown, which is why RewriteToMv also matches the
    // post-pushdown DataSourceV2ScanRelation shape
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.RewriteToMv]))
      spark.experimental.extraOptimizations ++=
        Seq(new graft.plans.RewriteToMv(spark))
  }
}
