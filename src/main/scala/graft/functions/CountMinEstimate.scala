package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point query against a serialized Count-Min sketch (the binary
  * produced by Spark's built-in `count_min_sketch` aggregate) as a
  * native Catalyst expression.
  *
  * Spark ships the sketch BUILDER as an aggregate but no in-plan way to
  * QUERY one — reading a sketch back normally means driver-side
  * deserialization, which would force an eager collect into query
  * construction (the q116 lesson: plan building must stay lazy).
  * This expression keeps the probe inside the plan: join the (few,
  * group-keyed) sketch rows to the probe keys and estimate scan-side.
  *
  * The per-row `readFrom` deserialization is bounded by use: probes sit
  * on group-cardinality frames (one sketch per group × k probe keys),
  * never on the event stream itself. The reference engine has no
  * sketches at all; this is part of the additive profiling surface
  * (SURVEY §2.11 tier), done the Catalyst-native way (Expression >
  * UDF), same rationale as [[DotProductLong]].
  */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs (binary, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(sk: Any, item: Any): Any =
    CountMinEstimate.estimate(sk.asInstanceOf[Array[Byte]], item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, item) =>
      s"${ev.value} = graft.functions.CountMinEstimate.estimate($sk, $item);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {

  /** Static probe shared by interpreted eval and codegen. */
  def estimate(sketch: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(java.lang.Long.valueOf(item))

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-level API: estimated count of `item` in the serialized
    * count-min `sketch`.
    */
  def cms_estimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(CountMinEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
