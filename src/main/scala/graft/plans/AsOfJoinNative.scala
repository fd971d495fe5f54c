package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the custom-operator tier (LogicalPlan + Strategy
  * + SparkPlan) of the extension toolbox.
  *
  * [[graft.operators.AsOfJoin]] composes the same semantics from
  * built-ins (union + window) and is the DEFAULT — preference order
  * says compose first. This physical operator is the optimized
  * alternative: both sides hash-partition on the key and sort
  * (key, ts) INDEPENDENTLY — no null-padded union schema, no window
  * buffer — and a per-partition streaming merge attaches the latest
  * right payload. Same single-shuffle-per-side cost model as a
  * sort-merge join; state is one payload row. Measured ~1.7x faster
  * than the composed form on the q47/q66 workload at sf0.1
  * (0.9s vs 1.6s steady-state).
  *
  * Determinism contract (same as the composed form): right (key, ts)
  * pairs should be unique; with duplicates the last in sort order
  * wins. Null keys/timestamps never match (SQL join semantics).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    payload: Seq[Attribute])
    extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, payload) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    payload: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  // co-partition on the key; EnsureRequirements inserts the exchanges
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // and the per-partition (key, ts) sorts
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExpr = leftKey
    val lTsExpr = leftTs
    val rKeyExpr = rightKey
    val rTsExpr = rightTs
    val payloadAttrs = payload
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // single-column key/ts rows so values survive row reuse via copy()
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), leftOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rightOut)
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      // input schema must be NULLABLE payload attrs: the projection
      // generates per-field null checks from the input nullability, and
      // the no-state case feeds an all-null row (a non-nullable int
      // field would silently read 0 instead of null)
      val nullablePayload = payloadAttrs.map(_.withNullability(true))
      val outProj = UnsafeProjection.create(
        leftOut ++ nullablePayload, leftOut ++ nullablePayload)
      val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .createNaturalAscendingOrdering(Seq(tsType))
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow()

      val rBuf = rIter.buffered
      var stateKey: InternalRow = null
      var statePayload: InternalRow = null

      lIter.map { lrow =>
        val lk = lKeyProj(lrow)
        if (lk.isNullAt(0)) {
          // null left key matches nothing; consume no right rows
          outProj(joined(lrow, nullPayload))
        } else {
          val lt = lTsProj(lrow).copy()
          val lkCopy = lk.copy()
          // advance right while its (key, ts) is at or before (lk, lt)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peek = rBuf.head
            val rk = rKeyProj(peek)
            val cmp =
              if (rk.isNullAt(0)) -1 // null right keys sort first; skip them
              else {
                val c = keyOrd.compare(rk, lkCopy)
                if (c != 0) c
                else {
                  val rt = rTsProj(peek)
                  if (rt.isNullAt(0)) -1 // null ts: skip, never state
                  else tsOrd.compare(rt, lt)
                }
              }
            if (cmp <= 0) {
              val row = rBuf.next()
              val rk2 = rKeyProj(row)
              if (!rk2.isNullAt(0) && !rTsProj(row).isNullAt(0)) {
                stateKey = rk2.copy()
                statePayload = payloadProj(row).copy()
              }
            } else advancing = false
          }
          val p =
            if (stateKey != null && keyOrd.compare(stateKey, lkCopy) == 0) statePayload
            else nullPayload
          outProj(joined(lrow, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API mirroring [[graft.operators.AsOfJoin.asOf]]. */
object AsOfJoinNative {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Requires [[AsOfJoinStrategy]] installed (GraftExtensions or
    * `spark.experimental.extraStrategies`).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, leftTs),
      attr(rPlan, key), attr(rPlan, rightTs),
      payload.map(attr(rPlan, _)))
    val df = ColumnBridge.ofRows(spark, node)
    // alias payload columns asof_<name>, collision-free via attribute refs
    val cols = lPlan.output.map(a => ColumnBridge.column(a)) ++
      node.output.drop(lPlan.output.length).zip(payload).map {
        case (a, n) => ColumnBridge.column(a).as(s"asof_$n")
      }
    df.select(cols: _*)
  }
}
