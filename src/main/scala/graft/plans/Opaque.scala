package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{least, lit}

/** Optimizer-opaque constants for 1-row-side equi-joins.
  *
  * Several queries join a 1-row aggregate (a corpus count, a token
  * total, a trained threshold) back onto a large frame so the whole
  * query stays ONE lazy plan. The join key must be a constant the
  * OPTIMIZER cannot see through, or the equi-join collapses to the
  * cartesian product the nested-loop sweep bans: aliased literals fall
  * to FoldablePropagation, and `x * 0` folds for non-nullable x.
  * `least(c, 0)` evaluates to 0 on every row of a non-negative column
  * (counts, sums of counts, token totals) but constraint propagation
  * cannot prove the column non-negative, so the hash join survives and
  * AQE broadcasts the 1-row side. If a future Spark release learns to
  * fold this shape, THIS is the one place to pick a new opaque form —
  * the plan-regression sweep will fail every user at once.
  */
object Opaque {

  /** A key column that is always 0L for non-negative `c`, opaque to
    * constant folding. Use the same expression on both join sides.
    */
  def zeroKey(c: Column): Column = least(c, lit(0L))
}
