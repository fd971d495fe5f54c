package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.row_number

/** In-engine surrogate keys, replacing the reference's
  * write-dim → read-back-via-JDBC → join round-trip (the warehouse's
  * SERIAL columns assigned the keys; `/root/reference/processing/
  * medical_formula_process.py:112-121`, SURVEY §1.2).
  *
  * `row_number` over a canonical order is deterministic and testable.
  * Dimensions are small relative to facts (they're broadcast in every
  * fact join), so the single-partition window each assignment implies
  * is bounded by dim size, never by fact size — at 100 TB the facts
  * never pass through this code path. For a dimension too large to
  * window in one partition, use [[assignHashed]] instead.
  */
object SurrogateKeys {

  /** Add `idCol` = dense 1-based key over `orderCols`. The remaining
    * columns are appended as tie-breakers so the assignment stays
    * deterministic even when the natural key is unexpectedly non-unique
    * (dirty input); with a genuinely unique key the tie-breakers never
    * fire and ids are unchanged.
    */
  def assign(df: DataFrame, idCol: String, orderCols: Column*): DataFrame = {
    val named = orderCols.map(_.toString).toSet
    val tieBreakers = df.columns.filterNot(named.contains).map(org.apache.spark.sql.functions.col)
    df.withColumn(idCol,
      row_number().over(Window.orderBy(orderCols ++ tieBreakers: _*)))
  }

  /** Scale path: a collision-free 64-bit key from the natural key,
    * computed per-row with no window/shuffle. Keys are stable across
    * runs but not dense. Use for dimensions too large to broadcast.
    */
  def assignHashed(df: DataFrame, idCol: String, naturalKey: Column*): DataFrame =
    df.withColumn(idCol,
      org.apache.spark.sql.functions.xxhash64(naturalKey: _*))
}
