package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with
  * `rightTs <= leftTs` within the same key — the event-to-state lookup
  * (trade↔quote, event↔config-version) Spark has no built-in for.
  *
  * Implementation is the union+window composition rather than a custom
  * SparkPlan (preference order: compose built-ins first): tag both
  * sides, union them, and carry the last non-null right payload forward
  * over a (key, ts) window. Cost is ONE hash shuffle on the key plus a
  * per-partition sort — no range-condition join, which would plan as a
  * broadcast-nested-loop and explode at scale. Skewed keys salt like
  * any window (process per sub-key, merge boundaries).
  */
object AsOfJoin {

  /** @param left     probe side; all columns preserved
    * @param right    state side
    * @param key      equi-key column name present on both sides
    * @param leftTs   event-time column name on `left`
    * @param rightTs  event-time column name on `right`
    * @param payload  right columns carried to the output (as-of values;
    *                 null when no right row precedes the left row)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val reserved = Seq("_p", "_side", "_asof")
    require(!leftCols.exists(reserved.contains),
      s"asOf reserves internal column names ${reserved.mkString(", ")}")
    // null keys never match (join semantics): a null-key right row must
    // not become anyone's state, and null-key left rows get null payload
    val rightClean = right.filter(col(key).isNotNull)
    // the payload travels as ONE struct so a multi-column state row is
    // carried atomically (independent per-column carries could mix
    // versions when payload fields are legitimately null)
    val payloadStruct = struct(payload.map(col): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payload.map(c => right.schema(c))))
    // tag: right rows sort BEFORE left rows at equal timestamps, so a
    // state row taking effect at t is visible to an event at t
    val taggedLeft = leftCols.map(col) ++ Seq(nullPayload.as("_p"), lit(1).as("_side"))
    val taggedRight = leftCols.map {
      case c if c == key => col(key)
      case c if c == leftTs => col(rightTs).as(leftTs)
      case c => lit(null).cast(left.schema(c).dataType).as(c)
    } ++ Seq(payloadStruct.as("_p"), lit(0).as("_side"))

    val unioned = left.select(taggedLeft: _*)
      .unionByName(rightClean.select(taggedRight: _*))
    // `_p` as the final sort key makes the carry deterministic when the
    // right side has duplicate timestamps per key: the field-wise
    // greatest payload wins instead of whichever row the shuffle
    // happened to order last. Left rows all carry a null `_p`, so their
    // relative order (which never matters) is unaffected.
    val w = Window.partitionBy(col(key))
      .orderBy(col(leftTs), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
