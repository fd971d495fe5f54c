package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** In-engine surrogate keys, replacing the reference's
  * write-dim → read-back-via-JDBC → join round-trip (the warehouse's
  * SERIAL columns assigned the keys; `/root/reference/processing/
  * medical_formula_process.py:112-121`, SURVEY §1.2).
  *
  * Keys are the global rank under a canonical order — deterministic and
  * testable. The rank is computed in two phases, zipWithIndex-style:
  * range-partition by the key order, sort within each partition, then
  * add each partition's cumulative row offset to the local index. That
  * is exactly `row_number() OVER (ORDER BY ...)` but with NO
  * single-partition window — every phase is distributed, so the same
  * code handles a 10-row dimension and a billion-row one.
  */
object SurrogateKeys {

  /** Add `idCol` = dense 1-based key over `orderCols`. The remaining
    * columns are appended as tie-breakers so the assignment stays
    * deterministic even when the natural key is unexpectedly non-unique
    * (dirty input); with a genuinely unique key the tie-breakers never
    * fire and ids are unchanged.
    *
    * Ids are Int, matching the reference warehouse's Postgres SERIAL
    * (int4) columns; for a dimension past 2^31 rows use [[assignHashed]].
    */
  def assign(df: DataFrame, idCol: String, orderCols: Column*): DataFrame = {
    val named = orderCols.map(_.toString).toSet
    val tieBreakers = df.columns.filterNot(named.contains)
      .map(org.apache.spark.sql.functions.col)
    val order = orderCols ++ tieBreakers
    // Range partitions are contiguous key ranges in partition order, so
    // partition-offset + within-partition index IS the global rank:
    // boundaries may move between runs, the rank never does (the order
    // is total — every column participates).
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(
      sorted.schema.fields :+ StructField(idCol, IntegerType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1).toInt)
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** Scale path: a collision-free 64-bit key from the natural key,
    * computed per-row with no window/shuffle. Keys are stable across
    * runs but not dense. Use for dimensions too large to broadcast.
    */
  def assignHashed(df: DataFrame, idCol: String, naturalKey: Column*): DataFrame =
    df.withColumn(idCol,
      org.apache.spark.sql.functions.xxhash64(naturalKey: _*))
}
