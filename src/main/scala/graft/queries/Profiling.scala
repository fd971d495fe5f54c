package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Data-profiling queries. q39 reports exact per-column distinct counts
  * and null counts for lineitem — the oracle-checkable form of profile
  * scans. At 100 TB the same shape runs with
  * `approx_count_distinct` (HyperLogLog++, one pass, no shuffle of
  * distinct values); the exact form here is what the DuckDB gate can
  * reproduce bit-for-bit. See ProfilingSpec for the HLL variant's
  * accuracy check.
  */
object Profiling {

  val ProfiledCols: Seq[String] = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus")

  def q39ProfileNdv(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val aggs = ProfiledCols.flatMap { c =>
      Seq(countDistinct(col(c)).as(s"ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    li.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  val q39Oracle: String = {
    val aggs = ProfiledCols.flatMap { c =>
      Seq(s"COUNT(DISTINCT $c) AS ndv_$c",
        s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c")
    }.mkString(",\n  ")
    s"""SELECT COUNT(*) AS n_rows,
       |  $aggs
       |FROM lineitem""".stripMargin
  }

  /** The scale form: one pass, HLL sketches, no exact-distinct shuffle. */
  def approxProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.agg(count(lit(1)).as("n_rows"),
      ProfiledCols.map(c => approx_count_distinct(col(c)).as(s"andv_$c")): _*)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_profile_ndv" -> q39ProfileNdv)

  def oracleSql: Map[String, String] = Map(
    "q39_profile_ndv" -> q39Oracle)
}
