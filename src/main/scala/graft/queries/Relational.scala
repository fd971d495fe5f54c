package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Core relational queries over the testdata star schema.
  *
  * Each query has a matching DuckDB oracle in [[Relational.oracleSql]];
  * the pair must produce bit-identical sorted results (driver gate).
  *
  * Determinism rules used throughout (oracle hash-compare is exact):
  *   - money aggregates go through DECIMAL so the sum is exact and
  *     order-independent, then cast to DOUBLE for a stable final type;
  *   - every query ends in a total order on a unique key set;
  *   - column names are aliased identically on both sides.
  */
object Relational {

  /** Exact, order-independent sum of a double money column: cast each
    * value to DECIMAL(18,2) (exact at source precision), sum exactly,
    * surface as DOUBLE. Matches `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS
    * DOUBLE)` in DuckDB bit-for-bit.
    */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a per-row double product, rounded to 6 decimals per
    * row before the (exact) decimal sum. The per-row double product is
    * IEEE-deterministic; the DECIMAL(24,6) cast rounds identically in
    * Spark and DuckDB (binary doubles never land exactly on a decimal
    * midpoint beyond 1 fractional digit).
    */
  def exprSum(c: Column): Column = sum(c.cast(DecimalType(24, 6))).cast("double")

  def avgViaDecimal(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))).as("tmp")

  // --------------------------------------------------------------------
  // q01 — pricing summary (groupBy + multi-agg + filter; TPC-H Q1 shape).
  // Covers SURVEY §2.7 aggregation surface plus the filter our query
  // layer adds (§2.4 note). Scan-side: filter + 7-column pruning pushed
  // to parquet.
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        exprSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        exprSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (moneySum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary)

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Oracle)
}
