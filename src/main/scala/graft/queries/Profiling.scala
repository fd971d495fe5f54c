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

  // --------------------------------------------------------------------
  // q101 — data-quality expectation report: one row per audited column
  // with row/null/distinct counts and typed min/max — the publish gate
  // every warehouse load runs before a table goes live (the reference
  // loads blind; this is the check its users would bolt on first).
  // One single-column aggregate per audited column, unioned: each scan
  // prunes to ONE column (columnar scans make per-column passes the
  // scalable form — a single all-columns aggregate would pay q39's
  // Expand or a wide row read instead). Numeric bounds stay DOUBLE and
  // string bounds stay VARCHAR — casting doubles to strings for a
  // uniform column would make the hash hostage to formatting.
  def q101DqReport(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def audit(c: String, numeric: Boolean): DataFrame = {
      val col0 = col(c)
      orders.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col0.isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col0).as("n_distinct"),
        (if (numeric) min(col0).cast("double") else lit(null).cast("double")).as("min_num"),
        (if (numeric) max(col0).cast("double") else lit(null).cast("double")).as("max_num"),
        (if (numeric) lit(null).cast("string") else min(col0).cast("string")).as("min_str"),
        (if (numeric) lit(null).cast("string") else max(col0).cast("string")).as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    audit("o_orderkey", numeric = true)
      .unionByName(audit("o_custkey", numeric = true))
      .unionByName(audit("o_totalprice", numeric = true))
      .unionByName(audit("o_orderstatus", numeric = false))
      .orderBy(col("col_name"))
  }

  val q101Oracle: String = {
    def num(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  CAST(min($c) AS VARCHAR) AS min_str, CAST(max($c) AS VARCHAR) AS max_str
         |FROM orders""".stripMargin
    s"""${num("o_orderkey")}
       |UNION ALL
       |${num("o_custkey")}
       |UNION ALL
       |${num("o_totalprice")}
       |UNION ALL
       |${str("o_orderstatus")}
       |ORDER BY col_name""".stripMargin
  }

  // --------------------------------------------------------------------
  // q166 — MERGEABLE distinct-count profiling via HLL sketches
  // (Apache DataSketches HllSketch, the `hll_sketch_agg` family added
  // in Spark 3.5): one partial sketch of user_id per event_type, then
  // `hll_union_agg` merges the partials into the global estimate
  // WITHOUT re-scanning — the commutative-merge property that makes
  // sketch profiling the 100-TB form (each shard/partition aggregates
  // its own sketch; merging k sketches is O(k·2^lgK) driver work, vs
  // q39's exact form which shuffles every distinct value). The oracle
  // cannot replay DataSketches bit-for-bit, so the query emits the
  // EXACT ndv per group (DuckDB-verified) plus an `est_ok` flag
  // asserting the sketch estimate lands within 5% — same
  // fidelity-report contract as q165's JL sketch. The exact column
  // exists for the gate; production keeps only the sketches.
  def q166HllProfile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def okFlag(est: org.apache.spark.sql.Column,
               exact: org.apache.spark.sql.Column) =
      (abs(est.cast("double") - exact.cast("double")) <=
        exact.cast("double") * 0.05).as("est_ok")
    // One pass builds the partial sketches AND the per-group exact ndv.
    val per = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("exact_ndv"))
    val perRows = per.select(col("event_type"), col("exact_ndv"),
      okFlag(hll_sketch_estimate(col("sk")), col("exact_ndv")))
    // The merge path: union the per-group partials — no event re-scan.
    val merged = per.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val totalExact = ev.agg(countDistinct(col("user_id")).as("exact_ndv"))
    // 1-row × 1-row combine on an optimizer-OPAQUE key (a plain lit(1)
    // folds via FoldablePropagation and the join collapses to the
    // banned cartesian — see graft.plans.Opaque): equi-join, so it
    // plans a broadcast HASH join and stays inside the nested-loop lock.
    val totalRow = merged
      .withColumn("k", graft.plans.Opaque.zeroKey(col("est").cast("long")))
      .join(totalExact
        .withColumn("k", graft.plans.Opaque.zeroKey(col("exact_ndv"))), Seq("k"))
      .select(lit("__ALL__").as("event_type"), col("exact_ndv"),
        okFlag(col("est"), col("exact_ndv")))
    perRows.unionByName(totalRow).orderBy(col("event_type"))
  }

  val q166Oracle: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_ndv,
      |  TRUE AS est_ok
      |FROM events GROUP BY event_type
      |UNION ALL
      |SELECT '__ALL__' AS event_type, COUNT(DISTINCT user_id) AS exact_ndv,
      |  TRUE AS est_ok
      |FROM events
      |ORDER BY event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_profile_ndv" -> q39ProfileNdv,
    "q101_dq_report" -> q101DqReport,
    "q166_hll_profile" -> q166HllProfile)

  def oracleSql: Map[String, String] = Map(
    "q39_profile_ndv" -> q39Oracle,
    "q101_dq_report" -> q101Oracle,
    "q166_hll_profile" -> q166Oracle)
}
