package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Time-series operators beyond plain event aggregation: interval
  * (range) joins, rolling time-window features, and gap-fill — the
  * temporal toolkit a warehouse needs once facts carry timestamps
  * rather than foreign keys. Every query is oracle-checked against
  * DuckDB; every plan is equi-join/window only (the range join is
  * binned into an equi join — no nested loop anywhere).
  */
object TimeSeriesQueries {

  import Relational.exprSum

  // --------------------------------------------------------------------
  // q106 — interval (range) join, binned to an equi join. "Incident
  // windows" — ±30 min around the top-3 highest-value events per type —
  // are joined to EVERY event whose timestamp falls inside them. The
  // naive plan is a nested-loop theta join (the O(n·m) trap Spark falls
  // into for BETWEEN conditions); instead both sides are bucketed into
  // 1800 s bins, each window is exploded into the bins it overlaps, and
  // the join runs as a hash equi-join on the bin key with the BETWEEN
  // as a post-join filter. Each event has exactly ONE bin, so a
  // (window, event) match appears exactly once — no dedup needed.
  // Scale notes (100 TB): bin fan-out is ceil(width/bin)+1 ≈ 3 rows per
  // window — the exploded side stays proportional to the window count;
  // the event side never replicates. Both sides hash-partition on the
  // bin key, so the join co-locates without a broadcast requirement
  // (though Spark will broadcast the window side when it is small, as
  // here). This is the standard range-join binning Spark lacks natively.
  private val WindowHalfSec = 1800L
  private val BinSec = 1800L
  private val TopPerType = 3

  def q106RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("ts").cast("long").as("s"), col("value"))
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("s"), col("event_id"))
    val windows = e
      .withColumn("rn", row_number().over(byType))
      .filter(col("rn") <= TopPerType)
      .select(
        concat(col("event_type"), lit("#"), col("rn")).as("wid"),
        col("event_type").as("wtype"),
        (col("s") - WindowHalfSec).as("ws"),
        (col("s") + WindowHalfSec).as("we"))
    val wbins = windows.withColumn(
      "bin", explode(expr(s"sequence(ws DIV $BinSec, we DIV $BinSec)")))
    val ebins = e.withColumn("bin", expr(s"s DIV $BinSec"))
    ebins.join(wbins, Seq("bin"))
      .filter(col("s").between(col("ws"), col("we")))
      .groupBy(col("wid"), col("wtype"), col("ws"), col("we"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        exprSum(col("value")).as("sum_value"))
      .orderBy(col("wid"))
  }

  val q106Oracle: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type,
       |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s, value
       |  FROM events),
       |ranked AS (
       |  SELECT event_type, s, ROW_NUMBER() OVER (PARTITION BY event_type
       |    ORDER BY value DESC, s, event_id) AS rn
       |  FROM e),
       |w AS (
       |  SELECT event_type || '#' || rn AS wid, event_type AS wtype,
       |    s - $WindowHalfSec AS ws, s + $WindowHalfSec AS we
       |  FROM ranked WHERE rn <= $TopPerType)
       |SELECT wid, wtype, ws, we, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
       |FROM w JOIN e ON e.s BETWEEN w.ws AND w.we
       |GROUP BY 1, 2, 3, 4 ORDER BY wid""".stripMargin

  // --------------------------------------------------------------------
  // q107 — rolling time-window features: for every event, the count and
  // value-sum of the same user's events in the preceding 7 days,
  // computed with a RANGE frame over epoch seconds (time-based, not
  // row-based — q20's running total is the ROWS dual). The window sum
  // runs over DECIMAL so partial-order differences between engines
  // cannot drift the float.
  // Scale notes (100 TB): partitioned by user_id — no global window;
  // per-user ordering is the sort any time-based feature pays, and the
  // frame is bounded by the time span, not the row count. This is the
  // feature-engineering shape (trailing activity counts) a training
  // pipeline computes per entity.
  private val TrailingSec = 7L * 86400L

  def q107RollingFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"))
      .rangeBetween(-TrailingSec, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("s"),
        col("value"))
      .withColumn("n_7d", count(lit(1)).over(w))
      .withColumn("sum_7d",
        sum(col("value").cast(DecimalType(24, 6))).over(w).cast("double"))
      .drop("value")
      .orderBy(col("event_id"))
  }

  val q107Oracle: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id,
       |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s, value
       |  FROM events)
       |SELECT event_id, user_id, s,
       |  COUNT(*) OVER w AS n_7d,
       |  CAST(SUM(CAST(value AS DECIMAL(24,6))) OVER w AS DOUBLE) AS sum_7d
       |FROM e
       |WINDOW w AS (PARTITION BY user_id ORDER BY s
       |  RANGE BETWEEN $TrailingSec PRECEDING AND CURRENT ROW)
       |ORDER BY event_id""".stripMargin

  // --------------------------------------------------------------------
  // q110 — gap-fill with forward fill: densify each user's daily value
  // series over their own [first, last] day span and carry the last
  // observed value across missing days (`last(..., ignoreNulls)` /
  // LAST_VALUE IGNORE NULLS — the classic time-series densification).
  // The first day per user is an observation by construction (the span
  // comes from the user's own events), so the fill is total.
  // Scale notes (100 TB): the grid explodes at most span-days rows per
  // user from a 1-row-per-user aggregate — no calendar cross join; the
  // fill window partitions by user. Both the grid build and the fill
  // reuse the same user_id hash partitioning.
  def q110GapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"),
        col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("value").cast(DecimalType(24, 6))).as("v"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .withColumn("day", explode(expr("sequence(d0, d1)")))
      .select(col("user_id"), col("day"))
    val fillW = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(fillW))
      .select(col("user_id"), col("day"),
        col("filled").cast("double").as("day_value"),
        col("v").isNull.as("was_gap"))
      .orderBy(col("user_id"), col("day"))
  }

  val q110Oracle: String =
    """WITH daily AS (
      |  SELECT user_id,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400 AS day,
      |    SUM(CAST(value AS DECIMAL(24,6))) AS v
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1)) AS BIGINT) AS day
      |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |        FROM daily GROUP BY 1)),
      |joined AS (
      |  SELECT g.user_id, g.day, d.v FROM grid g
      |  LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day)
      |SELECT user_id, day,
      |  CAST(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS day_value,
      |  v IS NULL AS was_gap
      |FROM joined ORDER BY user_id, day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_range_join" -> q106RangeJoin,
    "q107_rolling_features" -> q107RollingFeatures,
    "q110_gap_fill" -> q110GapFill)

  def oracleSql: Map[String, String] = Map(
    "q106_range_join" -> q106Oracle,
    "q107_rolling_features" -> q107Oracle,
    "q110_gap_fill" -> q110Oracle)
}
