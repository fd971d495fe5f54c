package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics traps for the time-series tier: the binned range join must
  * equal the naive theta join exactly, RANGE frames must include equal-
  * timestamp peers, gap-fill must carry the last observation (and only
  * across genuine gaps), winsorization must clip symmetric tails, and
  * the snapshot diff must classify every change class correctly.
  */
class TimeSeriesSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q106 binned range join equals the naive theta join") {
    // Recompute the same windows, then join with a raw BETWEEN theta
    // join (nested loop — fine in a test) and compare pair-for-pair.
    val e = graft.sources.Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("event_type"),
      col("ts").cast("long").as("s"), col("value"))
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("s"), col("event_id"))
    val windows = e.withColumn("rn", row_number().over(byType))
      .filter(col("rn") <= 3)
      .select(concat(col("event_type"), lit("#"), col("rn")).as("wid"),
        (col("s") - 1800L).as("ws"), (col("s") + 1800L).as("we"))
    val naive = e.join(windows, col("s").between(col("ws"), col("we")))
      .groupBy(col("wid")).agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val binned = TimeSeriesQueries.q106RangeJoin(spark, dir)
      .select(col("wid"), col("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(binned == naive, s"binned != naive: $binned vs $naive")
    assert(binned.nonEmpty)
  }

  test("q107 RANGE frame includes equal-timestamp peers") {
    import spark.implicits._
    // user 1: two events share s=100 — each must see BOTH (peers are in
    // a RANGE frame); s=700000 sits past the 604800 s horizon of all of
    // them (700000 - 604800 = 95200 > 100), so it sees only itself;
    // s=600000 is within 604800 of everything before it.
    val df = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 100L, 2.0), (3L, 1L, 100L, 4.0),
      (4L, 1L, 700000L, 8.0), (5L, 2L, 50L, 16.0), (6L, 1L, 600000L, 32.0))
      .toDF("event_id", "user_id", "s", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("s"))
      .rangeBetween(-7L * 86400L, 0)
    val out = df.withColumn("n_7d", count(lit(1)).over(w))
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_7d")).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 3L, 4L -> 2L, 5L -> 1L, 6L -> 4L))
    // the registered query agrees with itself on real data: every row's
    // trailing count is at least 1 (self) and sum includes self
    val real = TimeSeriesQueries.q107RollingFeatures(spark, dir).collect()
    assert(real.forall(_.getAs[Long]("n_7d") >= 1L))
  }

  test("q110 forward fill carries the last observation across gaps only") {
    val out = TimeSeriesQueries.q110GapFill(spark, dir).collect()
    assert(out.nonEmpty)
    // fill is total (first day per user is an observation by construction)
    assert(out.forall(!_.isNullAt(2)))
    // per user: days are contiguous and gap rows repeat the prior value
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("day"))
      val days = sorted.map(_.getAs[Long]("day"))
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 },
        "grid not contiguous")
      sorted.zip(sorted.tail).foreach { case (prev, cur) =>
        if (cur.getAs[Boolean]("was_gap"))
          assert(cur.getAs[Double]("day_value") == prev.getAs[Double]("day_value"),
            "gap row does not repeat the prior value")
      }
    }
    // the fixture genuinely has gaps, or the test proves nothing
    assert(out.exists(_.getAs[Boolean]("was_gap")))
  }

  test("q108 winsorization clips both tails within the 5% bounds") {
    val rows = StatsQueries.q108Winsorize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val lo = r.getAs[Long]("n_clip_lo"); val hi = r.getAs[Long]("n_clip_hi")
      assert(r.getAs[Double]("p05") <= r.getAs[Double]("p95"))
      // values strictly below the ceil(n/20)-th smallest: at most ceil(n/20)-1
      assert(lo <= (n + 19) / 20 - 1, s"lo=$lo n=$n")
      assert(hi <= n - ((n * 19 + 19) / 20) , s"hi=$hi n=$n")
      // clipping moved the sum unless nothing was clipped
      if (lo + hi > 0)
        assert(r.getAs[Double]("sum_winsorized") != r.getAs[Double]("sum_raw"))
    }
  }

  test("q109 snapshot diff classifies added/removed/changed correctly") {
    val out = OperatorQueries.q109SnapshotDiff(spark, dir).collect()
    val byType = out.groupBy(_.getAs[String]("change_type"))
    assert(byType.keySet == Set("added", "removed", "changed"))
    byType("changed").foreach { r =>
      assert(math.abs(r.getAs[Double]("new_price") - r.getAs[Double]("old_price") - 10.0) < 1e-9)
    }
    byType("removed").foreach(r => assert(r.isNullAt(3)))
    byType("added").foreach(r => assert(r.isNullAt(2)))
    // bucket arithmetic: added keys live above the 1e8 offset
    assert(byType("added").forall(_.getAs[Long]("o_orderkey") > 100000000L))
  }
}
