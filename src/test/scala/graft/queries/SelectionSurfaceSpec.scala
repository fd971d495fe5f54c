package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q116-q119: two-phase selection must equal the sort-based order
  * statistic, unpivot must be pivot's inverse in shape, the window
  * surface must respect rank bounds and partition edges, and the set
  * ops must partition the key space.
  */
class SelectionSurfaceSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q116 two-phase median equals the sort-based order statistic") {
    val out = StatsQueries.q116GlobalMedian(spark, dir).collect()
    assert(out.length == 1)
    val vs = graft.sources.Tables.orders(spark, dir)
      .select(col("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(identity)
    val n = vs.length.toLong
    val expected = vs(((n + 1) / 2 - 1).toInt)._1
    assert(out.head.getAs[Long]("n_total") == n)
    assert(out.head.getAs[Double]("median") == expected)
  }

  test("q116 recursion: all mass in one level-1 bin still selects exactly") {
    // every value lands in level-1 bin 0 (range < MedianBinWidth), so
    // only the level-2 re-bin keeps the final ranking partition small —
    // this is the concentrated distribution the single-level form
    // silently degraded on
    val df = spark.range(5000)
      .select((col("id") * 10.0).as("v"), col("id").as("tie"))
    val out = StatsQueries.globalMedianPlan(df).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_total") == 5000L)
    // rank (5000+1) div 2 = 2500 -> value (2500-1)*10
    assert(out.head.getAs[Double]("median") == 24990.0)
  }

  test("q155 percentiles equal the sort-based order statistics") {
    val vs = graft.sources.Tables.orders(spark, dir)
      .select(col("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(identity)
    val n = vs.length.toLong
    def nearest(num: Long, den: Long): Double =
      vs(((num * n + den - 1) / den - 1).toInt)._1
    val out = StatsQueries.q155GlobalPercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set("p50", "p90", "p99"))
    assert(out.values.forall(_._1 == n))
    assert(out("p50")._2 == nearest(1, 2))
    assert(out("p90")._2 == nearest(9, 10))
    assert(out("p99")._2 == nearest(99, 100))
  }

  test("q155 rank edges: p100 is the max, fraction must be in (0, 1]") {
    val df = spark.range(1, 101)
      .select((col("id") * 1.0).as("v"), col("id").as("tie"))
    val top = StatsQueries.selectRankPlan(df, 1, 1).collect()
    assert(top.head.getAs[Double]("v") == 100.0)
    intercept[IllegalArgumentException] {
      StatsQueries.selectRankPlan(df, 3, 2)
    }
  }

  test("q116 construction fires no Spark jobs (plan sweeps stay action-free)") {
    // a frame that THROWS on any evaluation: if construction ran an
    // action (the old histogram collect), this call would raise
    val poisoned = spark.range(10).select(
      expr("CASE WHEN id >= 0 THEN CAST(raise_error('q116 was eager') AS DOUBLE) " +
        "ELSE CAST(id AS DOUBLE) END").as("v"),
      col("id").as("tie"))
    val plan = StatsQueries.globalMedianPlan(poisoned) // must not throw
    assert(plan.columns.toSeq == Seq("n_total", "median"))
    // evaluating it DOES reach the poison — proving the assert above
    // exercised laziness, not a dead plan
    intercept[Exception] { plan.collect() }
  }

  test("q117 unpivot emits one row per (day, metric)") {
    val rows = StarSchema.q117Unpivot(spark, dir).collect()
    val metrics = rows.map(_.getAs[String]("metric")).toSet
    assert(metrics == Set("n_events", "n_users", "sum_value"))
    val days = rows.map(_.getAs[Long]("day")).toSet
    assert(rows.length == days.size * 3)
    // n_events >= n_users on every day (distinct can't exceed count)
    val byDay = rows.groupBy(_.getAs[Long]("day")).values
    byDay.foreach { g =>
      val m = g.map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
      assert(m("n_events") >= m("n_users"))
    }
  }

  test("q118 rank functions stay in bounds; offsets are null at edges") {
    val rows = StarSchema.q118WindowSurface(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getAs[Double]("pct"); val cd = r.getAs[Double]("cd")
      assert(pct >= 0.0 && pct <= 1.0 && cd > 0.0 && cd <= 1.0)
      val t = r.getAs[Int]("tile"); assert(t >= 1 && t <= 4)
    }
    // exactly one null prev (the group minimum) and one null next per group
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { g =>
      assert(g.count(_.isNullAt(3)) == 1, "one null lag per group")
      assert(g.count(_.isNullAt(4)) == 1, "one null lead per group")
    }
  }

  test("q123 buckets are equi-depth (counts differ by at most 1)") {
    val rows = StatsQueries.q123EquidepthHist(spark, dir).collect()
    rows.groupBy(_.getAs[String]("prioridad")).values.foreach { g =>
      val counts = g.map(_.getAs[Long]("n_rows"))
      assert(counts.max - counts.min <= 1, s"not equi-depth: ${counts.toList}")
      // buckets are contiguous 0..9 and value ranges are ordered
      assert(g.map(_.getAs[Long]("bucket")).sorted.sameElements(0L until 10L))
      val sorted = g.sortBy(_.getAs[Long]("bucket"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo"))
      }
    }
  }

  test("q124 extracts every digit run with consistent bounds") {
    val out = graft.queries.EventsQueries.q124RegexExtract(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Int]("n_runs")
      assert(n >= 1) // props always carries the k int
      if (n == 1)
        assert(r.getAs[Long]("first_run") == r.getAs[Long]("last_run"))
    }
  }

  test("q125 shares sum to one") {
    val rows = StatsQueries.q125ShareOfTotal(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("q126 signatures are sorted and duplicate-free") {
    val rows = graft.queries.EventsQueries.q126TypeSignature(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[String]("type_sig").split(",").toSeq
      assert(parts == parts.sorted && parts.distinct == parts)
      assert(parts.length.toLong == r.getAs[Long]("n_types"))
    }
  }

  test("q119 set ops partition the F-customer key space") {
    val rows = StatsQueries.q119SetOps(spark, dir).collect()
    val both = rows.filter(_.getAs[String]("tag") == "both")
      .map(_.getAs[Long]("o_custkey")).toSet
    val onlyF = rows.filter(_.getAs[String]("tag") == "only_f")
      .map(_.getAs[Long]("o_custkey")).toSet
    assert(both.nonEmpty && onlyF.nonEmpty)
    assert((both & onlyF).isEmpty)
    val o = graft.sources.Tables.orders(spark, dir)
    val fKeys = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    assert(both ++ onlyF == fKeys)
    val oKeys = o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    assert(onlyF.forall(k => !oKeys.contains(k)))
    assert(both.forall(oKeys.contains))
  }
}
