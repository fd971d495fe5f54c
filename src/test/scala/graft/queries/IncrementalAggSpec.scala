package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** q105's aggregate-algebra merge: base-only, delta-only, and
  * overlapping keys all merge to exactly the full recompute.
  */
class IncrementalAggSpec extends SparkSpec {

  private def agg(rows: Seq[(Long, String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "day", "value")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(24, 6))).as("sv"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
  }

  test("merge covers one-sided keys and equals the full recompute") {
    val baseRows = Seq(
      (1L, "view", 10L, 1.5), (1L, "view", 12L, 2.5), // overlap key
      (2L, "click", 11L, 4.0)) // base-only key
    val deltaRows = Seq(
      (1L, "view", 20L, 3.0), // overlap key
      (3L, "purchase", 21L, 9.0)) // delta-only key
    val merged = EventsQueries.mergeAggregates(agg(baseRows), agg(deltaRows))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    val full = agg(baseRows ++ deltaRows)
      .select(col("user_id"), col("event_type"), col("n"),
        col("sv").cast("double"), col("first_day"), col("last_day"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(merged == full, s"merge drift: $merged vs $full")
    // the three key classes are all present in this fixture
    assert(merged.keySet == Set((1L, "view"), (2L, "click"), (3L, "purchase")))
    assert(merged((1L, "view")) == ((3L, 7.0, 10L, 20L)))
  }

  test("q162: a fully-retracted key VANISHES; partial retraction adjusts exactly") {
    import spark.implicits._
    // id scheme: %10==0 -> CDC insert, %20==1 -> CDC delete (of a base
    // row), else base. User 1's ONLY base row (id 21, value 5) is
    // retracted and nothing is inserted -> the key must disappear, as
    // it would under a recompute. User 2 keeps one of two base rows and
    // gains an insert.
    val ev = Seq(
      (21L, 1L, "view", 5.0),     // base for user 1, retracted (21 % 20 == 1)
      (2L, 2L, "view", 1.0),      // base for user 2, kept
      (41L, 2L, "view", 2.5),     // base for user 2, retracted
      (30L, 2L, "view", 4.0))     // CDC insert for user 2
      .toDF("event_id", "user_id", "event_type", "value")
    val out = EventsQueries.retractableView(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(!out.keySet.exists(_._1 == 1L),
      "a key with all rows retracted must vanish from the view")
    assert(out((2L, "view")) == ((2L, 5.0)),
      s"partial retraction drifted: ${out((2L, "view"))}")
  }
}
