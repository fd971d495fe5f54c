package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q146: native session windows must equal a batch gap-islands
  * recomputation (STRICT > 1800s break — session_window merges
  * touching windows, pinned by the exact-gap fixture below), and the
  * staged flush batch must never leak into the output.
  */
class SessionWindowSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q146 equals batch gap-islands; flush sessions never emitted") {
    val rows = StreamingQueries.q146StreamSessionWindow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // independent batch recomputation (window functions, not session_window)
    val e = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("sec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
    val expected = e
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("sec")).as("start"), (max(col("sec")) + 1800L).as("end"),
        count(lit(1)).as("n"))
      .select("user_id", "start", "end", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

    assert(rows.toSeq == expected.toSeq)

    // structural invariants: gap-separated, ordered, no flush leakage
    val maxSec = e.agg(max(col("sec"))).head().getLong(0)
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.foreach { case (_, s, en, n) =>
        assert(en - s >= 1800 && n >= 1)
        assert(s <= maxSec, "flush-batch session leaked into the output")
      }
      sorted.zip(sorted.drop(1)).foreach { case ((_, _, e1, _), (_, s2, _, _)) =>
        assert(s2 >= e1, "sessions overlap — windows failed to merge")
      }
    }
  }

  test("an event exactly gap seconds after the previous MERGES (touching windows coalesce)") {
    import spark.implicits._
    val fixtureDir = java.nio.file.Files
      .createTempDirectory("graft_sw_gap").toString
    // user 1: gap exactly 1800 → one session; user 2: 1801 → two
    Seq(
      (1L, 1704067200L, 1L, "view", 1.0, null.asInstanceOf[String]),
      (2L, 1704069000L, 1L, "view", 1.0, null.asInstanceOf[String]),
      (3L, 1704067200L, 2L, "view", 1.0, null.asInstanceOf[String]),
      (4L, 1704069001L, 2L, "view", 1.0, null.asInstanceOf[String]))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$fixtureDir/events.parquet")
    val got = StreamingQueries.q146StreamSessionWindow(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1704067200L, 1704070800L, 2L),
      (2L, 1704067200L, 1704069000L, 1L),
      (2L, 1704069001L, 1704070801L, 1L)),
      s"boundary semantics drifted: ${got.toSeq}")
  }
}
