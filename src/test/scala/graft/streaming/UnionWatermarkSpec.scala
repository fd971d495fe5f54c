package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

import graft.SparkSpec

/** q262 — multiple-watermark combination. The oracle proves the
  * emitted windows; this spec locks the MECHANISM: both branches'
  * EventTimeWatermark nodes survive into the plan, the engine
  * combines them with the `min` policy (the progress watermark equals
  * the LAGGIEST feed's frontier), and the policy is load-bearing —
  * under `max` the union emits windows the slow feed could still
  * legally write into.
  */
class UnionWatermarkSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(policy: String): (Seq[String], String, String) = {
    val ss = EventsStreaming.streamSession(spark)
    ss.conf.set("spark.sql.streaming.multipleWatermarkPolicy", policy)
    def feed(parity: Int, delay: String, name: String) =
      EventsStreaming.readEventsStream(ss, dir)
        .filter(col("event_id") % 2 === parity)
        .withWatermark("ts", delay)
        .select(col("ts"), lit(name).as("feed"),
          col("value").cast(DecimalType(24, 6)).as("dvalue"))
    val agg = feed(1, "10 minutes", "click")
      .unionByName(feed(0, "30 minutes", "billing"))
      .groupBy(window(col("ts"), "1 hour"), col("feed"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("feed"),
        col("n_events"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(s"uw_$policy").start()
    q.processAllAvailable()
    val wm = q.recentProgress
      .flatMap(p => Option(p.eventTime.get("watermark"))).last
    q.stop()
    val rows = ss.table(s"uw_$policy")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
    (rows, wm, agg.queryExecution.analyzed.toString)
  }

  test("min policy: the laggiest feed owns the global watermark") {
    val (rows, wm, plan) = run("min")
    assert(rows.nonEmpty)
    assert(plan.linesIterator.count(_.contains("EventTimeWatermark")) == 2,
      s"both branch watermarks must survive the union:\n$plan")
    // the combined watermark is the even feed's frontier (its max ts
    // minus 30 min, ms-truncated) — the odd feed's tighter 10-minute
    // delay must NOT win
    import spark.implicits._
    val expected = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_id") % 2 === 0)
      .select(date_trunc("millisecond",
        max(col("ts").cast("timestamp")) - expr("INTERVAL 30 MINUTES")))
      .as[java.sql.Timestamp].collect()(0).toInstant.toString
    assert(wm == expected, s"watermark $wm != laggiest-feed frontier $expected")
  }

  test("the min policy is load-bearing: max would leak the slow feed's tail") {
    val (minRows, _, _) = run("min")
    val (maxRows, _, _) = run("max")
    assert(maxRows.size > minRows.size,
      "max policy should close extra windows the slow feed can still write " +
        s"into (min=${minRows.size}, max=${maxRows.size})")
    assert(minRows.toSet.subsetOf(maxRows.toSet),
      "policy change altered already-final windows, not just the tail")
  }
}
