package graft.streaming

import graft.SparkSpec

/** q183's batch/stream parity: the streaming hourly counts fed through
  * the integer 3σ contract must flag exactly the hours q176 flags.
  */
class StreamRateMonitorSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("stream rate monitor equals batch q176 row for row") {
    val batch = graft.queries.EventsQueries.q176RateAnomalies(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val stream = StreamingQueries.q183StreamRateMonitor(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }
}
