package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** q84's operator contract across REAL micro-batch boundaries:
  * dropDuplicatesWithinWatermark must suppress duplicates whose key
  * state is still within the watermark horizon, and must EVICT state
  * for keys whose (event time + delay) the watermark has passed — the
  * bound that makes streaming dedup runnable on an unbounded source.
  */
class WatermarkDedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType)))

  test("in-watermark duplicates suppressed across batches; expired keys evicted") {
    import spark.implicits._
    val tmpDir = s"${sys.props("java.io.tmpdir")}/graft_wm_dedup_${System.nanoTime()}"

    def write(name: String, mtimeOffsetMs: Long,
        rows: Seq[(Long, Long, Long)]): Unit = {
      rows.toDF("event_id", "sec", "user_id")
        .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
          col("user_id"))
        .coalesce(1).write.parquet(s"$tmpDir/$name.parquet")
      new java.io.File(s"$tmpDir/$name.parquet").listFiles()
        .foreach(f => f.setLastModified(System.currentTimeMillis() + mtimeOffsetMs))
    }

    // batch 1: key 1 at t=1000 (plus an in-batch duplicate), key 2 at
    // t=1995, key 3 at t=2000. Watermark after the batch = 2000 - 10s
    // delay = 1990, so key 1's state (expires 1000 + 10 = 1010) is due
    // for eviction while keys 2/3 (expire 2005/2010) stay live.
    write("w1", 0, Seq((1L, 1000L, 1L), (1L, 1000L, 1L), (2L, 1995L, 2L),
      (3L, 2000L, 3L)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmpDir/*.parquet")
    val q = stream.withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append").format("memory").queryName("wm_dedup")
      .start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("wm_dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(afterB1 == Seq(1L, 2L, 3L),
        s"batch 1 should emit each key once, got $afterB1")

      // batch 2: a duplicate of live key 2 (t=1996, within its horizon)
      // must be suppressed; key 4 proves the batch was processed
      write("w2", 60000, Seq((2L, 1996L, 2L), (4L, 2001L, 4L)))
      q.processAllAvailable()
      val afterB2 = spark.table("wm_dedup").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(afterB2.count(_ == 2L) == 1,
        s"in-watermark duplicate of key 2 was re-emitted: $afterB2")
      assert(afterB2.contains(4L), "batch 2 was not processed")

      // state bound: key 1 expired at watermark 1990 and must be gone.
      // Observed per-batch state sizes run 3 (batch 1: keys 1,2,3) →
      // 2 (cleanup: key 1 evicted) → 3 (batch 2 adds key 4) — so the
      // sequence must show an eviction transition, and the store must
      // never hold all 4 distinct keys at once.
      val stateRows = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal)
      assert(stateRows.nonEmpty && stateRows.max >= 3,
        s"state metrics missing: ${stateRows.mkString(",")}")
      assert(stateRows.lazyZip(stateRows.tail).exists(_ > _),
        s"no state eviction observed: ${stateRows.mkString(",")} — " +
          "the watermark bound is not being enforced")
      assert(stateRows.max < 4,
        s"store held every key ever seen (${stateRows.mkString(",")}) — " +
          "state is not bounded by the watermark horizon")
    } finally q.stop()
  }
}
