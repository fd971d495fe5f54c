package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.streaming.EventsStreaming

/** The testdata generator has shipped events.ts under different
  * physical parquet encodings across generations — TIMESTAMP(NANOS)
  * (surfaced by Spark as an int64 under `nanosAsLong`) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaced as
  * TIMESTAMP_NTZ). Round 8's regen flipped the encoding and silently
  * broke 23 registered queries: NTZ rejects `CAST(ts AS BIGINT)` at
  * analysis, and the streaming reader's then-hardcoded LongType schema
  * read raw microseconds as nanoseconds, compressing event time 1000×.
  * These tests pin the loader contract so the NEXT encoding flip fails
  * here, not in the driver's correctness gate.
  */
class TsEncodingSpec extends SparkSpec {

  /** One reference instant, expressed per encoding. */
  private val Micros = 1704067200123456L // 2024-01-01T00:00:00.123456Z

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft_tsenc_$tag").toString

  test("normalizeEventsTs surfaces the same instant under long-nanos, NTZ, and LTZ encodings") {
    import spark.implicits._
    // long nanos: what TIMESTAMP(NANOS) + nanosAsLong surfaces
    val longDir = tmp("long")
    Seq((1L, Micros * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(longDir)
    // TIMESTAMP_NTZ: what a µs isAdjustedToUTC=false file surfaces
    val ntzDir = tmp("ntz")
    Seq((1L, Micros)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(ntzDir)
    // session-zoned TIMESTAMP: Spark's own write encoding
    val ltzDir = tmp("ltz")
    Seq((1L, Micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(ltzDir)

    val instants = Seq(longDir, ntzDir, ltzDir).map { d =>
      val norm = Tables.normalizeEventsTs(spark.read.parquet(d))
      assert(norm.schema("ts").dataType == TimestampType,
        s"$d surfaced ${norm.schema("ts").dataType}")
      // compare as epoch micros so the session zone cannot mask a shift
      norm.select(unix_micros(col("ts"))).head().getLong(0)
    }
    assert(instants.distinct == Seq(Micros),
      s"encodings disagree on the instant: $instants")
  }

  test("the real testdata events table surfaces TimestampType and castable seconds") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    // the exact shape that broke at analysis under NTZ
    val sec = ev.select(col("ts").cast("long").as("sec"))
      .agg(min(col("sec")), max(col("sec"))).head()
    // the generator's clock starts 2024-01-01; a 1000× compression or
    // a nanos-as-seconds misread lands far outside this band
    assert(sec.getLong(0) >= 1704067200L && sec.getLong(1) < 1704067200L + 400L * 86400,
      s"events ts range looks mis-scaled: $sec")
  }

  test("readEventsStream surfaces TimestampType over the real testdata files") {
    val stream = EventsStreaming.readEventsStream(spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
  }

  test("readEventsStream on a not-yet-populated directory falls back to the contract schema") {
    // a file-stream source pointed at an empty staging dir is a
    // legitimate state (files arrive later); construction must not
    // throw on schema inference, and the declared contract schema
    // must apply so downstream plans still analyze
    val empty = java.nio.file.Files.createTempDirectory("graft_empty_stream").toString
    try {
      val stream = EventsStreaming.readEventsStream(spark, empty)
      assert(stream.isStreaming)
      assert(stream.schema == EventsStreaming.eventsSchema)
    } finally {
      new java.io.File(empty).delete()
    }
  }
}
