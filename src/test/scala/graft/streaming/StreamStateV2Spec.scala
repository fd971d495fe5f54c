package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.EventsQueries

/** transformWithState v2 semantics (q122): the RocksDB-backed typed
  * ValueState must carry per-user totals across REAL micro-batch
  * boundaries — the last emission per user equals the batch aggregate,
  * and users spanning batches emit once per batch with monotonically
  * growing counts.
  */
class StreamStateV2Spec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q122 state carries across micro-batch boundaries") {
    val ss = EventsStreaming.stateV2Session(spark)
    val base = graft.sources.Tables.events(ss, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    // split mid-span so most users appear in BOTH batches
    val cut = base.select(expr("percentile_approx(CAST(ts AS LONG), 0.5)"))
      .first().getLong(0)
    val tmpDir = s"${sys.props("java.io.tmpdir")}/graft_twstate_${System.nanoTime()}"
    base.filter(col("ts").cast("long") <= cut).coalesce(1)
      .write.parquet(s"$tmpDir/b1.parquet")
    base.filter(col("ts").cast("long") > cut).coalesce(1)
      .write.parquet(s"$tmpDir/b2.parquet")
    new java.io.File(tmpDir).listFiles().filter(_.getName == "b2.parquet")
      .flatMap(_.listFiles())
      .foreach(f => f.setLastModified(System.currentTimeMillis() + 60000))

    // the staged files already carry a proper TIMESTAMP ts (base went
    // through Tables.events' nanos normalization before the write)
    val stream = ss.readStream.schema(base.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmpDir/*.parquet")
    val got = EventsStreaming.runToMemory(
      EventsStreaming.userTotals(ss, stream).toDF(), "twstate_mb").collect()

    // per-batch emissions: a user straddling the cut emits twice with
    // strictly growing counts
    val byUser = got.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.values.exists(_.length == 2), "no user straddled the cut")
    byUser.values.filter(_.length == 2).foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("n_events"))
      assert(sorted(0).getAs[Long]("n_events") < sorted(1).getAs[Long]("n_events"))
    }

    // final emission per user == the batch aggregate
    val finals = byUser.view.mapValues(_.maxBy(_.getAs[Long]("n_events"))).toMap
    val batch = graft.sources.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
          .cast("double").as("sv"),
        min(col("ts").cast("long")).as("f"), max(col("ts").cast("long")).as("l"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(finals.keySet == batch.keySet)
    finals.foreach { case (u, r) =>
      val (n, sv, f, l) = batch(u)
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[java.math.BigDecimal]("sum_value").doubleValue() - sv) < 1e-6)
      assert(r.getAs[Long]("first_sec") == f && r.getAs[Long]("last_sec") == l)
    }
  }
}
