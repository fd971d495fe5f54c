package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q91's stream-static enrichment: equals the batch star join, runs
  * stateless, and keeps every stream row (ids are covered by the dim).
  */
class StreamEnrichSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("stream-static enrichment equals the batch star join") {
    val batch = Tables.events(spark, dir)
      .join(Tables.customer(spark, dir), col("user_id") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("c_mktsegment"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val stream = StreamingQueries.q91StreamEnrich(spark, dir)
      .select(col("event_id"), col("mktsegment"), col("nation"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(batch.nonEmpty)
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
    // every event has a covering dim row on this fixture — the inner
    // join must not silently drop stream rows
    val nEvents = Tables.events(spark, dir).count()
    assert(stream.size.toLong == nEvents, s"${stream.size} enriched vs $nEvents events")
  }

  test("stream-static anti join dedups the delta against the corpus index") {
    // driver-side fingerprint: min md5 over 3-token shingles of the
    // normalized text (whole text when shorter) — q40's candidate key
    def fp(text: String): String = {
      val norm = text.toLowerCase.trim
      val toks = norm.split(" ", -1)
      val shingles = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(norm)
      shingles.map { s =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.min
    }
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), fp(r.getString(1))))
    val corpusFps = docs.collect { case (id, f) if id % 3 != 0 => f }.toSet
    val delta = docs.filter(_._1 % 3 == 0)
    val expected = delta.collect { case (id, f) if !corpusFps(f) => id }.toSet
    val kept = StreamingQueries.q103StreamDedupStatic(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == expected,
      s"missing=${(expected -- kept).take(3)} extra=${(kept -- expected).take(3)}")
    assert(delta.length > expected.size,
      "no delta doc matched the corpus index — the anti join is untested")
  }

  test("the enrichment join is stateless") {
    val ss = EventsStreaming.streamSession(spark)
    val events = EventsStreaming.readEventsStream(ss, dir)
    val dims = Tables.customer(ss, dir)
      .join(Tables.nation(ss, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment"))
    val q = events.join(dims, col("user_id") === col("c_custkey"))
      .writeStream.outputMode("append")
      .format("memory").queryName("q91_stateless_probe").start()
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).map(_.stateOperators).getOrElse(Array.empty)
    q.stop()
    assert(stateOps.isEmpty,
      s"stream-static join grew state: ${stateOps.map(_.operatorName).mkString(",")}")
  }
}
