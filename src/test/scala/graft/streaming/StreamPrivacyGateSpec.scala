package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Curation

/** q181's batch/stream parity (the ingest privacy gate equals q168's
  * batch suppression row for row) and its statelessness — the
  * stream-static cohort join must grow no streaming state.
  */
class StreamPrivacyGateSpec extends SparkSpec {

  // sf0.01: the k-anonymity gate keeps 58 of 500 docs there (sf0.001's
  // 50 docs all fall below K and would make parity trivially empty)
  val dir = "/root/testdata/sf0.01"

  test("stream privacy gate equals batch q168 row for row") {
    val batch = Curation.q168KAnonymity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val stream = StreamingQueries.q181StreamPrivacyGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(batch.nonEmpty, "batch gate kept nothing at sf0.01")
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }

  test("the ingest gate is stateless") {
    val ss = EventsStreaming.streamSession(spark)
    val cohorts = graft.sources.Tables.documents(ss, dir)
      .select(col("lang"), col("source"), expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("cohort_n"))
      .filter(col("cohort_n") >= Curation.AnonK)
    val gated = StreamingQueries.readDocumentsStream(ss, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .join(broadcast(cohorts), Seq("lang", "source", "len_bucket"))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("q181_stateless_probe").start()
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).map(_.stateOperators).getOrElse(Array.empty)
    q.stop()
    assert(stateOps.isEmpty,
      s"ingest privacy gate grew streaming state: ${stateOps.map(_.operatorName).mkString(",")}")
  }
}
