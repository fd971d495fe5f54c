package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import graft.sources.Tables

/** q88's batch/stream parity: the row-local curation gate produces the
  * same rows over a stream as over the batch table, runs stateless, and
  * its batch plan needs no shuffle.
  */
class StreamCurationGateSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("stream gate equals the batch gate row for row") {
    val batch = rows(Curation.rowLocalGate(Tables.documents(spark, dir)))
    val stream = rows(StreamingQueries.q88StreamCurationGate(spark, dir))
    assert(batch.nonEmpty, "gate filtered everything out on the fixture")
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }

  test("the gate is stateless and shuffle-free") {
    // streaming: no state stores — every stage is a projection/filter
    val ss = EventsStreaming.streamSession(spark)
    val gated = Curation.rowLocalGate(StreamingQueries.readDocumentsStream(ss, dir))
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("q88_stateless_probe").start()
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).map(_.stateOperators).getOrElse(Array.empty)
    q.stop()
    assert(stateOps.isEmpty,
      s"row-local gate grew streaming state: ${stateOps.map(_.operatorName).mkString(",")}")
    // batch: the same function plans zero exchanges over the raw table
    val plan = Curation.rowLocalGate(Tables.documents(spark, dir))
      .queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, s"row-local gate shuffled:\n$plan")
  }
}
