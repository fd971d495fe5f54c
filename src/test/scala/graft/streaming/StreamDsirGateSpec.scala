package graft.streaming

import graft.SparkSpec

/** q193's batch/stream parity — the ingest DSIR gate's row-local
  * decimal fold must reproduce q189's batch per-doc weights exactly —
  * and its statelessness (the 1-row model join grows no streaming
  * state).
  */
class StreamDsirGateSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("stream gate equals the batch w6 >= 0 slice row for row") {
    import org.apache.spark.sql.functions._
    val batch = graft.operators.TextAnalysis.dsirScored(spark, dir)
      .filter(col("w6") >= 0)
      .select(col("doc_id"), col("lang"), col("n_toks")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val stream = StreamingQueries.q193StreamDsirGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch.nonEmpty && batch.size < 500,
      s"gate should split the 500-doc fixture, kept ${batch.size}")
    assert(stream == batch,
      s"missing=${(batch -- stream).take(3)} extra=${(stream -- batch).take(3)}")
  }

  test("the ingest DSIR gate is stateless") {
    val ss = EventsStreaming.streamSession(spark)
    // rebuild the gate's streaming shape and probe its progress: the
    // 1-row model join + row-local fold must register no state operator
    val q = {
      import org.apache.spark.sql.functions._
      val tgt = graft.operators.TextAnalysis.DsirTargetLang
      val g = graft.sources.Tables.documents(ss, dir)
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), " ")).as("tok"))
      val cr = g.groupBy(col("tok")).agg(count(lit(1)).as("cr"))
      val model = cr.agg(
        map_from_entries(collect_list(struct(col("tok"), col("cr"))))
          .as("crm"),
        sum(col("cr")).as("n_r"))
        .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_r")))
      StreamingQueries.readDocumentsStream(ss, dir)
        .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_chars")))
        .join(model, Seq("_k"))
        .select(col("doc_id"), col("n_r"))
        .writeStream.outputMode("append")
        .format("memory").queryName("q193_stateless_probe").start()
    }
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).map(_.stateOperators)
      .getOrElse(Array.empty)
    q.stop()
    assert(stateOps.isEmpty,
      s"DSIR gate grew streaming state: ${stateOps.map(_.operatorName).mkString(",")}")
  }
}
