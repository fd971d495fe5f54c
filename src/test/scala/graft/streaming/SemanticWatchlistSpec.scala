package graft.streaming

import graft.SparkSpec

/** q203's semantic watchlist gate: statelessness (two stream-static
  * joins must register no state operator), flag soundness (every pair
  * is a non-self match against a % 97 watchlist member at cos >= tau),
  * and parity with a brute-force batch recompute of the exact
  * integer-scaled cosine.
  */
class SemanticWatchlistSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def lifted(): Array[(Long, Array[Long])] =
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(graft.operators.AnnTestKit.lift).toArray)
      .sortBy(_._1)

  test("flags equal the brute-force watchlist scan") {
    import graft.operators.AnnTestKit.{dot, r6}
    val vecs = lifted()
    val watch = vecs.filter(_._1 % 97 == 0)
    val expected = (for {
      (id, sv) <- vecs; (bid, wsv) <- watch; if id != bid
      cos = r6(dot(sv, wsv).toDouble /
        math.sqrt(dot(sv, sv).toDouble) / math.sqrt(dot(wsv, wsv).toDouble))
      if cos >= 0.3
    } yield (id, bid, cos)).toSet
    assert(expected.nonEmpty)
    val got = StreamingQueries.q203StreamSemanticWatchlist(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("the watchlist gate is stateless") {
    val ss = EventsStreaming.streamSession(spark)
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(ss, dir)
      .select(col("vec_id").as("doc_id"), col("label"))
    val watch = graft.sources.Tables.embeddings(ss, dir)
      .filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("bench_id"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("bench_id")))
    val q = StreamingQueries.readDocumentsStream(ss, dir)
      .select(col("doc_id"))
      .join(emb, Seq("doc_id"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("doc_id")))
      .join(broadcast(watch), Seq("_k"))
      .select(col("doc_id"), col("bench_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("q203_stateless_probe").start()
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).map(_.stateOperators)
      .getOrElse(Array.empty)
    q.stop()
    assert(stateOps.isEmpty,
      s"watchlist gate grew streaming state: ${stateOps.map(_.operatorName).mkString(",")}")
  }
}
