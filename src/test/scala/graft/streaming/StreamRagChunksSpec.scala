package graft.streaming

import graft.SparkSpec

/** q225: the streamed chunk table must equal the batch chunker's
  * output exactly — same function, same rows, proven end-to-end
  * through a real micro-batch execution.
  */
class StreamRagChunksSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("stream output equals the batch chunk table row-for-row") {
    val streamed = StreamingQueries.q225StreamRagChunks(spark, dir).collect()
    val batch = graft.operators.TextAnalysis
      .q222RagChunking(spark, dir).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq,
      "stream/batch chunk parity broken")
    assert(streamed.nonEmpty)
  }
}
