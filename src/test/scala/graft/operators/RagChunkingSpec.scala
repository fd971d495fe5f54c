package graft.operators

import graft.SparkSpec

/** q222: chunks must match a driver-side brute force (offsets, true
  * lengths, md5 content hashes), cover every token position, and
  * overlap by exactly len−stride between consecutive interior chunks.
  */
class RagChunkingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  val L = TextAnalysis.ChunkLen
  val S = TextAnalysis.ChunkStride

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunks match brute force, cover the doc, and overlap correctly") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split(" ", -1).toSeq).toMap
    val rows = TextAnalysis.q222RagChunking(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(rows.keySet == docs.keySet, "every document must chunk")
    rows.foreach { case (id, chunks) =>
      val toks = docs(id)
      val n = toks.length
      val expectedCount = 1 + (math.max(0, n - L) + S - 1) / S
      assert(chunks.length == expectedCount, s"chunk count of doc $id")
      val sorted = chunks.sortBy(_.getAs[Int]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Int]("chunk_idx") == i)
        assert(c.getAs[Long]("start_tok") == i.toLong * S)
        val slice = toks.slice(i * S, i * S + L)
        assert(c.getAs[Long]("n_tokens") == slice.length.toLong)
        assert(c.getAs[String]("chunk_hash") == md5hex(slice.mkString(" ")),
          s"hash of chunk $i in doc $id")
      }
      // coverage: the final chunk reaches the last token
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_tokens") >= n,
        s"doc $id tail uncovered")
      // interior consecutive chunks overlap by exactly L - S tokens
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          if (a.getAs[Long]("n_tokens") == L.toLong)
            assert(a.getAs[Long]("start_tok") + L - b.getAs[Long]("start_tok")
              == (L - S).toLong)
        case _ =>
      }
    }
  }
}
