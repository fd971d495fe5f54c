package graft.operators

import graft.SparkSpec

/** q157's content-defined chunking: the defining CDC property is that
  * an edit disturbs only the chunk containing it — every chunk of the
  * original document except the one fused with the insertion reappears
  * byte-identical in the edited document (a fixed-window spanner shifts
  * ALL downstream spans instead). Plus the per-doc stats contract on
  * the fixture.
  */
class CdcChunkSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def isBoundary(tok: String): Boolean =
    java.lang.Long.parseLong(md5hex(tok).take(4), 16) % Dedup.ChunkMod == 0

  test("insertion at the front disturbs only the first chunk") {
    import spark.implicits._
    // tokens w0..w59: the hash predicate scatters boundaries among them
    val toks = (0 until 60).map(i => s"w$i")
    assert(toks.exists(isBoundary), "fixture tokens have no boundary — widen the list")
    val ins = Seq("ins0", "ins1", "ins2")
    val a = toks.mkString(" ")
    val b = (ins ++ toks).mkString(" ")
    val chunks = Dedup.cdcChunkFrame(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val ca = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val cb = chunks.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSet
    assert(ca.length >= 3, s"expected several chunks, got ${ca.length}")
    // every chunk of A except the first (fused with the insertion
    // unless the insertion happens to end at a boundary) survives in B
    assert(ca.tail.forall(cb.contains),
      "a chunk beyond the edit region changed — chunking is not content-defined")
  }

  test("per-doc stats: totals add up and canonical-first means zero dups for uniques") {
    val rows = Dedup.q157CdcChunks(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nCh, nDup, dupTok, frac) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nCh >= 1 && nCh <= nTok)
      assert(nDup <= nCh && dupTok <= nTok)
      assert(math.abs(frac - math.rint(dupTok.toDouble / nTok * 1e6) / 1e6) < 1e-9)
    }
    // the corpus has duplicated chunks (shared boilerplate) — the
    // operator must actually find some, or the fixture stopped
    // exercising it
    assert(rows.map(_.getLong(3)).sum > 0, "no duplicate chunks found corpus-wide")
  }
}
