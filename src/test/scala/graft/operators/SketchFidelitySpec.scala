package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q217: the calibration table must equal a from-scratch driver-side
  * recomputation of the whole sketch (independent md5 minhash
  * windows, band keys, candidate set, agreement count, exact
  * Jaccard) — the strongest possible anti-drift pin for the
  * signature scheme — and must be monotone where the math says so.
  */
class SketchFidelitySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("table equals the from-scratch sketch recomputation") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSeq).toSeq
    // 8 minhashes: two salted digests, four 8-hex windows each
    def sig(toks: Seq[String]): IndexedSeq[String] =
      (0 until 8).map { i =>
        val salt = if (i < 4) "0|" else "1|"
        val off = (i % 4) * 8
        toks.map(t => md5hex(salt + t).substring(off, off + 8)).min
      }
    val sigs = docs.map { case (id, t) => id -> sig(t) }.toMap
    def bkeys(s: IndexedSeq[String]): Seq[String] =
      Seq("0:" + s.slice(0, 4).mkString, "1:" + s.slice(4, 8).mkString)
    val cands = for {
      (ia, _) <- docs; (ib, _) <- docs
      if ia < ib && bkeys(sigs(ia)).toSet.intersect(bkeys(sigs(ib)).toSet).nonEmpty
    } yield (ia, ib)
    val tokSets = docs.map { case (id, t) => id -> t.toSet }.toMap
    val expected = cands.map { case (ia, ib) =>
      val agree = sigs(ia).zip(sigs(ib)).count { case (a, b) => a == b }
      val sa = tokSets(ia); val sb = tokSets(ib)
      val i = (sa & sb).size
      val j = BigDecimal(i.toDouble / (sa.size + sb.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (agree, j >= 0.9)
    }.groupBy(_._1).map { case (agree, xs) =>
      agree -> (xs.length.toLong, xs.count(_._2).toLong)
    }
    val rows = Dedup.q217SketchFidelity(spark, dir).collect()
    assert(rows.map(r => r.getAs[Int]("n_agree") ->
      (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_above"))).toMap == expected)
    // every candidate shares a full band: agreement >= the band width
    assert(rows.forall(_.getAs[Int]("n_agree") >= 4))
    rows.foreach(r =>
      assert(r.getAs[Long]("n_above") <= r.getAs[Long]("n_pairs")))
  }
}
