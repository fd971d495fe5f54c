package graft.operators

import graft.SparkSpec

/** q212: each level's counters must equal a driver-side brute-force
  * shingle overlap (including the short-document whole-text fallback),
  * and contamination must be monotone non-increasing in n — any shared
  * n-shingle contains a shared m-shingle for m < n.
  */
class ContamLevelsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def shingles(text: String, n: Int): Set[String] = {
    val toks = text.trim.toLowerCase.split(" ").toSeq
    if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  test("levels match brute force and are monotone in n") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val rows = Curation.q212ContaminationLevels(spark, dir).collect()
      .map(r => r.getAs[Int]("ngram") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_contaminated"))).toMap
    assert(rows.keySet == Curation.ContamLevels.toSet)
    Curation.ContamLevels.foreach { n =>
      val bench = docs.filter(_._1 % 97 == 0)
        .map { case (id, t) => id -> shingles(t, n) }
      val train = docs.filter { case (id, _) => id % 5 == 0 && id % 97 != 0 }
        .map { case (id, t) => id -> shingles(t, n) }
      val pairs = for {
        (tid, ts) <- train
        (bid, bs) <- bench
        if ts.exists(bs.contains)
      } yield (tid, bid)
      assert(rows(n) == (pairs.size.toLong, pairs.map(_._1).distinct.size.toLong),
        s"level $n diverged from brute force")
    }
    val byN = Curation.ContamLevels.map(n => rows(n)._2)
    assert(byN.zip(byN.tail).forall { case (a, b) => a >= b },
      s"contamination must not grow with n: $byN")
    // the audit must SHOW the tradeoff on the fixture: the loosest
    // level flags something
    assert(rows(Curation.ContamLevels.head)._2 > 0L)
  }
}
