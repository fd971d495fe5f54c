package graft.operators

import graft.SparkSpec

/** q224: the three status buckets must equal a driver-side brute-force
  * shingle-inventory diff (per-doc distinct shingles, document
  * frequencies), and together they must partition the corpus's full
  * shingle inventory.
  */
class NgramDiffSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def shingles(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split(" ", -1).toSeq
    if (toks.length < 3) Set(toks.mkString(" "))
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("buckets match brute force and partition the inventory") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> shingles(r.getString(1))).toSeq
    def dfOf(side: Seq[(Long, Set[String])]): Map[String, Long] =
      side.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfA = dfOf(docs.filter(_._1 % 10 != 0))
    val dfB = dfOf(docs.filter(_._1 % 10 == 0))
    val all = dfA.keySet ++ dfB.keySet
    val expected = all.groupBy { t =>
      (dfA.contains(t), dfB.contains(t)) match {
        case (true, true) => "both"
        case (true, false) => "only_standing"
        case _ => "only_delta"
      }
    }.map { case (status, ts) =>
      status -> (ts.size.toLong,
        ts.toSeq.map(t => dfA.getOrElse(t, 0L)).sum,
        ts.toSeq.map(t => dfB.getOrElse(t, 0L)).sum,
        ts.min)
    }
    val rows = TextAnalysis.q224VocabDiff(spark, dir).collect()
    assert(rows.map(r => r.getAs[String]("status") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("df_standing"),
        r.getAs[Long]("df_delta"), r.getAs[String]("example_token"))).toMap
      == expected)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == all.size.toLong,
      "buckets must partition the shingle inventory")
    assert(rows.length == 3,
      "fixture must populate all three novelty buckets")
  }
}
