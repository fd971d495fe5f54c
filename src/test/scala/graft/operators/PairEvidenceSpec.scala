package graft.operators

import graft.SparkSpec

/** q228: evidence rows must match a driver-side brute force over the
  * verified pairs (span inventories, intersections, containment), and
  * every verified pair must carry evidence — a near-dup pair whose
  * span sets are disjoint would mean the alphabet drifted.
  */
class PairEvidenceSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def spans(text: String): Set[String] = {
    val toks = text.trim.toLowerCase.split(" ", -1).toSeq
    if (toks.length < Dedup.SpanLen) Set(toks.mkString(" "))
    else toks.sliding(Dedup.SpanLen).map(_.mkString(" ")).toSet
  }

  test("evidence matches brute force; every pair carries some") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> spans(r.getString(1))).toMap
    val pairs = Dedup.q32MinhashNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val rows = Dedup.q228PairEvidence(spark, dir).collect()
    assert(rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet == pairs,
      "evidence must cover exactly the verified pairs")
    rows.foreach { r =>
      val sa = docs(r.getAs[Long]("doc_a")); val sb = docs(r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("na_spans") == sa.size.toLong)
      assert(r.getAs[Long]("nb_spans") == sb.size.toLong)
      val shared = (sa & sb).size.toLong
      assert(r.getAs[Long]("n_shared") == shared)
      val cont = BigDecimal(shared.toDouble / math.min(sa.size, sb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("containment") == cont)
    }
    assert(rows.nonEmpty)
    // the evidence SEPARATES duplication kinds — and the fixture
    // exercises both: verbatim-span sharers (n_shared > 0) and
    // REORDERED near-dups (same token set, zero shared 8-spans —
    // e.g. pair (10, 30); token-set Jaccard can't see order, span
    // evidence can, which is exactly why the audit exists)
    assert(rows.exists(_.getAs[Long]("n_shared") > 0L),
      "no pair shares any span — alphabet drift")
    assert(rows.exists(_.getAs[Long]("n_shared") == 0L),
      "fixture lost its reordered-near-dup class")
  }
}
