package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q215: the ground-truth side must equal a driver-side ALL-PAIRS
  * exact Jaccard sweep (affordable at fixture scale — the query itself
  * never does this), spurious must be structurally zero (banded pairs
  * are exact-verified), and the counters must balance.
  */
class LshRecallSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("counters match the brute-force truth and balance") {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getString(1).split(" ").distinct.toSet).toSeq
    def j(a: Set[String], b: Set[String]): Double = {
      val i = (a & b).size
      BigDecimal(i.toDouble / (a.size + b.size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exact = (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib && j(ta, tb) >= Dedup.RecallTau
    } yield (ia, ib)).toSet
    val banded = Dedup.q32MinhashNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val row = Dedup.q215LshRecallEval(spark, dir).collect()(0)
    assert(row.getAs[Long]("n_exact") == exact.size.toLong)
    assert(row.getAs[Long]("n_banded") == banded.size.toLong)
    assert(row.getAs[Long]("n_missed") == (exact -- banded).size.toLong)
    assert(row.getAs[Long]("n_spurious") == 0L,
      "a banded pair is exact-verified by construction")
    assert(banded.subsetOf(exact))
    assert(row.getAs[Long]("n_exact") ==
      row.getAs[Long]("n_banded") + row.getAs[Long]("n_missed"))
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
  }
}
