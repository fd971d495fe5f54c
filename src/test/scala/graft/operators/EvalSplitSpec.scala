package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q92's leakage-free eval split: no kept val doc has a train near-dup,
  * and val-internal duplicates are NOT evicted (they don't leak).
  */
class EvalSplitSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def isVal(id: Long): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    "%02x".format(d(0)).charAt(0) == '0'
  }

  test("kept val docs have no train near-dup; val-internal dups survive") {
    // the symmetric q32 pair graph is the ground truth: a val doc leaks
    // iff some verified pair connects it to a train doc
    val pairs = Dedup.q32MinhashNeardup(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sample = graft.sources.Tables.documentsSharded(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val valDocs = sample.filter(isVal)
    val leaked = pairs.flatMap { case (a, b) =>
      Seq(a).filter(x => isVal(x) && !isVal(b)) ++
        Seq(b).filter(x => isVal(x) && !isVal(a))
    }.toSet
    val kept = Dedup.q92EvalSplit(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(valDocs.nonEmpty, "hash split produced an empty val set")
    assert(kept == valDocs -- leaked,
      s"missing=${(valDocs -- leaked) -- kept} extra=${kept -- (valDocs -- leaked)}")
    // val-internal pairs with no train partner must both survive
    val valInternal = pairs.collect {
      case (a, b) if isVal(a) && isVal(b) => Seq(a, b)
    }.flatten.toSet -- leaked
    assert(valInternal.forall(kept),
      s"val-internal dup evicted: ${valInternal.filterNot(kept)}")
  }
}
