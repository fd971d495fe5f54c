package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q159 (dedup provenance), q160 (interleave order), q161 (dimension
  * stats): the audit/assembly operators, each checked against the
  * primitive it derives from.
  */
class AssemblyAuditSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q159 provenance covers exactly q32's discard set with consistent evidence") {
    val pairs = Dedup.q32MinhashNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val prov = Dedup.q159DedupProvenance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4)))
    assert(prov.nonEmpty, "fixture has no discards")
    assert(prov.map(_._1).toSet == pairs.map(_._2).toSet,
      "provenance doc set != distinct doc_b of the verified pairs")
    val byB = pairs.groupBy(_._2)
    prov.foreach { case (doc, keeper, kj, nEv, maxJ) =>
      val ev = byB(doc)
      assert(keeper == ev.map(_._1).min && keeper < doc)
      assert(kj == ev.filter(_._1 == keeper).head._3,
        s"doc $doc keeper_jaccard mismatch")
      assert(nEv == ev.length && maxJ == ev.map(_._3).max)
    }
  }

  test("q160 seq is the exact lexicographic (round, source) permutation") {
    val rows = Curation.q160InterleaveOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(rows.map(_._4).sorted.sameElements(1L to n),
      "seq is not a permutation of 1..N")
    // the arithmetic position must equal the position under an actual
    // sort by (round, source) — the round-robin schedule
    val expected = rows.sortBy { case (_, s, r, _) => (r, s) }.map(_._1)
    val got = rows.sortBy(_._4).map(_._1)
    assert(got.sameElements(expected), "seq order != (round, source) order")
    // within a source, seq must be increasing in the per-source rank
    rows.groupBy(_._2).values.foreach { g =>
      val bySeq = g.sortBy(_._4).map(_._3)
      assert(bySeq.sameElements(bySeq.sorted), "per-source rank order broken")
    }
  }

  test("q161 moments match a brute-force recomputation per dimension") {
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1e6)).toArray)
    val dim = vecs.head.length
    val rows = Similarity.q161DimensionStats(spark, dir).collect()
    assert(rows.length == dim)
    assert(rows.map(_.getInt(4)).sorted.sameElements(1 to dim),
      "var_rank is not a permutation")
    rows.foreach { r =>
      val (pos, n) = (r.getInt(0), r.getLong(1))
      assert(n == vecs.length)
      val xs = vecs.map(_(pos))
      val sx = xs.map(BigDecimal(_)).sum
      val sxx = xs.map(x => BigDecimal(x) * BigDecimal(x)).sum
      val mean = (sx.toDouble / n) / 1e6
      val variance = (sxx.toDouble / n -
        (sx.toDouble / n) * (sx.toDouble / n)) / 1e12
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(2) == r6(mean), s"dim $pos mean")
      assert(r.getDouble(3) == r6(variance), s"dim $pos variance")
      assert(r.getDouble(3) >= 0.0)
    }
  }
}
