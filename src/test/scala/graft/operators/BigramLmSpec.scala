package graft.operators

import graft.SparkSpec

/** q158's bigram model against a full in-memory recomputation — both
  * the emitted integer-exact aggregates (n_bigrams / sum_cbg /
  * sum_cctx / vsz, the hash-stable driver contract) and the spec-only
  * NLL view (the add-1 smoothed semantics the aggregates describe) —
  * plus the zero-bigram edge (1-token docs drop out instead of
  * emitting nulls) and the ordering sanity that repeated sequences
  * score better than novel ones under the corpus's own model.
  */
class BigramLmSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def bruteModel(docs: Array[(Long, Array[String])]) = {
    val bigrams = docs.flatMap { case (id, t) =>
      t.zip(t.drop(1)).map { case (p, c) => (id, p, c) }
    }
    val cbg = bigrams.groupBy(t => (t._2, t._3)).map { case (k, g) => k -> g.length }
    val cctx = bigrams.groupBy(_._2).map { case (k, g) => k -> g.length }
    val v = docs.flatMap(_._2).distinct.length
    (bigrams, cbg, cctx, v)
  }

  test("q158 emitted aggregates equal a brute-force bigram model recomputation") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.trim.split(" ", -1)))
    val (bigrams, cbg, cctx, v) = bruteModel(docs)
    val expected = bigrams.groupBy(_._1).map { case (id, g) =>
      id -> (g.length.toLong,
        g.map { case (_, p, c) => cbg((p, c)).toLong }.sum,
        g.map { case (_, p, _) => cctx(p).toLong }.sum,
        v.toLong)
    }
    val got = TextAnalysis.q158BigramLmScore(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id aggregates: ${got(id)} vs $e")
    }
  }

  test("spec-only NLL view equals the brute-force add-1 smoothed model") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.trim.split(" ", -1)))
    val (bigrams, cbg, cctx, v) = bruteModel(docs)
    // HALF_UP at the rounding point — the contract Spark's round()
    // shares (math.rint's half-to-even differs on exact .5 boundaries)
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = bigrams.groupBy(_._1).map { case (id, g) =>
      val nlls = g.map { case (_, p, c) =>
        r6(-math.log((cbg((p, c)) + 1.0) / (cctx(p) + v.toDouble)))
      }
      id -> (g.length.toLong, nlls.sum)
    }
    val got = TextAnalysis.bigramNll(
        graft.sources.Tables.documents(spark, dir).select("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), BigDecimal(r.getDecimal(2)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, nll)) =>
      assert(got(id)._1 == n, s"doc $id bigram count")
      assert(got(id)._2 == nll, s"doc $id sum_nll: ${got(id)._2} vs $nll")
    }
  }

  test("1-token docs yield no bigrams; repeated sequences outscore novel ones") {
    import spark.implicits._
    val frame = Seq(
      (1L, "solo"),
      (2L, "alpha beta alpha beta alpha beta"),
      (3L, "alpha gamma beta delta gamma alpha")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(frame).collect()
      .map(r => r.getLong(0) ->
        (BigDecimal(r.getDecimal(2)) / r.getLong(1))).toMap
    assert(!out.contains(1L), "a 1-token doc produced a bigram row")
    assert(out(2L) < out(3L),
      "the repeated-bigram doc must score a LOWER mean NLL than the novel-bigram doc")
  }
}
