package graft.operators

import graft.SparkSpec

/** q77 (bucketed embedding near-dup pairs) against q36 (the exact
  * nested-loop baseline it replaces at scale): every bucketed pair must
  * exist in the exact scan with identical cosine/label values, and the
  * plan must be the bucket equi-join — not a nested loop.
  */
class SimilarityBucketedSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q77 pairs are a value-identical subset of the exact q36 scan") {
    val exact = Similarity.q36EmbeddingNeardup(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        (r.getAs[Double]("cos"), r.getAs[Boolean]("same_label"))).toMap
    val bucketed = Similarity.q77EmbeddingNeardupBucketed(spark, dir).collect()
    assert(bucketed.nonEmpty, "bucketed pair scan found no pairs on the fixture")
    bucketed.foreach { r =>
      val k = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(exact.contains(k), s"pair $k not in the exact scan")
      assert(exact(k) == (r.getAs[Double]("cos"), r.getAs[Boolean]("same_label")),
        s"pair $k differs from the exact scan")
    }
  }

  test("q156 top-k equals a per-vector sort of the symmetrized candidates") {
    val pairs = Similarity.bandedPairScan(spark, dir, None, minCos = -1.0)
      .select("vec_a", "vec_b", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sym = pairs ++ pairs.map { case (a, b, c) => (b, a, c) }
    val expected = sym.groupBy(_._1).toSeq.flatMap { case (v, g) =>
      g.sortBy { case (_, nbr, c) => (-c, nbr) }.take(Similarity.KnnK)
        .zipWithIndex.map { case ((_, nbr, c), i) => (v, i + 1, nbr, c) }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.q156KnnGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty, "knn graph is empty on the fixture")
    assert(got == expected, "q156 drifted from the brute-force candidate sort")
    // every vector with at least one candidate appears, and ranks are
    // dense from 1
    got.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sorted == (1 to g.length).toList)
    }
  }

  test("q165 sketch cosines match a brute-force projection; JL error stays bounded") {
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray).toMap
    def proj(v: Array[Long]): Array[Long] =
      Similarity.pairPlanes.map(p => p.indices.map(i => v(i) * p(i)).sum)
    val rows = Similarity.q165JlSketch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (a, b, _, cs) =>
      val (pa, pb) = (proj(vecs(a)), proj(vecs(b)))
      val dot = pa.zip(pb).map { case (x, y) => x * y }.sum.toDouble
      val expected = r6(dot / math.sqrt(pa.map(x => x * x).sum.toDouble) /
        math.sqrt(pb.map(x => x * x).sum.toDouble))
      assert(cs == expected, s"pair ($a,$b) sketch cosine drifted")
    }
    // JL sanity: the 16-plane sketch stays in the ~1/sqrt(k) error
    // regime ON AVERAGE (individual pairs can and do stray — one
    // sf0.001 pair's sketch cosine is negative; that is the lossiness
    // the fidelity report exists to expose, not a bug)
    val errs = rows.map { case (_, _, co, cs) => math.abs(co - cs) }
    assert(errs.sum / errs.length < 0.4,
      s"mean JL error ${errs.sum / errs.length} out of regime")
  }

  test("q79 keepers and the full pair scan's discards partition the vectors") {
    val discards = Similarity.bandedPairScan(spark, dir, None)
      .select("vec_b").distinct().collect().map(_.getLong(0)).toSet
    val keepers = Similarity.q79EmbeddingKeepers(spark, dir)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val all = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(discards.nonEmpty && keepers.nonEmpty)
    assert(keepers.intersect(discards).isEmpty, "a discarded vector was kept")
    assert(keepers ++ discards == all, "keep/discard must partition the set")
  }

  test("q77 plans a bucket equi-join, never a nested loop") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = Similarity.q77EmbeddingNeardupBucketed(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
