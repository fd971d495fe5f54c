package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q134-q137: the deterministic corpus-partitioning tier. Folds must
  * cover the corpus exactly once, the source cap must keep the top-12
  * by length and nothing else, the weighted sampler must accept every
  * full-weight doc and be run-stable, and the PageRank surface must
  * rank every supplier with conserved positive mass.
  */
class CorpusSplitSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q134 folds are in range and cover every document exactly once") {
    val rows = Curation.q134KfoldSplit(spark, dir).collect()
    val folds = rows.map(_.getAs[Int]("fold"))
    assert(folds.toSet.subsetOf((0 until 5).toSet))
    // disjointness + coverage: the per-fold counts must sum to the corpus
    val total = graft.sources.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // a 5-way md5 split of a non-trivial corpus leaves no fold empty
    assert(folds.length == 5, s"expected 5 folds, got ${folds.length}")
  }

  test("q135 cap keeps min(n,12) per source and exactly the longest docs") {
    val rows = Curation.q135SourceCap(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs"); val kept = r.getAs[Long]("n_kept")
      assert(kept == math.min(n, 12L),
        s"source ${r.getAs[String]("source")}: n=$n kept=$kept")
      assert(r.getAs[Long]("kept_chars") <= r.getAs[Long]("total_chars"))
    }
    // kept_chars must equal the sum of each source's top-12 lengths
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("source", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.sortBy(t => (-t._2, t._3)).take(12).map(_._2).sum
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_chars") == expected(r.getAs[String]("source")))
    }
  }

  test("q136 accepts every full-weight doc and is stable across runs") {
    val a = Curation.q136WeightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = Curation.q136WeightedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.sameElements(b), "weighted sample must be run-deterministic")
    // w = min(n_chars,400)/400 == 1 ⇒ u32·400 < 400·2^32 always (u32 < 2^32)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val fullWeight = docs.filter(_._2 >= 400L).groupBy(_._1).view.mapValues(_.length.toLong)
    a.foreach { case (src, _, nSampled, _) =>
      fullWeight.get(src).foreach(fw =>
        assert(nSampled >= fw, s"$src: sampled $nSampled < $fw full-weight docs"))
    }
    // sampling is a subset: never more sampled than present
    a.foreach { case (src, n, s, _) => assert(s <= n, s"$src: $s > $n") }
  }

  test("q137 ranks every supplier with positive mass, sorted descending") {
    val rows = graft.queries.OperatorQueries.q137Pagerank(spark, dir).collect()
    val li = graft.sources.Tables.lineitem(spark, dir)
    val nSupp = li.select("l_suppkey").distinct().count()
    val nPart = li.select("l_partkey").distinct().count()
    assert(rows.length == nSupp, s"${rows.length} ranked vs $nSupp suppliers")
    val ranks = rows.map(_.getAs[Long]("rank_scaled"))
    // the teleport term floors every node at 0.15/N (integer-truncated)
    val floor = 150000000L / (nSupp + nPart)
    assert(ranks.forall(_ >= floor), s"rank below teleport floor $floor")
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y }, "descending")
    // supplier-side mass is bounded by the whole graph's unit mass
    val total = ranks.sum
    assert(total > floor * nSupp && total < 1000000000L, s"mass=$total")
  }
}
