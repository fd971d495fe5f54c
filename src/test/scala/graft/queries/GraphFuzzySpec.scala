package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextAnalysis

/** Semantics checks for the fuzzy-join / outlier / sweep / closure
  * tier (q111-q115): the deletion-neighborhood join must recover the
  * uncorrupted word, outliers must genuinely sit 3 sigmas out, the
  * concurrency sweep must be bounded by the active-session count, the
  * correlated subquery must decorrelate to the manual join plan's
  * results, and pointer doubling must reproduce the arithmetic
  * ancestor chain exactly.
  */
class GraphFuzzySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q111 recovers the source word for every corrupted token") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), element_at(split(col("text"), " "), 1).as("tok"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val matches = TextAnalysis.q111FuzzyJoin(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("suggestion")).toSet).toMap
    docs.foreach { case (id, tok) =>
      assert(matches.getOrElse(id, Set.empty).contains(tok),
        s"doc $id: corrupted '$tok' did not match its source word")
    }
    // and every suggestion is at edit distance exactly 1 (one deletion)
    val out = TextAnalysis.q111FuzzyJoin(spark, dir).collect()
    out.foreach { r =>
      val c = r.getAs[String]("corrupted"); val w = r.getAs[String]("suggestion")
      assert(w.length == c.length + 1)
      assert((0 to c.length).exists(i =>
        w.substring(0, i) + w.substring(i + 1) == c),
        s"'$c' is not a single deletion of '$w'")
    }
  }

  test("q112 outliers all sit three sample sigmas from the group mean") {
    val rows = StatsQueries.q112ZscoreOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getAs[Double]("z")) >= 2.9995))
  }

  test("q113 peak concurrency is positive and bounded by active sessions") {
    val rows = TimeSeriesQueries.q113MaxConcurrency(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val peak = r.getAs[Long]("max_concurrent")
      assert(peak >= 1L && peak <= r.getAs[Long]("n_active"))
    }
    // the fixture genuinely overlaps somewhere, or the sweep is untested
    assert(rows.exists(_.getAs[Long]("max_concurrent") > 1L))
  }

  test("q114 correlated subquery equals the manual decorrelated join") {
    val sql = StatsQueries.q114CorrelatedSubquery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val o = graft.sources.Tables.orders(spark, dir)
    val nF = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_f"))
    val big = o.filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey")).distinct()
    val manual = graft.sources.Tables.customer(spark, dir)
      .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
      .join(nF, col("c_custkey") === nF("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_f"), lit(0L)).as("n_f"))
      .orderBy(col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sql.sameElements(manual))
  }

  test("q115 pointer doubling equals the arithmetic ancestor chain") {
    val nodes = graft.sources.Tables.events(spark, dir)
      .select(col("user_id")).filter(col("user_id") >= 1L).distinct()
      .collect().map(_.getLong(0)).toSet
    // the chain follows EDGES: it extends past an ancestor only if that
    // ancestor is itself a node (has an outgoing parent edge)
    val expected = nodes.flatMap { n =>
      val chain = Iterator.iterate(Option(n)) {
        case Some(cur) if nodes.contains(cur) && cur / 2 >= 1L => Some(cur / 2)
        case _ => None
      }.drop(1).takeWhile(_.isDefined).map(_.get).toList
      chain.zipWithIndex.map { case (anc, i) => (n, anc, (i + 1).toLong) }
    }
    val got = OperatorQueries.q115HierarchyClosure(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"closure mismatch: missing=${expected -- got} extra=${got -- expected}")
  }
}
