package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q249 — ExistenceJoin. The oracle proves the selected rows; this
  * spec locks the join TYPE (the disjunctive membership is one
  * existence join — a non-filtering semi join emitting an `exists`
  * bit — not a union-with-dedup of a semi join and a filter) and the
  * disjunct semantics: each side of the OR admits rows the other
  * rejects.
  */
class ExistenceJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("IN-subquery OR local predicate plans as an ExistenceJoin") {
    val df = graft.queries.PlannerMechanisms.q249ExistenceJoin(spark, sf)
    assert(df.queryExecution.optimizedPlan.toString.contains("ExistenceJoin"),
      s"disjunctive membership not planned as an existence join:\n" +
        df.queryExecution.optimizedPlan.toString)
  }

  test("each disjunct admits rows the other rejects") {
    val got = graft.queries.PlannerMechanisms.q249ExistenceJoin(spark, sf)
    val gotIds = got.collect().map(_.getLong(0)).toSet
    val docs = graft.sources.Tables.documents(spark, sf)
    val gold = graft.sources.Tables.embeddings(spark, sf)
      .filter(col("label") === 1).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = all.collect {
      case (id, n) if gold(id) || n >= 400 => id
    }.toSet
    assert(gotIds == want)
    // the OR is load-bearing in both directions on this fixture
    assert(all.exists { case (id, n) => gold(id) && n < 400 },
      "fixture has no membership-only row; disjunct untested")
    assert(all.exists { case (id, n) => !gold(id) && n >= 400 },
      "fixture has no predicate-only row; disjunct untested")
  }
}
