package graft.plans

import graft.SparkSpec

/** q242 — cost-based join reordering. The oracle proves the answer;
  * this spec locks the MECHANISM: with CBO on and ANALYZE'd stats,
  * the deliberately fact-first join text must be reordered so the
  * small intermediate (orders against the filtered customer segment)
  * builds first; with CBO off the written left-to-right order stands.
  * In the plan's tree print the OUTER join comes first, so the shapes
  * are distinguished by which join key the inner (later-printed) join
  * carries.
  */
class CboReorderSpec extends SparkSpec {

  private def planOf(cbo: Boolean): String = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.cbo.enabled", cbo.toString)
    s.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    graft.queries.Relational.cboTables(s, "/root/testdata/sf0.001")
    graft.queries.Relational.cboJoin(s, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString
  }

  private def innerJoinKey(plan: String): String = {
    val joins = plan.linesIterator.filter(_.contains("Join Inner")).toSeq
    assert(joins.size == 2, s"expected a 2-join tree:\n$plan")
    joins.last
  }

  test("with stats the selective dim joins first; without, text order stands") {
    val withCbo = innerJoinKey(planOf(cbo = true))
    assert(withCbo.contains("o_custkey"),
      s"CBO did not reorder the customer join innermost: $withCbo")
    val noCbo = innerJoinKey(planOf(cbo = false))
    assert(noCbo.contains("l_orderkey"),
      s"baseline no longer joins in text order: $noCbo")
  }

  test("both orders answer identically") {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.cbo.enabled", "false")
    graft.queries.Relational.cboTables(s, "/root/testdata/sf0.001")
    val plain = graft.queries.Relational.cboJoin(s, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val reordered = graft.queries.Relational
      .q242CboReorder(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(plain == reordered, "join reordering changed the answer")
  }

  test("A-then-B-then-A multi-dataset sessions never cross datasets") {
    // The metastore is JVM-global: with globally-named tables, dataset
    // A's stats-done marker would answer A's re-invocation with B's
    // freshly-rebuilt rows. Name-scoping per dataset makes each
    // invocation read only its own tables — A's count must be stable
    // across an interleaved build of B.
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val (a, b) = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    graft.queries.Relational.cboTables(s, a)
    val first = graft.queries.Relational.cboJoin(s, a)
      .collect().map(_.toSeq).toSeq
    graft.queries.Relational.cboTables(s, b)
    graft.queries.Relational.cboTables(s, a) // marker hit — must still be A
    val again = graft.queries.Relational.cboJoin(s, a)
      .collect().map(_.toSeq).toSeq
    assert(first == again,
      s"dataset A's answer drifted after building B: $first vs $again")
    val bRows = graft.queries.Relational.cboJoin(s, b)
      .collect().map(_.toSeq).toSeq
    assert(bRows != first, "sf0.01 and sf0.001 should differ (sanity)")
  }
}
