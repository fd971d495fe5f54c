package graft.functions

import graft.SparkSpec

/** q259 — V2 function-catalog resolution. The oracle proves the
  * report's values; this spec locks the MECHANISM: the catalog
  * function must resolve through graft_fns.ops, bind against
  * (string, int), and plan through the MAGIC `invoke` path — a
  * codegen'd Invoke on the bound instance, never the interpreted
  * ApplyFunctionExpression fallback.
  */
class V2FunctionSpec extends SparkSpec {

  private def session() = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.catalog.graft_fns",
      classOf[GraftFunctionCatalog].getName)
    s
  }

  test("the magic-invoke path plans; the interpreted fallback does not") {
    val df = graft.queries.PlannerMechanisms
      .catalogFnReport(session(), "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("invoke"),
      s"expected the magic Invoke on the bound function:\n$plan")
    assert(!plan.contains("ApplyFunctionExpression"),
      s"planner fell back to interpreted row-based evaluation:\n$plan")
  }

  test("binding rejects a wrong input shape") {
    val s = session()
    graft.sources.Tables.documents(s, "/root/testdata/sf0.001")
      .createOrReplaceTempView("graft_q259_docs")
    val e = intercept[Exception] {
      s.sql("SELECT graft_fns.ops.clip_len(doc_id, 500) FROM graft_q259_docs")
        .collect()
    }
    assert(e.getMessage.contains("clip_len"), e.getMessage)
  }

  test("clip semantics: below-cap lengths pass through, above-cap clip") {
    val s = session()
    s.range(1).createOrReplaceTempView("graft_one")
    val r = s.sql(
      """SELECT graft_fns.ops.clip_len('abc', 500) AS a,
        |  graft_fns.ops.clip_len(repeat('x', 600), 500) AS b
        |FROM graft_one""".stripMargin).collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 500)
  }
}
