package graft.plans

import graft.SparkSpec

/** q240 — recursive CTE. The oracle proves the answers; this spec
  * pins the MECHANISM (the plan runs Spark's recursive-union loop, not
  * some unrolled rewrite) and cross-checks the per-depth report
  * against an independent in-memory fixpoint on the same fixture.
  */
class RecursiveCteSpec extends SparkSpec {

  test("the plan executes through UnionLoop / UnionLoopRef") {
    val df = graft.queries.OperatorQueries
      .q240RecursiveCte(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"),
      s"recursive CTE did not plan a recursive union loop:\n$plan")
    assert(plan.contains("UnionLoopRef"),
      "no recursive self-reference in the loop body")
  }

  test("per-depth counts match an in-memory ancestor fixpoint") {
    import org.apache.spark.sql.functions._
    val nodes = graft.sources.Tables
      .events(spark, "/root/testdata/sf0.001")
      .select(col("user_id")).filter(col("user_id") >= 1L)
      .distinct().collect().map(_.getLong(0)).toSet
    // (node, anc, d) closure over parent = node/2, edges restricted to
    // observed nodes (matching the view: child must be an event user)
    val pairs = nodes.toSeq.filter(_ >= 2).flatMap { n =>
      Iterator.iterate(n / 2)(_ / 2).takeWhile(_ >= 1)
        .zipWithIndex.map { case (a, i) => (n, a, i + 1L) }
    }
    // q240's recursion only extends through ancestors that are
    // themselves edge children: drop chain steps whose intermediate
    // is not an observed node
    val reachable = pairs.filter { case (n, _, d) =>
      (1L until d).forall { i =>
        nodes.contains(Iterator.iterate(n)(_ / 2).drop(i.toInt).next())
      }
    }
    val want = reachable.groupBy(_._3).map { case (d, ps) =>
      d -> (ps.size.toLong, ps.map(_._1).distinct.size.toLong,
        ps.map(_._2).distinct.size.toLong)
    }
    val got = graft.queries.OperatorQueries
      .q240RecursiveCte(spark, "/root/testdata/sf0.001")
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"recursive report drifted: $got vs $want")
  }
}
