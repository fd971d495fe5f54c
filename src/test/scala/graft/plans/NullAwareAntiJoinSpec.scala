package graft.plans

import graft.SparkSpec

/** q245 — null-aware anti join. The oracle proves the surviving rows;
  * this spec locks the MECHANISM (the single-column NOT IN is planned
  * as BroadcastHashJoin LeftAnti with isNullAwareAntiJoin=true — the
  * trailing `true` in the plan line) and the two tri-valued-logic
  * halves a left_anti would get wrong: a NULL probe key is dropped,
  * and a NULL build key drops EVERYTHING.
  */
class NullAwareAntiJoinSpec extends SparkSpec {

  test("NOT IN plans as a null-aware anti join") {
    val df = graft.queries.PlannerMechanisms
      .q245NullAwareAntiJoin(spark, "/root/testdata/sf0.001")
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("LeftAnti") &&
          l.trim.endsWith("true")),
      s"NOT IN did not plan a null-aware anti join:\n$plan")
  }

  test("a NULL probe key is dropped; a NULL build key drops everything") {
    import spark.implicits._
    Seq((1, Option.empty[Long]), (2, Some(2L)), (3, Some(3L)))
      .toDF("id", "k").createOrReplaceTempView("naaj_probe")
    Seq(Some(3L)).toDF("k").createOrReplaceTempView("naaj_build")
    Seq(Some(3L), Option.empty[Long]).toDF("k")
      .createOrReplaceTempView("naaj_build_null")
    // id=1 has a NULL key: its absence from the build set is unknowable
    // under tri-valued logic, so NOT IN drops it (left_anti would keep it)
    val kept = spark.sql(
      "SELECT id FROM naaj_probe WHERE k NOT IN (SELECT k FROM naaj_build)")
      .collect().map(_.getInt(0)).sorted
    assert(kept.sameElements(Array(2)), s"got ${kept.mkString(",")}")
    // one NULL in the build set: NO row can be proven absent
    val none = spark.sql(
      "SELECT id FROM naaj_probe WHERE k NOT IN (SELECT k FROM naaj_build_null)")
      .count()
    assert(none == 0, s"build-side NULL must empty the result, got $none rows")
  }
}
