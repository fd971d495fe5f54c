package graft.plans

import graft.SparkSpec

/** q251 — storage-partitioned join. The oracle proves the joined
  * counts; this spec locks the V2 mechanism: the join between two
  * KeyGroupedPartitioning-reporting scans plans with ZERO shuffle
  * exchanges (the V1 analogue is q129's bucketed-table pin), and the
  * partition-values contract holds under MISMATCHED key sets — at
  * sf0.001 only 10 of the customer side's 25 nations have suppliers,
  * so the planner must pad/align split-by-split instead of falling
  * back to a shuffle.
  */
class SpjSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def spjSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  test("the V2 key-grouped join plans with zero shuffle exchanges") {
    val s = spjSession()
    val root = graft.queries.PlannerMechanisms.spjStage(s, sf)
    val j = graft.queries.PlannerMechanisms.spjJoin(s, root)
    assert(j.collect().nonEmpty)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join riding the reported partitioning:\n$plan")
    assert(!plan.contains("Exchange"),
      s"the storage-partitioned join must not shuffle either side:\n$plan")
    assert(plan.contains("BatchScan spj("),
      s"join sides are not the V2 key-grouped scans:\n$plan")
  }

  test("mismatched key sets align on the common keys (pushed values)") {
    val s = spjSession()
    val root = graft.queries.PlannerMechanisms.spjStage(s, sf)
    import org.apache.spark.sql.functions.col
    val cust = graft.sources.SpjSource.load(s, s"$root/cust")
      .select(col("k")).collect().map(_.getLong(0)).toSet
    val supp = graft.sources.SpjSource.load(s, s"$root/supp")
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(cust != supp,
      "fixture no longer has mismatched key sets; the padding path is untested")
    val joined = graft.queries.PlannerMechanisms.spjJoin(s, root)
      .collect().map(_.getLong(0)).toSet
    assert(joined == cust.intersect(supp),
      s"joined keys $joined != common keys ${cust.intersect(supp)}")
  }

  test("exchange-free result equals the shuffled join on random key sets") {
    // fixed-seed randomized staging: overlapping-but-unequal key sets
    // with duplicate rows per key on one side; the SPJ plan must
    // produce bit-identical rows to the same join with the mechanism
    // OFF (plain shuffle path)
    val rnd = new scala.util.Random(254)
    val left = (0 until 40).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong))
    val right = (0 until 15).map(_ =>
      (rnd.nextInt(18).toLong, rnd.nextInt(1000).toLong))
    val base = java.nio.file.Files
      .createTempDirectory("graft_spj_prop").toString
    graft.sources.SpjSource.stage(left, s"$base/cust")
    graft.sources.SpjSource.stage(right, s"$base/supp")
    def rows(session: org.apache.spark.sql.SparkSession) =
      graft.queries.PlannerMechanisms.spjJoin(session, base)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val on = spjSession()
    val off = spark.newSession()
    off.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    off.conf.set("spark.sql.shuffle.partitions", "4")
    assert(rows(on).sameElements(rows(off)),
      "storage-partitioned join changed the join result")
  }
}
