package graft.plans

import graft.SparkSpec

/** q273 — connector-reported ordering. The oracle proves the joined
  * values; this spec locks the PLAN shape: with `ordered=true` on both
  * key-grouped scans, the sort-merge join plans with zero exchanges
  * AND zero Sort nodes (a pure streaming merge); without it the same
  * join keeps its Sorts. Results are identical either way.
  */
class SpjOrderedSpec extends SparkSpec {

  private def spjSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  private def staged(): String = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_spj_ord").toString
    val rnd = new scala.util.Random(273)
    graft.sources.SpjSource.stage(
      (0 until 40).map(_ => (rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong)),
      s"$base/cust")
    graft.sources.SpjSource.stage(
      (0 until 25).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong)),
      s"$base/supp")
    base
  }

  private def join(s: org.apache.spark.sql.SparkSession, base: String,
      ordered: Boolean) = {
    import org.apache.spark.sql.functions.col
    graft.sources.SpjSource.load(s, s"$base/cust", ordered = ordered)
      .withColumnRenamed("v", "cv")
      .join(graft.sources.SpjSource.load(s, s"$base/supp", ordered = ordered)
        .withColumnRenamed("v", "sv"), Seq("k"))
  }

  test("reported ordering drops the Sorts under the exchange-free SMJ") {
    val s = spjSession()
    val base = staged()
    val ord = join(s, base, ordered = true)
    ord.collect()
    val plan = ord.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected a sort-merge join over the key-grouped scans:\n$plan")
    assert(!plan.contains("Exchange"),
      s"the storage-partitioned join must not shuffle:\n$plan")
    assert(!plan.contains("Sort ["),
      s"reported ordering should eliminate both Sort nodes:\n$plan")
    assert(plan.contains("reportedOrdering=[k ASC]"),
      s"scan should carry the ordering marker:\n$plan")

    val plain = join(s, base, ordered = false)
    plain.collect()
    val plainPlan = plain.queryExecution.executedPlan.toString
    assert(plainPlan.contains("Sort ["),
      s"without reported ordering the SMJ needs its Sorts:\n$plainPlan")

    // the sort-free merge returns exactly the sorted join's rows
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(canon(ord) == canon(plain),
      "reported ordering changed the join result")
  }
}
