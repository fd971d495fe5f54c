package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Locks q129's scale contract: both sides written bucketed on the
  * join key means the join itself plans WITHOUT a shuffle exchange on
  * either side — the write-once/join-many amortization. Also pins the
  * row-level invariants of the q130 transition matrix and the q132
  * hopping windows.
  */
class BucketedJoinSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q129: bucketed join plans no exchange under the sort-merge join") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = FormatQueries.q129BucketedJoin(spark, dir)
        .queryExecution.executedPlan
      val smj = plan.collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      // no shuffle anywhere below the join: the bucketed layout IS the
      // exchange, paid once at write time
      val shufflesBelowJoin = smj.head.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join must not re-shuffle its inputs:\n$plan")
      // above the join only the groupBy hash exchange and the terminal
      // orderBy range exchange remain — both on group-sized data
      val all = plan.collect { case e: ShuffleExchangeExec => e }
      assert(all.size == 2,
        s"expected exactly the groupBy + orderBy exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q130: transition probabilities row-normalize to 1 per from_type") {
    val rows = graft.queries.EventsQueries.q130Transitions(spark, dir)
      .groupBy(col("from_type")).agg(sum(col("p")).as("total_p"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("total_p")
      // per-row round(6) bounds the drift at |to-vocabulary| * 5e-7
      assert(math.abs(p - 1.0) < 1e-5,
        s"${r.getAs[String]("from_type")} rows sum to $p")
    }
  }

  test("q132: each event lands in exactly two hopping windows") {
    val nEvents = Tables.events(spark, dir).count()
    val windowed = graft.queries.EventsQueries.q132HoppingWindows(spark, dir)
      .agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(windowed == 2 * nEvents,
      s"hopping coverage: $windowed != 2 * $nEvents")
  }
}
