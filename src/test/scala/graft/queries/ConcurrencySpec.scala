package graft.queries

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.SparkSpec

/** A serving layer runs many queries on one session concurrently; the
  * engine surface (including the Tables schema cache) must be
  * thread-safe and produce the same results as sequential runs.
  */
class ConcurrencySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("concurrent queries on one session match sequential results") {
    val names = Seq("q01_pricing_summary", "q04_star_join",
      "q19_top_per_group", "q31_exact_dedup", "q61_histogram")
    val sequential = names.map(n =>
      n -> graft.SparkEntry.queries(n)(spark, dir).collect().toSeq).toMap
    val concurrent = Await.result(
      Future.sequence(names.map(n => Future(
        n -> graft.SparkEntry.queries(n)(spark, dir).collect().toSeq))),
      5.minutes).toMap
    names.foreach { n => assert(concurrent(n) == sequential(n), s"query $n diverged") }
  }
}
