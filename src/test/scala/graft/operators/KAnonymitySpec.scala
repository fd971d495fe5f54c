package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q168's suppression boundary: cohorts of exactly K survive, K−1 are
  * suppressed, and the released set never contains a quasi-identifier
  * tuple with fewer than K released rows (the k-anonymity invariant
  * itself, checked on the query's own output).
  */
class KAnonymitySpec extends SparkSpec {

  test("released rows always form cohorts of at least K") {
    val out = Curation.q168KAnonymity(spark, "/root/testdata/sf0.01")
    val below = out.groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n"), min(col("cohort_n")).as("claimed"))
      .filter(col("n") < Curation.AnonK || col("n") =!= col("claimed"))
      .count()
    assert(below == 0L, s"$below released cohorts violate k-anonymity")
    assert(out.count() > 0L, "gate suppressed everything at sf0.01")
  }

  test("the K boundary is exact: K survives, K-1 is suppressed") {
    import spark.implicits._
    val k = Curation.AnonK
    // two cohorts sharing nothing: one of size K, one of size K-1
    val rows =
      (1 to k).map(i => (i.toLong, "en", "web", 150L)) ++
        (1 to k - 1).map(i => (100L + i, "fr", "web", 950L))
    val df = rows.toDF("doc_id", "lang", "source", "n_chars")
    val keyed = df.select(col("doc_id"), col("lang"), col("source"),
      expr("n_chars div 100").as("len_bucket"))
    val kept = Curation.kAnonymityGate(keyed, k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (1 to k).map(_.toLong).toSet,
      s"boundary wrong: kept $kept")
  }
}
