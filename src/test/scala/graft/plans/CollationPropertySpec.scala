package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck invariant for q246's adoption-safety property over
  * arbitrary ASCII corpora: grouping by a UTF8_LCASE-collated key must
  * produce EXACTLY the groups of lower()-normalized grouping — same
  * group count, same membership counts — for any mix of case
  * variants, repeated values, and empty strings. (Scoped to ASCII on
  * purpose: beyond ASCII, UTF8_LCASE's full case folding and lower()
  * legitimately diverge — e.g. dotted/dotless I — which is exactly
  * why the production query keeps its oracle to ASCII segments.)
  */
class CollationPropertySpec extends SparkSpec {

  private def check(prop: Prop, trials: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, res.status.toString)
  }

  private val token: Gen[String] = for {
    base <- Gen.oneOf("alpha", "beta", "gamma", "x", "", "mix3d")
    flips <- Gen.listOfN(base.length, Gen.oneOf(true, false))
  } yield base.zip(flips).map { case (c, up) =>
    if (up) c.toUpper else c.toLower }.mkString

  test("collated grouping == lower() grouping on arbitrary ASCII case mixes") {
    import spark.implicits._
    check(Prop.forAll(Gen.nonEmptyListOf(token)) { words =>
      val df = words.toDF("s")
      val collated = df
        .groupBy(collate(col("s"), "UTF8_LCASE").as("k"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0).toLowerCase, r.getLong(1)))
        .toMap
      val lowered = df
        .groupBy(lower(col("s")).as("k"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      collated == lowered
    })
  }
}
