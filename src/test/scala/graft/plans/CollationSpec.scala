package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q246 — collation-aware grouping/join. The oracle proves the merged
  * groups equal the lower()-normalized ones; this spec locks the
  * engine-level pieces: the grouping key TYPE is a collated string
  * (so the hash/compare path, not a projection, does the merging), a
  * collated join matches across case, and the collated group count
  * equals the lower()-normalized count on the real table.
  */
class CollationSpec extends SparkSpec {

  test("grouping by a collated key merges case variants in the engine") {
    import spark.implicits._
    val df = Seq("Foo", "foo", "FOO", "bar", "BAR", "baz").toDF("s")
      .groupBy(collate(col("s"), "UTF8_LCASE").as("k"))
      .agg(count(lit(1)).as("n"))
    assert(df.schema("k").dataType.toString.contains("UTF8_LCASE"),
      s"grouping key is not collated: ${df.schema.treeString}")
    val byN = df.collect().map(r => (r.getString(0).toLowerCase, r.getLong(1))).toMap
    assert(byN == Map("foo" -> 3L, "bar" -> 2L, "baz" -> 1L), byN.toString)
  }

  test("a collated join matches across case on both sides") {
    import spark.implicits._
    val l = Seq("FOO", "foo", "bar").toDF("s")
    val r = Seq("Foo", "BAZ").toDF("t")
    val j = l.join(r,
      collate(col("s"), "UTF8_LCASE") === collate(col("t"), "UTF8_LCASE"))
    assert(j.count() == 2, "both case variants of foo must match Foo")
  }

  test("collated grouping equals lower()-normalized grouping on customer") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.PlannerMechanisms.q246CollationGroup(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    val want = graft.sources.Tables.customer(spark, sf)
      .groupBy(lower(col("c_mktsegment")).as("seg"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want, s"collated groups $got != lower() groups $want")
  }
}
