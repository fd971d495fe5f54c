package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native expression must be bit-identical to the HOF formulation
  * it replaced (array_min over md5 of shingles, with the short-input
  * fallback), in both interpreted and codegen paths.
  */
class MinShingleMd5Spec extends SparkSpec {

  private def hofForm = {
    val toks = col("toks")
    val shingles = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))
    array_min(transform(shingles, s => md5(s)))
  }

  test("equals the HOF formulation on real documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), split(lower(trim(col("text"))), " ").as("toks"))
    val both = docs.select(
      MinShingleMd5.min_shingle_md5(col("toks"), 3).as("native"),
      hofForm.as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() === 0)
  }

  test("edge cases: short, single, empty, null element") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b"),          // < n → md5 of joined
      Seq("solo"),            // single token
      Seq("a", "b", "c"),     // exactly one shingle
      Seq("a", "b", "c", "d") // two shingles
    ).toDF("toks")
    val got = df.select(
      MinShingleMd5.min_shingle_md5(col("toks"), 3).as("native"),
      hofForm.as("hof"))
    assert(got.filter(!(col("native") <=> col("hof"))).count() === 0)
    // empty array → null
    val empty = Seq(Seq.empty[String]).toDF("toks")
      .select(MinShingleMd5.min_shingle_md5(col("toks"), 3).as("m"))
    assert(empty.first().isNullAt(0))
  }
}
