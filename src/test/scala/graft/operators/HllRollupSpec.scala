package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q238 — HLL sketch rollup. Pins what the band-flag oracle can't:
  * (1) the per-group state really is bounded binary sketch state
  *     (BinaryType), not a value list;
  * (2) in sparse mode (small distincts) the estimate is EXACT, so the
  *     fixture-scale flags are not vacuously wide;
  * (3) at a domain far beyond sparse mode (100k distincts) both the
  *     direct sketch and a 10-way union of partial sketches stay
  *     inside the 3-sigma envelope the query flags against.
  */
class HllRollupSpec extends SparkSpec {

  test("sketch state is binary and sparse-mode estimates are exact") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (s"g${i % 3}", i)).toDF("g", "h")
    val sk = df.groupBy(col("g"))
      .agg(expr(s"hll_sketch_agg(h, ${TextAnalysis.HllLgK})").as("sk"))
    assert(sk.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val est = sk.select(col("g"),
        expr("hll_sketch_estimate(sk)").as("est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L),
      s"sparse-mode estimates must be exact: $est")
  }

  test("direct and 10-way-unioned estimates stay inside the 3-sigma band") {
    import spark.implicits._
    val n = 100000L
    val df = (1L to n).map(i => (i % 10, i * 2654435761L)).toDF("part", "h")
    val direct = df
      .agg(expr(s"hll_sketch_estimate(hll_sketch_agg(h, ${TextAnalysis.HllLgK}))"))
      .collect()(0).getLong(0)
    val unioned = df.groupBy(col("part"))
      .agg(expr(s"hll_sketch_agg(h, ${TextAnalysis.HllLgK})").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
      .collect()(0).getLong(0)
    def inBand(est: Long) =
      math.abs(est - n).toDouble / n <= TextAnalysis.HllBand
    assert(inBand(direct), s"direct estimate $direct outside band for $n")
    assert(inBand(unioned), s"unioned estimate $unioned outside band for $n")
    assert(unioned == direct,
      "same-lgK union drifted from the direct sketch on identical input")
  }
}
