package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The aggregate form must select exactly the rank-window form's rows,
  * survive partial aggregation / serialization, and keep O(k) state.
  */
class TopKByLongSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("equals the rank-window top-k on real data") {
    val agg = graft.queries.OperatorQueries.q57TopkAgg(spark, dir)
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toList).toMap
    val win = graft.queries.StarSchema.q19TopPerGroup(spark, dir)
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toList).toMap
    assert(agg == win)
  }

  test("ties, nulls, and tiny groups") {
    import spark.implicits._
    val df = Seq(
      (1, 5.0, 10L), (1, 5.0, 2L), (1, 5.0, 7L), (1, 1.0, 1L), // ties on score
      (2, 3.0, 9L),                                            // group < k
      (3, 2.0, 4L), (3, java.lang.Double.NaN, 5L))
      .toDF("g", "s", "p")
      .union(Seq((4, null.asInstanceOf[java.lang.Double], 6L))
        .toDF("g", "s", "p"))                                  // null score dropped
    val got = df.repartition(5).groupBy(col("g"))
      .agg(TopKByLong.topk_by(col("s"), col("p"), 3).as("top"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    assert(got(1) == List(2L, 7L, 10L)) // score ties → payload asc
    assert(got(2) == List(9L))
    assert(got(4) == Nil)
    // NaN ranks greatest, matching Spark desc sort and DuckDB DESC
    assert(got(3) == List(5L, 4L))
  }
}
