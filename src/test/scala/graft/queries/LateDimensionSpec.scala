package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q150-q152: inferred members must conserve every fact, the streaming
  * hopping windows must equal their batch dual, and the array-HOF
  * surface must match a brute-force per-row recomputation.
  */
class LateDimensionSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q150 conserves all facts; placeholders only for hidden keys") {
    val rows = StarSchema.q150LateDimension(spark, dir).collect()
    val totalOrders = graft.sources.Tables.orders(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totalOrders,
      "the inferred-member load must not drop or duplicate facts")
    val inferred = rows.filter(_.getString(0) == "_INFERRED_")
    assert(inferred.length == 1, "hidden customers must surface as placeholders")
    // every placeholder customer is one of the hidden (key % 10 == 0) ones
    val hiddenWithOrders = graft.sources.Tables.orders(spark, dir)
      .filter(col("o_custkey") % 10 === 0)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(inferred.head.getAs[Long]("n_customers") == hiddenWithOrders)
  }

  test("q151 streaming hopping windows equal the batch q132 result") {
    val stream = graft.streaming.StreamingQueries
      .q151StreamHopping(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = EventsQueries.q132HoppingWindows(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(stream.toSeq == batch.toSeq)
  }

  test("q152 HOF pipeline matches a brute-force recomputation") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val expected = docs.map { case (id, t) =>
      (id, t.count(_.length > 4).toLong, t.exists(_.length >= 8),
        t.forall(_.nonEmpty),
        t.distinct.sorted.take(3).mkString(","),
        t.map(_.length.toLong).sum)
    }.sortBy(_._1)
    val rows = graft.operators.TextAnalysis.q152ArraySurface(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getString(4), r.getLong(5)))
    assert(rows.toSeq == expected.toSeq)
  }
}
