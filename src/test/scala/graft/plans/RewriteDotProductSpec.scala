package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteDotProductSpec extends SparkSpec {

  import spark.implicits._

  lazy val df = Seq(
    (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
    (Array(10L, 0L, -2L), Array(1L, 1L, 1L)))
    .toDF("a", "b")

  lazy val hofExpr = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  test("rule rewrites the aggregate(zip_with) idiom to DotProductLong") {
    val analyzed = df.select(hofExpr.as("d")).queryExecution.analyzed
    val rewritten = RewriteDotProduct(analyzed)
    val found = rewritten.expressions.flatMap(_.collect {
      case d: graft.functions.DotProductLong => d
    })
    assert(found.nonEmpty, s"no DotProductLong in:\n$rewritten")
  }

  test("rewritten plan computes identical results") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val viaHof = df.select(hofExpr.as("d")).collect().map(_.getLong(0)).toSeq
    val viaNative = df.select(
      graft.functions.DotProductLong.dot_product_long(col("a"), col("b")).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaHof == Seq(32L, 8L) && viaNative == viaHof)
    // length mismatch → both forms null
    val mm = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    assert(mm.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)).collect().head.isNullAt(0))
    assert(mm.select(graft.functions.DotProductLong.dot_product_long(col("a"), col("b")))
      .collect().head.isNullAt(0))
  }

  test("rule does not fire on int arrays or non-identity finish") {
    val intDf = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val analyzed = intDf.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(0), (acc, v) => acc + v).as("d"))
      .queryExecution.analyzed
    val rewritten = RewriteDotProduct(analyzed)
    val found = rewritten.expressions.flatMap(_.collect {
      case d: graft.functions.DotProductLong => d
    })
    assert(found.isEmpty)
  }
}
