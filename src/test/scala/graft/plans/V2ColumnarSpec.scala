package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SpjSource

/** q268 — V2 columnar reads. The oracle proves the aggregate; this
  * spec locks the MECHANISM: the columnar factory puts a
  * ColumnarToRow boundary above the scan (the row path has none), a
  * partition larger than one batch spans multiple batches without
  * loss, and columnar ≡ row results bit-for-bit.
  */
class V2ColumnarSpec extends SparkSpec {

  test("columnar scans cross a ColumnarToRow boundary; row scans do not") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_colr").toString
    SpjSource.stage((0L until 40L).map(i => (i % 4, i)), root)
    val columnar = SpjSource.load(spark, root, columnar = true)
    columnar.collect()
    val cPlan = columnar.queryExecution.executedPlan.toString
    assert(cPlan.contains("ColumnarToRow"),
      s"columnar factory did not produce a columnar boundary:\n$cPlan")
    val row = SpjSource.load(spark, root)
    row.collect()
    val rPlan = row.queryExecution.executedPlan.toString
    assert(!rPlan.contains("ColumnarToRow"),
      s"the default row path must stay row-based:\n$rPlan")
  }

  test("a partition larger than one batch spans batches losslessly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_colr2").toString
    // one key -> one partition -> 10000 rows -> 3 batches of <=4096
    SpjSource.stage((0L until 10000L).map(i => (7L, i)), root)
    val got = SpjSource.load(spark, root, columnar = true)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect()(0)
    assert(got.getLong(0) == 10000L, s"row count across batches: $got")
    assert(got.getLong(1) == (0L until 10000L).sum, s"sum across batches: $got")
  }

  test("columnar equals row on random key sets") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_colr3").toString
    val rnd = new scala.util.Random(42)
    SpjSource.stage((0 until 5000).map(_ =>
      (rnd.nextInt(50).toLong, rnd.nextLong() % 1000000)), root)
    def canon(columnar: Boolean) =
      SpjSource.load(spark, root, columnar)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(canon(columnar = true) == canon(columnar = false),
      "columnar and row reads disagree")
  }
}
