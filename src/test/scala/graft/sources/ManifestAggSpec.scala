package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q265 — manifest-stats aggregate pushdown. The oracle proves the
  * counts; this spec locks the MECHANISM with a kill-shot: the
  * grouped COUNT(*) answers correctly with the data directory
  * PHYSICALLY REMOVED (so no row scan can have run), the pushed scan
  * is visible in the plan with no aggregate node above it, and any
  * aggregate the manifest cannot answer exactly refuses the push and
  * row-scans.
  */
class ManifestAggSpec extends SparkSpec {

  private def staged(): (String, Map[Long, Long]) = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_magg").toString
    import spark.implicits._
    val rows = (0L until 50L).map(i => (i % 5, i * 10))
    SinkSource.write(rows.toDF("k", "v").repartition(3, col("k")),
      s"$root/t", overwrite = true)
    (root, rows.groupBy(_._1).map { case (k, r) => k -> r.size.toLong })
  }

  test("COUNT(*) GROUP BY k answers from the manifest with no data files") {
    val (root, expected) = staged()
    SinkSource.load(spark, s"$root/t").createOrReplaceTempView("magg_t")
    val df = spark.sql("SELECT k, COUNT(*) AS n FROM magg_t GROUP BY k")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SinkManifestAggScan"),
      s"aggregate not pushed into the connector:\n$plan")
    assert(!plan.contains("HashAggregate"),
      s"complete pushdown should plan no aggregate node:\n$plan")
    // the kill-shot: remove every data file; a metadata answer is
    // unaffected, a row scan would throw
    val f = SinkSource.fs(root)
    assert(f.delete(new Path(s"$root/t/data"), true))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected, s"manifest counts wrong: $got vs $expected")
    val total = spark.sql("SELECT COUNT(*) AS n FROM magg_t")
      .collect()(0).getLong(0)
    assert(total == 50L, s"global count wrong: $total")
  }

  test("anything beyond COUNT(*) on the key grain refuses the push") {
    val (root, _) = staged()
    SinkSource.load(spark, s"$root/t").createOrReplaceTempView("magg_t2")
    val sumPlan = spark.sql("SELECT k, SUM(v) FROM magg_t2 GROUP BY k")
      .queryExecution.executedPlan.toString
    assert(!sumPlan.contains("SinkManifestAggScan"),
      s"SUM must not be answered from count-only manifest stats:\n$sumPlan")
    val vGroupPlan = spark.sql("SELECT v, COUNT(*) FROM magg_t2 GROUP BY v")
      .queryExecution.executedPlan.toString
    assert(!vGroupPlan.contains("SinkManifestAggScan"),
      s"a non-key grouping cannot be answered at manifest grain:\n$vGroupPlan")
    // and the fallback row scan still answers
    val s = spark.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM magg_t2")
      .collect()(0).getLong(0)
    assert(s == (0L until 50L).map(_ * 10).sum, s"fallback sum wrong: $s")
  }
}
