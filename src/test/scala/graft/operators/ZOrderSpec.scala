package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q102's z-ordering: correctness of the Morton code and the layout
  * payoff — a 2-D range predicate over the z-clustered layout lets
  * parquet row-group/page statistics prune far more rows at the scan
  * than a single-column sort order does.
  */
class ZOrderSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.01"

  test("zValue interleaves bits exactly") {
    import spark.implicits._
    def ref(x: Long, y: Long): Long =
      (0 until ZOrder.ZBits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L))
    val got = cases.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    cases.map((ref _).tupled).zip(got).foreach { case (e, g) =>
      assert(e == g, s"expected $e got $g")
    }
  }

  test("2-D range scans prune more under the z-order layout") {
    val df = ZOrder.ordersWithZ(spark, dir)
    val base = s"${sys.props("java.io.tmpdir")}/graft_zorder_${spark.sparkContext.applicationId}"
    val linDir = s"$base/linear"
    val zDir = s"$base/zorder"
    // small row groups so statistics have granularity at fixture scale
    val opts = Map("parquet.block.size" -> (16 * 1024).toString)
    df.repartitionByRange(4, col("o_orderkey")).sortWithinPartitions("o_orderkey")
      .write.options(opts).mode("overwrite").parquet(linDir)
    df.repartitionByRange(4, col("z")).sortWithinPartitions("z")
      .write.options(opts).mode("overwrite").parquet(zDir)

    val (cLo, cHi) = (100L, 200L)
    val Array(dLo, dHi) = df.agg(min("order_day"), max("order_day"))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val dMid = (dLo + dHi) / 2
    def scanned(path: String): (Long, Set[Long]) = {
      val q = spark.read.parquet(path)
        .filter(col("o_custkey").between(cLo, cHi) &&
          col("order_day").between(dMid, dMid + (dHi - dLo) / 10))
      // execute THIS dataset (a derived one would leave q's metrics
      // empty), then unwrap AQE to reach the scan that actually ran
      val keys = q.collect()
        .map(_.getLong(q.schema.fieldIndex("o_orderkey"))).toSet
      val finalPlan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scan = finalPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      (scan.metrics("numOutputRows").value, keys)
    }
    val (linRows, linKeys) = scanned(linDir)
    val (zRows, zKeys) = scanned(zDir)
    assert(linKeys == zKeys, "layouts returned different result rows")
    assert(zKeys.nonEmpty, "predicate selected nothing — pruning untested")
    info(s"scan output rows: linear=$linRows zorder=$zRows (result=${zKeys.size})")
    assert(zRows < linRows,
      s"z-order layout did not prune better: z=$zRows vs linear=$linRows")
  }
}
