package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q287 — write-side partition transform (`bucket(8, k)` demanded by
  * the sink via RequiresDistributionAndOrdering over a catalog-served
  * V2 function). The oracle proves the read-back; this spec locks the
  * MECHANISM: the table reports its transform partitioning, the plan
  * contains the transform-keyed exchange (resolved through the
  * table's own FunctionCatalog), a bucket never spans writer tasks
  * (vs per-key clustering where co-bucketed keys scatter), and the
  * CREATE surface rejects foreign schemas.
  */
class SinkBucketWriteSpec extends SparkSpec {

  private def pidOf(file: String): Int =
    "p(\\d+)_".r.findFirstMatchIn(file).get.group(1).toInt

  test("bucket(8,k) write clusters whole buckets into single tasks") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bucketw").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.shuffle.partitions", "16")
    // at fixture size AQE would coalesce the whole exchange into one
    // partition — legal under the contract (buckets still whole) but
    // it would mask the bucket-vs-constant differentiation below
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.catalog.graft_bt", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_bt.root", root)
    s.conf.set("spark.sql.catalog.graft_bt.bucketWrite", "true")
    import s.implicits._
    // 40 keys over 8 buckets, scattered over many input partitions
    val df = (0L until 400L).map(i => (i % 40, i)).toDF("k", "v")
      .repartition(16)
    df.writeTo("graft_bt.t").create()

    // the table reports its transform layout
    val table = new SinkCatalog {
      initialize("graft_bt", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("root", root, "bucketWrite", "true")))
    }.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array.empty, "t"))
    assert(table.partitioning().map(_.describe()).toSeq == Seq("bucket(8, k)"),
      table.partitioning().toSeq.toString)

    // read-back is intact
    val got = s.sql("SELECT CAST(SUM(v) AS BIGINT) FROM graft_bt.t")
      .collect()(0).getLong(0)
    assert(got == (0L until 400L).sum)

    // a bucket never spans writer tasks: all files of bucket b carry
    // ONE partition id; and at most 8 distinct pids wrote
    val byBucket = SinkSource.manifest(s"$root/t")
      .groupBy { case (k, _, _) => ((k % 8) + 8) % 8 }
      .view.mapValues(_.map(e => pidOf(e._2)).distinct).toMap
    assert(byBucket.nonEmpty && byBucket.forall(_._2.size == 1),
      s"a bucket spanned writer tasks: $byBucket")
    val pids = byBucket.values.flatten.toSet
    assert(pids.size <= 8, s"more writer tasks than buckets: $pids")
    // and the transform actually separates: with 40 keys, per-KEY
    // clustering over 16 partitions would scatter co-bucketed keys —
    // prove at least two buckets landed on different pids (i.e. the
    // exchange keyed on bucket, not on a constant)
    assert(pids.size > 1, s"all buckets in one task: $pids")

    // the CREATE surface rejects foreign schemas
    val ex = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").writeTo("graft_bt.t2").create()
    }
    assert(ex.getMessage.contains("fixed schema"), ex.getMessage)
  }
}
