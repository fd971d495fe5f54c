package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q270 — top-N / limit pushdown into the connector. The oracle proves
  * the global top-10; this spec locks the MECHANISM: the pushed scan
  * carries the pushedTopN/pushedLimit markers, the partition reader
  * emits a bounded candidate set (never the file), a plain LIMIT stops
  * the drain mid-file, and an expression sort key refuses the push and
  * still answers correctly through the engine sort.
  */
class SinkTopNSpec extends SparkSpec {

  private def staged(tag: String): String = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_topn_$tag").toString
    import spark.implicits._
    // v deliberately NOT in file order: a take-first-n cheat would
    // return the wrong candidates
    val rows = (0L until 400L).map(i => (i % 4, (i * 37) % 400))
    SinkSource.write(rows.toDF("k", "v").repartition(2, col("k")),
      root, overwrite = true)
    root
  }

  test("ORDER BY + LIMIT pushes as topN; candidates are the true top") {
    val root = staged("push")
    val df = SinkSource.load(spark, root).orderBy(col("v").desc).limit(5)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN=[v DESC] LIMIT 5"),
      s"topN not pushed into the scan:\n$plan")
    // (i*37)%400 is a bijection on 0..399, so top-5 v are 399..395
    assert(got.map(_._2).sorted.reverse == Seq(399L, 398L, 397L, 396L, 395L),
      s"pushed topN returned the wrong global top: $got")
  }

  test("the partition reader emits a bounded candidate set") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_topn_rdr").toString
    val f = SinkSource.fs(root)
    val body = (0 until 100).map(i => s"1|${(i * 7) % 100}").mkString("\n")
    val out = f.create(new Path(root, "one.psv"), true)
    out.write(body.getBytes("UTF-8")); out.close()
    def drain(r: org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow]) = {
      val b = Seq.newBuilder[Long]
      while (r.next()) b += r.get().getLong(1)
      b.result()
    }
    // v DESC, n=5 over a 100-row file: exactly 5 rows out, the true top
    val desc5 = drain(new SinkTopNReader(
      new Path(root, "one.psv").toString, Seq((1, false)), 5))
    assert(desc5.sorted.reverse == Seq(99L, 98L, 97L, 96L, 95L),
      s"heap kept the wrong candidates: $desc5")
    // v ASC, n=3: the smallest three
    val asc3 = drain(new SinkTopNReader(
      new Path(root, "one.psv").toString, Seq((1, true)), 3))
    assert(asc3.sorted == Seq(0L, 1L, 2L),
      s"ascending heap kept the wrong candidates: $asc3")
    // plain limit stops the drain mid-file: first 3 staged lines
    val lim3 = drain(new SinkReader(
      new Path(root, "one.psv").toString, Some(3)))
    assert(lim3 == Seq(0L, 7L, 14L),
      s"pushed limit should stop after 3 staged rows: $lim3")
  }

  test("plain LIMIT pushes and the global cut stays exact") {
    val root = staged("limit")
    val df = SinkSource.load(spark, root).limit(7)
    assert(df.collect().length == 7, "global LIMIT must still be exact")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLimit=7 (partial)"),
      s"limit not pushed into the scan:\n$plan")
  }

  test("an expression sort key refuses the push and stays correct") {
    val root = staged("fallback")
    val df = SinkSource.load(spark, root)
      .orderBy((col("v") * -1).desc).limit(5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("pushedTopN"),
      s"an expression sort must not push into the scan:\n$plan")
    // v*-1 DESC == v ASC; bijection, so the smallest five are 0..4
    val got = df.collect().map(_.getLong(1)).toSeq
    assert(got.sorted == Seq(0L, 1L, 2L, 3L, 4L),
      s"fallback sort answered wrong: $got")
  }
}
