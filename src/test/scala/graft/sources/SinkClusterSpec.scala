package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q269 — sink-demanded clustering/ordering. The oracle proves the
  * one-file-per-key bound and the round-tripped values; this spec
  * locks the MECHANISM: the engine (not the caller) inserts the
  * required exchange, so a key never spans tasks under
  * `clustered=true` even from scattered input; each committed file's
  * rows are (k, v)-sorted; and WITHOUT the option the same scattered
  * input produces multiple files for a key (proving the bound comes
  * from the declared distribution, not from luck).
  */
class SinkClusterSpec extends SparkSpec {

  // 4 keys x 64 rows, scattered round-robin across 8 partitions so
  // every key starts spread over many tasks
  private def scattered = {
    import spark.implicits._
    (0L until 256L).map(i => (i % 4, i)).toDF("k", "v").repartition(8)
  }

  private def fileBody(root: String, name: String): String = {
    val f = SinkSource.fs(root)
    val in = f.open(new Path(root, s"data/$name"))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("clustered=true: one file per key, (k,v)-sorted in-file") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_clust").toString
    SinkSource.write(scattered, root, overwrite = true, clustered = true)
    val m = SinkSource.manifest(root)
    val perKey = m.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(perKey.toMap.values.forall(_ == 1),
      s"a key spans tasks despite the required distribution: ${perKey.toMap}")
    assert(perKey.size == 4, s"expected 4 keys, got: ${perKey.toMap}")
    m.foreach { case (k, name, _) =>
      val vs = fileBody(root, name).linesIterator.filter(_.nonEmpty)
        .map(_.split('|')(1).toLong).toSeq
      assert(vs == vs.sorted,
        s"file $name for key $k is not v-ascending: ${vs.take(10)}...")
      assert(vs == (k until 256L by 4L),
        s"file $name for key $k lost rows: ${vs.size} of 64")
    }
  }

  test("without clustered, scattered input spans tasks (the contrast)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_unclust").toString
    SinkSource.write(scattered, root, overwrite = true)
    val perKey = SinkSource.manifest(root)
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(perKey.toMap.values.exists(_ > 1),
      s"scattered input should produce multi-file keys without the " +
        s"declared distribution: ${perKey.toMap}")
    // both layouts read back identically — layout is invisible to results
    val got = SinkSource.load(spark, root)
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.map(_._2).forall(_ == 64L), s"read-back lost rows: $got")
  }
}
