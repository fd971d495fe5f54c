package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q164's dynamic partition overwrite: the read-back aggregate (oracle)
  * cannot distinguish "untouched" from "rewritten with the same bytes",
  * so this spec pins the FILES — re-running the one-day recompute must
  * leave every other partition's files byte-identical (name, length,
  * mtime) while replacing the recomputed day's files.
  */
class DynOverSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("dynamic overwrite replaces only the recomputed day's files") {
    FormatQueries.q164DynamicOverwrite(spark, dir) // builds table + rewrite
    val root = new org.apache.hadoop.fs.Path(
      FormatQueries.tmp(spark, "dynover", dir))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())

    def filesOf(day: Long) =
      fs.listStatus(new org.apache.hadoop.fs.Path(root, s"day=$day"))
        .filter(_.getPath.getName.startsWith("part-"))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
        .sortBy(_._1).toSeq

    val days = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("day=")).map(_.stripPrefix("day=").toLong).sorted
    assert(days.contains(FormatQueries.OverwriteDay))
    val untouched = days.filter(_ != FormatQueries.OverwriteDay)
    assert(untouched.nonEmpty)

    val before = untouched.map(d => d -> filesOf(d)).toMap
    val targetBefore = filesOf(FormatQueries.OverwriteDay)

    // re-run ONLY the one-day recompute with dynamic overwrite
    Tables.events(spark, dir)
      .select(col("event_id"),
        expr("CAST(ts AS LONG) DIV 86400").as("day"), col("value"))
      .filter(col("day") === FormatQueries.OverwriteDay)
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(root.toString)

    untouched.foreach { d =>
      assert(filesOf(d) == before(d),
        s"day=$d was touched by a one-day dynamic overwrite")
    }
    assert(filesOf(FormatQueries.OverwriteDay) != targetBefore,
      "the recomputed day's files were not replaced")
  }

  test("the dynamic option is load-bearing: static overwrite drops the rest") {
    // same two writes WITHOUT the dynamic option: mode(overwrite) under
    // the default STATIC semantics wipes the whole table, so the
    // one-day recompute leaves only its own partition — the failure
    // mode q164's option exists to prevent
    val out = java.nio.file.Files
      .createTempDirectory("graft_q164_static").toString
    val ev = Tables.events(spark, dir)
      .select(col("event_id"),
        expr("CAST(ts AS LONG) DIV 86400").as("day"), col("value"))
    ev.write.mode("overwrite").partitionBy("day").parquet(out)
    ev.filter(col("day") === FormatQueries.OverwriteDay)
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite").partitionBy("day").parquet(out)
    val days = spark.read.parquet(out).select(col("day"))
      .distinct().collect().map(_.get(0).toString.toLong).toSeq
    assert(days == Seq(FormatQueries.OverwriteDay),
      s"static overwrite should keep only the written day, got $days")
  }
}
