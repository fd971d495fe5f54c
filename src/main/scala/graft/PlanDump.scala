package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print `.explain("formatted")` for selected queries — the
  * evidence files under plans/<round>/ are generated with this.
  * Usage: tools/run.sh graft.PlanDump q274_rowlevel_update [more...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // quiet local FS: no chmod fork per create, no .crc twin
      // (see graft.sources.QuietLocalFs — local-scheme only)
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.QuietLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.sources.QuietLocalAbstractFs")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"===== $name")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(
        ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
