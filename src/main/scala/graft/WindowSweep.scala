package graft

import org.apache.spark.sql.SparkSession

/** Dev audit: sweep every registered (non-streaming) query's executed
  * plan for WindowExec nodes with an EMPTY partition spec — the
  * single-task bottleneck ("WindowExec: No Partition Defined"). Prints
  * one line per offender with the window's expressions so bounded-input
  * cases (1-row aggregates, k-row codebooks) can be told apart from
  * data-sized ones. Usage: tools/run.sh graft.WindowSweep [queryName ...]
  */
object WindowSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      // quiet local FS: no chmod fork per create, no .crc twin
      // (see graft.sources.QuietLocalFs — local-scheme only)
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.QuietLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.sources.QuietLocalAbstractFs")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val streaming = SparkEntry.queries.keys.filter(_.contains("stream")).toSet
    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted.filterNot(streaming)
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan
        val globals = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty =>
            w.windowExpression.map(_.sql).mkString("; ").take(160)
        }
        globals.foreach(g => println(s"GLOBAL-WINDOW $name :: $g"))
        spark.catalog.clearCache()
      } catch { case e: Throwable =>
        println(s"ERR $name ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
