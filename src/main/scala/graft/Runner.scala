package graft

import org.apache.spark.sql.SparkSession

import graft.etl.{SyntheticSources, Warehouse}

/** End-to-end warehouse build main — the `process.py` equivalent
  * (`/root/reference/process.py:8-11`), one SparkSession, dims built
  * once, all four facts, distributed parquet sinks.
  *
  * Usage: tools/run.sh graft.Runner [scaleFactor] [outDir]
  * scaleFactor multiplies the base synthetic-source sizes (1.0 ≈ 2k
  * prescriptions); sources generate distributed, so large factors
  * exercise the same code path a cluster run would.
  */
object Runner {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toDouble).getOrElse(1.0)
    val outDir = args.lift(1).getOrElse("/tmp/graft_warehouse")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-runner")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
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

    val t0 = System.nanoTime()
    val sources = SyntheticSources.generate(
      spark, SyntheticSources.Sizes().scaled(factor))
    val wh = new Warehouse(spark, sources)
    wh.writeAll(outDir, stringifyDates = true)
    val elapsed = (System.nanoTime() - t0) / 1e9

    val counts = (wh.allDims ++ wh.allFacts).map { case (name, _) =>
      name -> spark.read.parquet(s"$outDir/$name").count()
    }
    val countsJson = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"warehouse_build","value":$elapsed,"unit":"sec","factor":$factor,"counts":$countsJson}""")
    spark.stop()
  }
}
