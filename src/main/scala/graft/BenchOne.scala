package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: reproduce the driver Bench's exact per-query pattern for
  * selected queries — warm at sf0.001, clearCache+gc, timed run at the
  * target SF — to separate warm-up-transferable overhead from the cost
  * the driver actually measures.
  * Usage: tools/run.sh graft.BenchOne q32_minhash_neardup [more...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      val w0 = System.nanoTime()
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[warm] $name failed: $e") }
      val warmSec = (System.nanoTime() - w0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s warm=$warmSec%.2f timed=$sec%.2f")
    }
    spark.stop()
  }
}
