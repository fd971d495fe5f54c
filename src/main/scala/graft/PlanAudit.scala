package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of selected queries
  * and greps it for scale red flags — missing filter pushdown, missing
  * broadcast on dim joins, cartesian products, absent whole-stage
  * codegen. Usage: tools/run.sh graft.PlanAudit [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE stays ON in Verify/Bench; here it would wrap the plan in
      // AdaptiveSparkPlan(isFinalPlan=false) and hide codegen spans
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
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===== $name =====")
      println(plan)
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "no-WholeStageCodegen" -> !plan.contains("codegen id"),
        "SortMergeJoin" -> plan.contains("SortMergeJoin"))
        .collect { case (f, true) => f }
      if (flags.nonEmpty) println(s"[audit] $name flags: ${flags.mkString(", ")}")
      // queries may mark caches at build time; a prior query's cache
      // substitutes InMemoryRelation into later plans and hides the
      // subtree this audit exists to inspect (q207's cached cells were
      // masking q49's pivot-distance condition) — audit each query's
      // standalone plan, as Verify does
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
