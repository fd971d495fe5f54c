package graft.plans

import graft.SparkSpec

/** q254 — SQL-language functions. The oracle proves the profile
  * values; this spec locks the INLINING contract that makes SQL
  * macros safe at scale: the optimized plan contains no opaque
  * evaluation node (no UDF/Invoke), the table function's literal
  * argument is pushed down to the parquet scan as a data filter, and
  * the macro result equals the hand-inlined query.
  */
class SqlFunctionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("scalar and table functions inline; the TVF literal pushes to the scan") {
    val df = graft.queries.PlannerMechanisms.q254SqlFunctions(spark, sf)
    assert(df.collect().nonEmpty)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("UDF") && !opt.contains("Invoke"),
      s"SQL function left an opaque evaluation node:\n$opt")
    assert(opt.contains("length(replace("),
      s"scalar function body not inlined into the aggregate:\n$opt")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("EqualTo(source,src0)"),
      s"TVF literal argument not pushed to the scan:\n$phys")
  }

  test("the macro equals the hand-inlined query") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.PlannerMechanisms.q254SqlFunctions(spark, sf)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1"))
    val want = docs
      .withColumn("wlen", (col("n_chars").cast("double") /
        (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1))
        .cast("decimal(24,6)"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("wlen")).cast("double") / count(lit(1))).as("avg_wlen"))
      .select(col("source"), col("lang"), col("n_docs"), col("avg_wlen"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(got.sameElements(want), "macro and hand-inlined results differ")
  }
}
