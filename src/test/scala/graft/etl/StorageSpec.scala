package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout strategies for scale: date-partitioned fact layout,
  * bucketed co-located joins (no exchange), and the CSV sink the
  * reference's K3 used.
  */
class StorageSpec extends SparkSpec {

  lazy val wh = new Warehouse(spark, EtlFixtures.sources(spark))

  test("facts write date-partitioned for partition-pruned reads") {
    val out = Files.createTempDirectory("graft_part").toString
    wh.factMedicalFormula
      .join(broadcast(wh.dimFecha.select("fecha_id", "anio")), Seq("fecha_id"))
      .write.partitionBy("anio").mode("overwrite").parquet(s"$out/fact")
    val back = spark.read.parquet(s"$out/fact").filter(col("anio") === 2006)
    assert(back.count() == 4L)
    // the year filter must become partition pruning, not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("anio"))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    val dir = "/root/testdata/sf0.001"
    graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // force the non-broadcast path to show bucketing removes the shuffle
    val joined = spark.sql(
      """SELECT /*+ MERGE(li_b) */ l_orderkey, o_totalprice, l_quantity
        |FROM li_b JOIN o_b ON l_orderkey = o_orderkey""".stripMargin)
    val plan = joined.queryExecution.executedPlan.toString
    assert(joined.count() > 0)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
  }

  test("CSV sink round-trips the medical-formula fact") {
    val out = Files.createTempDirectory("graft_csv").toString
    Sinks.csv(wh.factMedicalFormula, s"$out/fact_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$out/fact_csv")
    assert(back.count() == 4L)
    assert(back.columns.toSeq ==
      Seq("fecha_id", "usuario_id", "medico_id", "medicamento_id", "Codigo_Formula"))
  }
}
