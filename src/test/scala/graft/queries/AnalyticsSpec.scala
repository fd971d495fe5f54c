package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.{EtlFixtures, Warehouse}

class AnalyticsSpec extends SparkSpec {

  lazy val wh = new Warehouse(spark, EtlFixtures.sources(spark))
  lazy val an = new Analytics(wh)

  test("prescriptionsByMonth aggregates the explode-grain fact") {
    val rows = an.prescriptionsByMonth.collect()
    // 4 fact rows in Jan 2006: A,B,C (F1) + A (F2); A,C generic, B comercial
    assert(rows.map(_.getAs[Long]("n_prescripciones")).sum == 4L)
    val byTipo = rows.map(r => r.getAs[String]("tipo_medicamento") -> r.getAs[Long]("n_prescripciones")).toMap
    assert(byTipo == Map("Genérico" -> 3L, "Comercial" -> 1L))
  }

  test("billingByCenter shares sum to 1") {
    val rows = an.billingByCenter.collect()
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-6)
  }

  test("churnByRegion joins back through region and contributor dims") {
    val rows = an.churnByRegion.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("region") == "Andina")
    assert(rows.head.getAs[Boolean]("proviene_otra_eps"))
  }

  test("serviceMixByHour ranks busiest request hours per type") {
    val rows = an.serviceMixByHour.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Int]("rk") >= 1))
  }

  test("weekendShare splits service volume by the weekend flag") {
    val rows = an.weekendShare.collect()
    assert(rows.map(_.getAs[Long]("n_servicios")).sum == 3L) // 3 fact rows
    assert(rows.forall(r => r.schema.fieldNames.contains("es_fin_de_semana")))
  }

  test("SQL views answer star queries via spark.sql") {
    an.registerViews()
    val n = spark.sql(
      """SELECT d.anio, COUNT(*) AS n
        |FROM fact_medical_formula f JOIN dim_fecha d USING (fecha_id)
        |GROUP BY d.anio""".stripMargin).collect()
    assert(n.head.getAs[Long]("n") == 4L)
  }
}
