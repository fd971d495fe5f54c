package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.Warehouse

/** The analytics layer the warehouse exists for (SURVEY §7.1 step 6):
  * star-join aggregations over the four facts, exposed both as a typed
  * Scala API and as SQL temp views (`registerViews` +
  * `spark.sql(...)`). The reference has no query layer at all — its
  * consumers were external BI — so this is the engine-level "query
  * capability" surface over the conformed schema.
  *
  * All aggregations run dim-broadcast star joins: the fact side streams,
  * the only shuffle is the terminal groupBy. Window ranking partitions
  * by the group key, never globally.
  */
class Analytics(wh: Warehouse) {

  /** Register every dim/fact as a SQL temp view so `spark.sql` works
    * over the warehouse (`dim_fecha`, `fact_facturacion`, ...). */
  def registerViews(): Unit =
    (wh.allDims ++ wh.allFacts).foreach { case (n, df) => df.createOrReplaceTempView(n) }

  /** Prescriptions per month × medicine type (fact_medical_formula ⋈
    * dim_fecha ⋈ dim_medicamento). */
  def prescriptionsByMonth: DataFrame =
    wh.factMedicalFormula
      .join(broadcast(wh.dimFecha), Seq("fecha_id"))
      .join(broadcast(wh.dimMedicamento), Seq("medicamento_id"))
      .groupBy(col("anio"), col("mes_numero"), col("tipo_medicamento"))
      .agg(count(lit(1)).as("n_prescripciones"),
        countDistinct(col("usuario_id")).as("n_usuarios"))
      .orderBy(col("anio"), col("mes_numero"), col("tipo_medicamento"))

  /** Billing by medical-center municipality with share-of-total. */
  def billingByCenter: DataFrame = {
    val agg = wh.factFacturacion
      .join(broadcast(wh.dimCentroMedico), Seq("centro_medico_id"))
      .groupBy(col("municipio"))
      .agg(sum(col("valor_pagado")).as("total_facturado"),
        count(lit(1)).as("n_pagos"))
    // Share-of-total via a broadcast scalar join, not a global window:
    // an empty-partition window would funnel every group row through one
    // task; the one-row aggregate broadcast keeps the plan distributed.
    val total = agg.agg(sum(col("total_facturado")).as("_grand_total"))
    agg.crossJoin(broadcast(total))
      .withColumn("share", round(col("total_facturado") / col("_grand_total"), 4))
      .drop("_grand_total")
      .orderBy(col("total_facturado").desc, col("municipio"))
  }

  /** Churn by region and whether the member came from another EPS. */
  def churnByRegion: DataFrame =
    wh.factRetiro
      .join(broadcast(wh.dimRegion), Seq("region_id"))
      .join(broadcast(wh.dimCotizante(keepProvieneOtraEps = true)
        .select(col("cotizante_id"), col("proviene_otra_eps"))), Seq("cotizante_id"))
      .groupBy(col("region"), col("proviene_otra_eps"))
      .agg(count(lit(1)).as("n_retiros"))
      .orderBy(col("region"), col("proviene_otra_eps"))

  /** Service mix by hour-of-day band and type, with per-type rank of
    * the busiest hours. */
  def serviceMixByHour: DataFrame = {
    val agg = wh.factServicio
      .join(broadcast(wh.dimHora.select(col("hora_id").as("hora_solicitud_id"), col("hora"))),
        Seq("hora_solicitud_id"))
      .groupBy(col("tipo_servicio"), col("hora"))
      .agg(count(lit(1)).as("n_servicios"))
    agg.withColumn("rk", row_number().over(
      Window.partitionBy(col("tipo_servicio"))
        .orderBy(col("n_servicios").desc, col("hora"))))
      .orderBy(col("tipo_servicio"), col("rk"))
  }

  /** Weekend vs weekday service volume (dim_fecha role: request date). */
  def weekendShare: DataFrame =
    wh.factServicio
      .join(broadcast(wh.dimFecha.select(col("fecha_id").as("fecha_solicitud_id"),
        col("es_fin_de_semana"))), Seq("fecha_solicitud_id"))
      .groupBy(col("es_fin_de_semana"))
      .agg(count(lit(1)).as("n_servicios"))
      .orderBy(col("es_fin_de_semana"))
}
