package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The four fact-table builders, reproducing the reference's join graphs
  * J1-J28 exactly (SURVEY §2.5), including the semantics traps pinned by
  * tests (SURVEY §7.4): left-join rows silently dropped by later inner
  * joins, the positional 4-way service union, and `na.fill(0)` on
  * `empresa_id`.
  *
  * Every dimension argument must already carry its surrogate `*_id`
  * column (see [[SurrogateKeys]]). Dimensions are broadcast — at scale
  * only the driving fact table shuffles, and only when a later
  * aggregation needs it.
  */
object Facts {

  /** fact_medical_formula — grain: one row per prescribed medicine per
    * formula, via split+explode on the `;`-separated codes
    * (`/root/reference/processing/medical_formula_process.py:26-28,116-121`).
    */
  def factMedicalFormula(formulas: DataFrame, dimUsuario: DataFrame,
      dimMedico: DataFrame, dimMedicamento: DataFrame, dimFecha: DataFrame): DataFrame = {
    val exploded = formulas
      .withColumn("medicamentos_recetados", split(col("medicamentos_recetados"), ";"))
      .withColumn("medicamento_idx", explode(col("medicamentos_recetados")))
    exploded
      .join(broadcast(dimUsuario), exploded("id_usuario") === dimUsuario("identificacion"))
      .join(broadcast(dimMedico), exploded("id_medico") === dimMedico("cedula"))
      .join(broadcast(dimMedicamento), exploded("medicamento_idx") === dimMedicamento("codigo"))
      .join(broadcast(dimFecha), exploded("fecha") === dimFecha("fecha"))
      .select("fecha_id", "usuario_id", "medico_id", "medicamento_id", "Codigo_Formula")
  }

  /** fact_facturacion — grain: payment × pre-existing condition. The
    * preexistence left join (J7) followed by the inner dim_enfermedad
    * join (J12) silently drops payments without preexistences; the
    * empresa left join (J11) + fill(0) keeps self-employed members
    * (`/root/reference/processing/payment_process.py:149-163`).
    */
  def factFacturacion(pagos: DataFrame, empresaCotizante: DataFrame,
      preexistencias: DataFrame, cotizante: DataFrame,
      dimCotizante: DataFrame, dimCentroMedico: DataFrame,
      dimEmpresa: DataFrame, dimEnfermedad: DataFrame, dimFecha: DataFrame): DataFrame = {
    val cotIps = cotizante.select("cedula", "id_ips")
    val aux = pagos
      .join(empresaCotizante, pagos("id_usuario") === empresaCotizante("cotizante"), "left")
      .join(preexistencias, Seq("id_usuario"), "left")
      .join(cotIps, pagos("id_usuario") === cotIps("cedula"), "left")
    val dimCot = dimCotizante.select("cotizante_id", "cedula")
    val dimCm = dimCentroMedico.select("centro_medico_id", "id_ips")
    val dimEmp = dimEmpresa.select("empresa_id", "nit")
    val dimFec = dimFecha.select("fecha_id", "fecha")
    aux
      .join(broadcast(dimCot), aux("id_usuario") === dimCot("cedula"))
      .join(broadcast(dimCm), Seq("id_ips"))
      .join(broadcast(dimEmp), aux("empresa") === dimEmp("nit"), "left")
      .join(broadcast(dimEnfermedad), aux("enfermedad") === dimEnfermedad("nombre"))
      .join(broadcast(dimFec), aux("fecha_pago") === dimFec("fecha"))
      .select("fecha_id", "centro_medico_id", "enfermedad_id", "empresa_id",
        "cotizante_id", "valor_pagado")
      .na.fill(0, Seq("empresa_id"))
  }

  /** fact_retiro — member churn; the medical-center municipio is
    * mojibake-repaired before the region join
    * (`/root/reference/processing/retreat_process.py:156-166`).
    */
  def factRetiro(retiros: DataFrame, cotizante: DataFrame,
      dimCentroMedico: DataFrame, dimRegion: DataFrame,
      dimCotizante: DataFrame, dimFecha: DataFrame): DataFrame = {
    val cotIps = cotizante.select("cedula", "id_ips")
    val cmRepaired = dimCentroMedico.withColumn("municipio", Mojibake.repairMunicipio)
    retiros
      .join(cotIps, retiros("id_usuario") === cotIps("cedula"))
      .join(broadcast(cmRepaired.select("centro_medico_id", "id_ips", "municipio")), Seq("id_ips"))
      .join(broadcast(dimRegion), Seq("municipio"))
      .join(broadcast(dimCotizante.select("cotizante_id", "cedula")), Seq("cedula"))
      .join(broadcast(dimFecha.select("fecha_id", "fecha")),
        retiros("fecha_retiro") === col("fecha"))
      .select("fecha_id", "region_id", "centro_medico_id", "cotizante_id", "cambio_a_eps")
  }

  /** fact_servicio — one row per service event across the positional
    * union of appointments ∪ urgencies ∪ hospitalizations ∪ remissions
    * (`/root/reference/processing/service_process.py:110-158`). The
    * doctor→city lookup is a LEFT join whose null municipios the final
    * inner region join drops (J27→J28).
    *
    * Column ORDER carries the union's semantics: each branch is aligned
    * by drop/rename/lit exactly as the reference does, then unioned
    * positionally.
    */
  def factServicio(citas: DataFrame, urgencias: DataFrame,
      hospitalizaciones: DataFrame, remisiones: DataFrame, serviciosPos: DataFrame,
      medico: DataFrame, ips: DataFrame,
      dimMedico: DataFrame, dimUsuario: DataFrame, dimRegion: DataFrame,
      dimHora: DataFrame, dimFecha: DataFrame): DataFrame = {
    val remJoined = remisiones.join(serviciosPos,
      remisiones("servicio_pos") === serviciosPos("id_servicio_pos"))

    val citasAligned = citas.drop("codigo_cita")
      .withColumn("tipo_servicio", lit("Cita General"))
    val urgAligned = urgencias.drop("codigo_urgencia")
      .withColumn("tipo_servicio", lit("Urgencia"))
    val hospAligned = hospitalizaciones.drop("codigo_hospitalizacion", "duracion_hospitalizacion")
      .withColumn("tipo_servicio", lit("Hospitalización"))
    val remAligned = remJoined
      .drop("codigo_remision", "id_medico_remite", "diagnostico", "servicio_pos",
        "id_servicio_pos", "costo")
      .withColumnRenamed("descripcion", "diagnostico")
      .withColumnRenamed("hora_remision", "hora_solicitud")
      .withColumnRenamed("fecha_remision", "fecha_solicitud")
      .withColumn("tipo_servicio", lit("Remision"))

    val union = citasAligned.union(urgAligned).union(hospAligned).union(remAligned)

    val ipsRepaired = ips.withColumn("municipio", Mojibake.repairMunicipio)
    val regionAux = medico.join(ipsRepaired.select("id_ips", "municipio"), Seq("id_ips"))

    val horaSol = dimHora.select(col("hora_id").as("hora_solicitud_id"),
      col("hora_label").as("hora_label_sol"))
    val horaAte = dimHora.select(col("hora_id").as("hora_atencion_id"),
      col("hora_label").as("hora_label_ate"))
    val fechaSol = dimFecha.select(col("fecha_id").as("fecha_solicitud_id"),
      col("fecha").as("fecha_sol"))
    val fechaAte = dimFecha.select(col("fecha_id").as("fecha_atencion_id"),
      col("fecha").as("fecha_ate"))

    val dimUsu = dimUsuario.select("usuario_id", "identificacion")
    val dimMed = dimMedico.select("medico_id", "cedula")
    union
      .join(broadcast(dimUsu), union("id_usuario") === dimUsu("identificacion"))
      .join(broadcast(dimMed), union("id_medico") === dimMed("cedula"))
      .join(broadcast(horaSol), union("hora_solicitud") === horaSol("hora_label_sol"))
      .join(broadcast(horaAte), union("hora_atencion") === horaAte("hora_label_ate"))
      .join(broadcast(fechaSol), union("fecha_solicitud") === fechaSol("fecha_sol"))
      .join(broadcast(fechaAte), union("fecha_atencion") === fechaAte("fecha_ate"))
      .join(broadcast(regionAux.select("cedula", "municipio")), Seq("cedula"), "left")
      .join(broadcast(dimRegion), Seq("municipio"))
      .select("fecha_solicitud_id", "hora_solicitud_id", "fecha_atencion_id",
        "hora_atencion_id", "usuario_id", "medico_id", "region_id",
        "tipo_servicio", "diagnostico")
  }
}
