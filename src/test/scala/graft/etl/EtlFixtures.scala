package graft.etl

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic reference-shaped source fixtures (FIXTURES.md §A).
  * Small enough to eyeball; shaped to exercise every semantics trap:
  * mojibake municipios, missing preexistencias (J7→J12 drop), null and
  * dangling empresa FKs (J11 + fill 0), a doctor with no IPS (J27→J28
  * drop), duplicate beneficiary rows (dedup), multi-code prescriptions
  * (explode grain).
  */
object EtlFixtures {

  def d(s: String): Date = Date.valueOf(s)

  def sources(spark: SparkSession): String => DataFrame = {
    import spark.implicits._

    val cotizante = Seq(
      // cedula, nombre, fecha_nacimiento, sexo, tipo_cotizante, nivel_escolaridad,
      // fecha_afiliacion, proviene_otra_eps, id_ips, direccion, estado_civil,
      // estracto, tipo_discapacidad, salario_base
      ("C1", "Ana", d("1980-01-01"), "F", "dependiente", "universitaria",
        d("2005-06-01"), 1, "I1", "Calle 1", "soltero", 3, "ninguna", 2000.0),
      ("C2", "Luis", d("1975-05-05"), "M", "independiente", "secundaria",
        d("2004-03-15"), 0, "I2", "Calle 2", "casado", 2, "ninguna", 1500.0))
      .toDF("cedula", "nombre", "fecha_nacimiento", "sexo", "tipo_cotizante",
        "nivel_escolaridad", "fecha_afiliacion", "proviene_otra_eps", "id_ips",
        "direccion", "estado_civil", "estracto", "tipo_discapacidad", "salario_base")

    val beneficiario = Seq(
      ("B1", "Mia", d("2010-02-02"), "F"),
      ("B1", "Mia", d("2010-02-02"), "F")) // duplicate: dedup must collapse
      .toDF("id_beneficiario", "nombre", "fecha_nacimiento", "sexo")

    val ips = Seq(
      ("I1", "Clinica Uno", "Cra 10", "clinica", "Medellin"), // mojibake source value
      ("I2", "Hospital Dos", "Cra 20", "hospital", "Bogota"))
      .toDF("id_ips", "nombre", "direccion", "tipo_ips", "municipio")

    val medico = Seq(
      ("M1", "Dr. Sol", "general", "cardio", "I1", "Cll 5"),
      ("M2", "Dr. Mar", "pediatria", "neo", "I9", "Cll 6")) // I9 has no IPS row
      .toDF("cedula", "nombre", "especialidad", "subespecialidad", "id_ips",
        "Direccion_Consultorio")

    val preexistencias = Seq(("C1", "Diabetes"))
      .toDF("id_usuario", "enfermedad")

    val empresa = Seq(("N1", "Acme")).toDF("nit", "nombre")

    val empresaCotizante = Seq(("C1", d("2005-01-01")))
      .toDF("cotizante", "fecha_vinculacion")

    val formulas = Seq(
      ("F1", "C1", "M1", d("2006-01-02"), "A;B;C"),
      ("F2", "B1", "M2", d("2006-01-03"), "A"))
      .toDF("Codigo_Formula", "id_usuario", "id_medico", "fecha", "medicamentos_recetados")

    val medicamentos = Seq(
      ("A", "Acetaminofen", "tableta", "tabs x10", "LabX reg1", 10.5, "Genérico"),
      ("B", "Ibuprofeno", "capsula", "caps x20", "LabY reg2", 20.0, "Comercial"),
      ("C", "Amoxicilina", "jarabe", "120ml", "LabZ reg3", 30.0, "Genérico"))
      .toDF("Código", "Nombre Genérico", "Forma Farmacéutica", "Presentación",
        "Laboratorio y Registro", "Precio", "Tipo Medicamento")

    val pagos = Seq(
      ("C1", Some("N1"), d("2006-01-05"), 100.0),
      ("C2", None, d("2006-01-06"), 50.0), // no preexistencia → J12 drops
      ("C1", Some("NX"), d("2006-01-07"), 75.0)) // dangling empresa FK → id 0
      .toDF("id_usuario", "empresa", "fecha_pago", "valor_pagado")

    val retiros = Seq(("C1", d("2006-02-01"), "EPS Rival"))
      .toDF("id_usuario", "fecha_retiro", "cambio_a_eps")

    val regionSnapshot = Seq(
      ("Medellín", "Antioquia", "Andina"), // only repaired names join
      ("Bogotá D.C.", "Cundinamarca", "Andina"))
      .toDF("municipio", "departamento", "region")

    val serviciosPos = Seq(("SP1", "Consulta especializada", 10.0))
      .toDF("id_servicio_pos", "descripcion", "costo")

    val citas = Seq(
      ("CG1", "C1", "M1", d("2006-01-10"), "08:00:00", d("2006-01-11"), "09:30:00", "Gripe"))
      .toDF("codigo_cita", "id_usuario", "id_medico", "fecha_solicitud",
        "hora_solicitud", "fecha_atencion", "hora_atencion", "diagnostico")

    val urgencias = Seq(
      ("U1", "B1", "M1", d("2006-01-12"), "10:00:00", d("2006-01-12"), "10:15:00", "Fractura"))
      .toDF("codigo_urgencia", "id_usuario", "id_medico", "fecha_solicitud",
        "hora_solicitud", "fecha_atencion", "hora_atencion", "diagnostico")

    val hospitalizaciones = Seq(
      // M2's IPS is unknown → dropped by the final inner region join (J27→J28)
      ("H1", "C2", "M2", d("2006-01-13"), "11:00:00", d("2006-01-14"), "12:00:00",
        "Apendicitis", 3))
      .toDF("codigo_hospitalizacion", "id_usuario", "id_medico", "fecha_solicitud",
        "hora_solicitud", "fecha_atencion", "hora_atencion", "diagnostico",
        "duracion_hospitalizacion")

    val remisiones = Seq(
      ("R1", "C1", "M1", "M2", "nota interna", d("2006-01-15"), "13:00:00",
        d("2006-01-16"), "14:00:00", "SP1"))
      .toDF("codigo_remision", "id_usuario", "id_medico", "id_medico_remite",
        "diagnostico", "fecha_remision", "hora_remision", "fecha_atencion",
        "hora_atencion", "servicio_pos")

    Map(
      "cotizante" -> cotizante, "beneficiario" -> beneficiario, "ips" -> ips,
      "medico" -> medico, "preexistencias" -> preexistencias, "empresa" -> empresa,
      "empresa_cotizante" -> empresaCotizante, "formulas_medicas" -> formulas,
      "medicamentos" -> medicamentos, "pagos" -> pagos, "retiros" -> retiros,
      "region_snapshot" -> regionSnapshot, "servicios_pos" -> serviciosPos,
      "citas_generales" -> citas, "urgencias" -> urgencias,
      "hospitalizaciones" -> hospitalizaciones, "remisiones" -> remisiones)
  }
}
