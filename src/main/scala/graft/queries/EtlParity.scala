package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Calendar, Facts, SurrogateKeys}
import graft.sources.Tables

/** End-to-end ETL parity check runnable against the DuckDB oracle: maps
  * the TPC-H-ish testdata into reference-shaped sources, then runs the
  * REAL fact builder (graft.etl.Facts) — prescriptions become orders
  * whose `;`-joined medicine list is the order's lineitem part keys.
  * This drives the same code path the warehouse uses
  * (split+explode grain, 4 broadcast dim joins, surrogate keys) on data
  * the oracle can reproduce in SQL.
  */
object EtlParity {

  def q26EtlMedicalFormula(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)

    // formulas_medicas: one prescription per order; medicine codes are
    // the order's part keys in line order.
    val meds = li.groupBy(col("l_orderkey")).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
        x => x.getField("l_partkey").cast("string")), ";").as("medicamentos_recetados"),
      min(col("l_suppkey")).cast("string").as("id_medico"))
    val formulas = o.join(meds, o("o_orderkey") === meds("l_orderkey"))
      .select(col("o_orderkey").cast("string").as("Codigo_Formula"),
        col("o_custkey").cast("string").as("id_usuario"),
        col("id_medico"),
        col("o_orderdate").cast("date").as("fecha"),
        col("medicamentos_recetados"))

    val dimUsuario = SurrogateKeys.assign(
      Tables.customer(spark, dir).select(col("c_custkey").cast("string").as("identificacion")),
      "usuario_id", col("identificacion"))
    val dimMedico = SurrogateKeys.assign(
      Tables.supplier(spark, dir).select(col("s_suppkey").cast("string").as("cedula")),
      "medico_id", col("cedula"))
    val dimMedicamento = SurrogateKeys.assign(
      Tables.part(spark, dir).select(col("p_partkey").cast("string").as("codigo")),
      "medicamento_id", col("codigo"))
    val dimFecha = SurrogateKeys.assign(
      Calendar.dimFecha(spark, "1992-01-01", "1998-12-31"), "fecha_id", col("fecha"))

    Facts.factMedicalFormula(formulas, dimUsuario, dimMedico, dimMedicamento, dimFecha)
      .orderBy(col("Codigo_Formula"), col("medicamento_id"), col("fecha_id"),
        col("usuario_id"), col("medico_id"))
  }

  val q26Oracle: String =
    """WITH formulas AS (
      |  SELECT CAST(o_orderkey AS VARCHAR) AS codigo_formula,
      |    CAST(o_custkey AS VARCHAR) AS id_usuario,
      |    CAST(MIN(l_suppkey) AS VARCHAR) AS id_medico,
      |    CAST(o_orderdate AS DATE) AS fecha,
      |    string_agg(CAST(l_partkey AS VARCHAR), ';' ORDER BY l_linenumber) AS meds
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2, 4),
      |exploded AS (
      |  SELECT codigo_formula, id_usuario, id_medico, fecha,
      |    unnest(string_split(meds, ';')) AS medicamento_idx
      |  FROM formulas),
      |dim_usuario AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS identificacion,
      |    CAST(ROW_NUMBER() OVER (ORDER BY CAST(c_custkey AS VARCHAR)) AS INTEGER) AS usuario_id
      |  FROM customer),
      |dim_medico AS (
      |  SELECT CAST(s_suppkey AS VARCHAR) AS cedula,
      |    CAST(ROW_NUMBER() OVER (ORDER BY CAST(s_suppkey AS VARCHAR)) AS INTEGER) AS medico_id
      |  FROM supplier),
      |dim_medicamento AS (
      |  SELECT CAST(p_partkey AS VARCHAR) AS codigo,
      |    CAST(ROW_NUMBER() OVER (ORDER BY CAST(p_partkey AS VARCHAR)) AS INTEGER) AS medicamento_id
      |  FROM part),
      |dim_fecha AS (
      |  SELECT fecha, CAST(ROW_NUMBER() OVER (ORDER BY fecha) AS INTEGER) AS fecha_id
      |  FROM (SELECT CAST(unnest(generate_series(DATE '1992-01-01', DATE '1998-12-31', INTERVAL 1 DAY)) AS DATE) AS fecha))
      |SELECT f.fecha_id, u.usuario_id, m.medico_id, md.medicamento_id,
      |  e.codigo_formula AS "Codigo_Formula"
      |FROM exploded e
      |JOIN dim_usuario u ON e.id_usuario = u.identificacion
      |JOIN dim_medico m ON e.id_medico = m.cedula
      |JOIN dim_medicamento md ON e.medicamento_idx = md.codigo
      |JOIN dim_fecha f ON e.fecha = f.fecha
      |ORDER BY "Codigo_Formula", medicamento_id, fecha_id, usuario_id, medico_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q26_etl_medical_formula" -> q26EtlMedicalFormula)

  def oracleSql: Map[String, String] = Map(
    "q26_etl_medical_formula" -> q26Oracle)
}
