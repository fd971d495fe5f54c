package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SyntheticSourcesSpec extends SparkSpec {

  lazy val sources = SyntheticSources.generate(
    spark, SyntheticSources.Sizes().scaled(0.05))
  lazy val wh = new Warehouse(spark, sources)

  test("generated sources have reference shapes and the warehouse builds") {
    // the generator must produce every relation the warehouse consumes
    val facts = wh.allFacts.map { case (n, df) => n -> df.count() }
    assert(facts.values.forall(_ > 0L), s"empty fact: $facts")
  }

  test("explode grain: medical-formula fact rows = total prescribed codes") {
    val expected = sources("formulas_medicas")
      .join(wh.dimUsuario.select(col("identificacion")),
        col("id_usuario") === col("identificacion"), "left_semi")
      .select(size(split(col("medicamentos_recetados"), ";")).as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(wh.factMedicalFormula.count() == expected)
  }

  test("mojibake municipios from the generator all repair into the snapshot") {
    val repaired = sources("ips")
      .select(Mojibake.repairMunicipio.as("m")).distinct()
      .collect().map(_.getString(0)).toSet
    val snapshot = graft.sources.RegionSource.rows.map(_._1).toSet
    assert(repaired.subsetOf(snapshot), s"unjoinable: ${repaired -- snapshot}")
  }
}
