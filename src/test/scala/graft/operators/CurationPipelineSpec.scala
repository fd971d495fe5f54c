package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q82: the composed curation pipeline must be a chain of monotone
  * filters over the sample (each stage's survivors are a subset of the
  * previous stage's), every stage must actually drop something on the
  * fixture corpus (a stage that never fires isn't exercised), and the
  * final manifest must account exactly for the packed windows of the
  * kept set.
  */
class CurationPipelineSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.01"

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  test("stages are monotone and each drops documents on the fixture") {
    val sample = ids(Tables.documents(spark, dir).filter(col("doc_id") % 5 === 0))
    val s1 = ids(Curation.decontaminated(spark, dir))
    val s2 = ids(Curation.qualityGated(Curation.decontaminated(spark, dir)))
    val s4 = ids(Curation.scrubbedAndMixed(
      Curation.qualityGated(Curation.decontaminated(spark, dir))))
    val kept = ids(Curation.dedupKept(Curation.scrubbedAndMixed(
      Curation.qualityGated(Curation.decontaminated(spark, dir)))))
    assert(s1.subsetOf(sample) && s2.subsetOf(s1) && s4.subsetOf(s2) &&
      kept.subsetOf(s4), "a stage produced documents its input lacked")
    assert(s1.size < sample.size, "decontamination dropped nothing")
    assert(s2.size < s1.size, "quality gates dropped nothing")
    assert(s4.size < s2.size, "mixture sampling dropped nothing")
    assert(kept.nonEmpty, "pipeline kept nothing — fixture too aggressive")
  }

  test("manifest accounts exactly for the packed windows of the kept set") {
    val kept = Curation.dedupKept(Curation.scrubbedAndMixed(
      Curation.qualityGated(Curation.decontaminated(spark, dir))))
    val expectedTokens = kept
      .select(size(split(col("text"), " ")).cast("bigint").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val manifest = Curation.q82CurationPipeline(spark, dir).collect()
    assert(manifest.nonEmpty)
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == expectedTokens,
      "manifest token total != kept-set token total")
    assert(manifest.forall { r =>
      val s = r.getAs[Int]("out_shard"); s >= 0 && s < Curation.OutShards
    })
  }

  test("the scrub stage produces no residual PII patterns") {
    val s4 = Curation.scrubbedAndMixed(
      Curation.qualityGated(Curation.decontaminated(spark, dir)))
    val residue = s4.filter(
      col("text").rlike("[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}") ||
        col("text").rlike("[0-9]{6,}")).count()
    assert(residue == 0, s"$residue scrubbed documents still match PII patterns")
  }
}
