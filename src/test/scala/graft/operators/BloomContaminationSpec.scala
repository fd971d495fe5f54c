package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q86's bloom-prefiltered contamination: byte-identical to q67, no
  * false negatives, and the prefilter actually prunes non-members.
  */
class BloomContaminationSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q86 equals q67 row for row") {
    val exact = Curation.q67Contamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Curation.q86BloomContamination(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "fixture produced no contamination rows")
    assert(bloom == exact,
      s"missing=${exact -- bloom} extra=${bloom -- exact}")
  }

  test("the prefilter has no false negatives and prunes non-members") {
    import spark.implicits._
    val members = (0 until 500).map(i => s"member shingle $i")
    val probes = members ++ (0 until 2000).map(i => s"absent shingle $i")
    val bench = members.toDF("g")
    val kept = Curation.bloomPrefilter(bench, probes.toDF("g"))
      .collect().map(_.getString(0)).toSet
    // every inserted member must survive — a single false negative
    // would silently drop a contaminated document
    assert(members.forall(kept), "bloom dropped an inserted member")
    // and the point of the filter: non-members mostly do not
    val falsePos = kept.size - members.size
    assert(falsePos < 200, s"$falsePos of 2000 non-members passed — bloom too weak")
  }

  test("the bloom rides a scalar subquery, not an inline literal") {
    // a megabyte binary literal in the filter condition would blow the
    // PlanAudit condition-length guard and bloat every explain string
    val plan = Curation.q86BloomContamination(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("scalar-subquery"),
      s"expected the bloom bytes behind a scalar subquery:\n$plan")
  }

  test("the private-API bridge still plans BloomFilterMightContain") {
    // q86 reaches Catalyst's BloomFilterAggregate / BloomFilterMightContain
    // through a bridge into private internals (the same mechanism
    // InjectRuntimeFilter uses). A Spark upgrade that moves or renames
    // them must fail HERE, loudly, not degrade into some other plan.
    val plan = Curation.q86BloomContamination(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"bloom membership probe vanished from the plan — Spark internals moved:\n$plan")
  }
}
