package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q154's cross-modal composition against its two parents: the kept set
  * must be a subset of q83's combined doc-tier keepers AND of q97's
  * media-bucket keepers, the media condition must actually drop
  * something on this fixture, and the whole result must equal the
  * explicit three-way join of the parent decisions.
  */
class CrossModalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q154: subset of q83 and q97 keepers, equals the explicit composition") {
    val cross = Multimodal.q154CrossModalKeepers(spark, dir)
    val combined = Similarity.q83CombinedKeepers(spark, dir)
    val media = Multimodal.q97PhashDedup(spark, dir)

    // subset of the doc-tier combined keepers
    assert(cross.select("doc_id").exceptAll(combined.select("doc_id")).isEmpty,
      "q154 emitted a doc q83 discarded")
    // every kept doc is the phash keeper of its OWN media bucket
    assert(cross.select(col("doc_id"), col("ahash"))
      .exceptAll(media.select(col("keeper_id").as("doc_id"), col("ahash"))).isEmpty,
      "q154 emitted a doc that is not its bucket's media keeper")
    // the media condition genuinely bites on this fixture (91/100 slice
    // docs share a bucket with a smaller doc_id at sf0.001)
    assert(cross.count() < combined.count(),
      "media filter dropped nothing — fixture no longer exercises the composition")

    // exact composition: q154 == q83 keepers ⋈ own media ahash ⋈ q97
    // keeper decision
    val expected = combined
      .join(Multimodal.phashed(spark, dir), Seq("doc_id"))
      .join(media.select(col("ahash"), col("keeper_id")), Seq("ahash"))
      .where(col("doc_id") === col("keeper_id"))
      .select("doc_id", "lang", "n_chars", "ahash")
    assert(cross.exceptAll(expected).isEmpty && expected.exceptAll(cross).isEmpty,
      "q154 drifted from the explicit three-way composition")
  }
}
