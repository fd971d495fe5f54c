package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q85's incremental delta-vs-corpus dedup: corpus docs always win,
  * delta-internal dups resolve greedy-by-id, corpus is never re-deduped.
  */
class IncrementalDedupSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def toksOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
  }

  test("corpus dups discard the delta doc regardless of id order") {
    // delta = doc_id % 3 == 0. Identical texts force Jaccard 1.0;
    // distinct vocabularies force 0.
    val docs = toksOf(Seq(
      3L -> "alpha beta gamma delta epsilon", // delta, dup of corpus 10
      10L -> "alpha beta gamma delta epsilon", // corpus — already accepted
      6L -> "one two three four five", // delta, dup of delta 9
      9L -> "one two three four five", // delta — loses to smaller id 6
      12L -> "unique text never repeated anywhere", // delta, clean
      5L -> "corpus only duplicate text here", // corpus dup pair...
      20L -> "corpus only duplicate text here")) // ...must stay untouched
    val discards = Dedup.incrementalDiscards(docs, _ % 3 === 0)
      .collect().map(_.getLong(0)).toSet
    // 3 discarded by corpus 10 (larger id — corpus wins anyway);
    // 9 discarded by smaller delta 6; corpus ids never discarded
    assert(discards == Set(3L, 9L), s"got $discards")
  }

  test("fixture keepers match the symmetric pair graph's incremental reduction") {
    // Candidate generation is band-driven, so the asymmetric scan's
    // verified pairs are exactly the symmetric q32 pairs restricted to
    // delta participants — derive the expected discard set from them.
    val pairs = Dedup.q32MinhashNeardup(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val delta = (id: Long) => id % 3 == 0
    val expectedDiscards = pairs.flatMap { case (a, b) =>
      // a < b always: b (delta) loses to any a; a (delta) loses to a
      // corpus b (already accepted) but NOT to a larger delta b
      Seq(b).filter(delta) ++ Seq(a).filter(x => delta(x) && !delta(b))
    }.toSet
    val sampleDelta = graft.sources.Tables.documentsSharded(spark, dir)
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Dedup.q85IncrementalDedup(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == sampleDelta -- expectedDiscards,
      s"missing=${(sampleDelta -- expectedDiscards) -- kept} extra=${kept -- (sampleDelta -- expectedDiscards)}")
    assert(kept.forall(delta), "a corpus doc leaked into the delta keeper set")
  }
}
