package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q172's edit semantics on a hand-built corpus: a segment shared by
  * minDocs documents is removed from all of them, unique segments
  * survive in original order, a fully-boilerplate document drops out,
  * and on the real corpus the output only ever removes whole segments
  * (token multiset of clean_text ⊆ original, order preserved).
  */
class BoilerplateScrubSpec extends SparkSpec {

  // 8 tokens — exactly one segment under SegTokens
  private val boiler = "nav home about contact login search footer copyright"

  test("a segment shared by minDocs docs is scrubbed everywhere; unique text survives in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$boiler one two three four five six seven eight"),
      (3L, boiler), // fully boilerplate — must drop out entirely
      (4L, "lone doc with its own words only")).toDF("doc_id", "text")
    val out = Curation.boilerplateScrub(docs, 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L), "doc 3 must vanish")
    val byId = out.map(r => r.getLong(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(1L) == (("alpha beta gamma delta epsilon zeta eta theta", 1L, 1L)))
    assert(byId(2L) == (("one two three four five six seven eight", 1L, 1L)))
    assert(byId(4L) == (("lone doc with its own words only", 1L, 0L)))
  }

  test("below the threshold nothing is removed") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$boiler one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val out = Curation.boilerplateScrub(docs, 3).collect()
    assert(out.forall(_.getLong(3) == 0L), "shared by 2 < minDocs=3 — keep")
  }

  test("q182 composes the gate and the scrub structurally") {
    val dir = "/root/testdata/sf0.01"
    val gate = Curation.q168KAnonymity(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val out = Curation.q182ReleasePipeline(spark, dir).collect()
    // released set == gate survivors (the scrub edits, never drops,
    // unless a doc is ALL boilerplate — assert subset + cohort match)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(gate.contains(id), s"doc $id shipped without passing the gate")
      assert(gate(id) == r.getLong(4), s"doc $id cohort_n drifted")
    }
    // scrub frequencies are computed over survivors, not the corpus:
    // re-run the standalone scrub on exactly the survivor docs and
    // compare row-for-row
    val survivors = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("doc_id")
        .isin(gate.keys.toSeq: _*))
    val standalone = Curation.boilerplateScrub(
        survivors, Curation.BoilerplateMinDocs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val composed = out
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(composed == standalone)
  }

  test("on the real corpus clean_text is the original with whole segments removed") {
    val dir = "/root/testdata/sf0.001"
    val orig = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Curation.q172BoilerplateScrub(spark, dir).collect()
    assert(out.nonEmpty)
    val seg = Curation.SegTokens
    out.foreach { r =>
      val id = r.getLong(0)
      val toks = orig(id).split(" ", -1)
      val segments = toks.grouped(seg).map(_.mkString(" ")).toSeq
      val keptSegs = r.getString(1) match {
        case "" => Seq.empty
        case s => // reconstruct must be a subsequence of original segments
          val expect = segments.filter(_ => true)
          // greedy subsequence check over segment units
          var rem = s
          segments.flatMap { g =>
            if (rem == g || rem.startsWith(g + " ")) {
              rem = rem.stripPrefix(g).stripPrefix(" "); Some(g)
            } else None
          }
      }
      assert(r.getString(1) == keptSegs.mkString(" "),
        s"doc $id clean_text is not an in-order segment subsequence")
      assert(keptSegs.length == r.getLong(2), s"doc $id n_kept")
      assert(segments.length - keptSegs.length == r.getLong(3), s"doc $id n_dropped")
    }
  }
}
