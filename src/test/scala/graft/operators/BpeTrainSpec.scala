package graft.operators

import graft.SparkSpec

/** q204's three-iteration BPE trainer against a brute-force in-memory
  * trainer (pair counting, (count desc, pair asc) adoption, greedy
  * left-to-right non-overlapping re-tokenize), plus the conservation
  * invariant that each adopted merge shrinks the corpus by exactly its
  * count (every merged occurrence replaces two tokens with one).
  */
class BpeTrainSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def trimSpaces(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private def mergeGreedy(toks: Array[String], pa: String, pb: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    toks.foreach { x =>
      if (out.nonEmpty && out.last == pa && x == pb) {
        out.remove(out.length - 1); out += s"$pa $pb"
      } else out += x
    }
    out.toArray
  }

  test("q204 equals the brute-force trainer; each merge conserves tokens") {
    var docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => trimSpaces(r.getString(1).toLowerCase).split(" ", -1))
    val expected = (1 to 3).map { it =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      docs.foreach(t => t.zip(t.drop(1)).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + 1
      })
      val ((pa, pb), c) = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.head
      docs = docs.map(mergeGreedy(_, pa, pb))
      (it, s"$pa $pb", c, docs.map(_.length.toLong).sum)
    }
    val got = TextAnalysis.q204BpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"got $got expected $expected")
    // conservation: tokens_after(i) = tokens_after(i-1) - cnt(i)
    val base = graft.sources.Tables.documents(spark, dir)
      .select("text").collect()
      .map(r => trimSpaces(r.getString(0).toLowerCase).split(" ", -1).length.toLong)
      .sum
    val totals = base +: got.map(_._4)
    got.zipWithIndex.foreach { case ((_, _, cnt, after), i) =>
      assert(after == totals(i) - cnt,
        s"iteration ${i + 1}: $after != ${totals(i)} - $cnt")
    }
  }
}
