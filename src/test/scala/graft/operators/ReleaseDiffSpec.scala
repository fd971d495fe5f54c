package graft.operators

import graft.SparkSpec

/** q197's release diff against a brute-force recomputation off the
  * collected fixture, plus the coverage property that all four diff
  * statuses actually occur (a fixture where e.g. the scrub never fires
  * would silently stop exercising the "changed" arm).
  */
class ReleaseDiffSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q197 equals the brute-force snapshot diff") {
    val rows = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val old = rows.filter(_._1 % 7 != 0)
      .map { case (id, t, s) => id -> (s, t) }.toMap
    val neu = rows.filter(_._1 % 5 != 0)
      .map { case (id, t, s) =>
        val t2 = if (id % 11 == 0) t.split(" ", -1).drop(3).mkString(" ") else t
        id -> (s, t2)
      }.toMap
    val expected = (old.keySet ++ neu.keySet).toSeq.map { id =>
      val (src, status, d) = (old.get(id), neu.get(id)) match {
        case (None, Some((s, t)))          => (s, "added", t.length.toLong)
        case (Some((s, t)), None)          => (s, "removed", -t.length.toLong)
        case (Some((s, a)), Some((_, b))) =>
          (s, if (a == b) "unchanged" else "changed",
            (b.length - a.length).toLong)
        case _ => sys.error("unreachable")
      }
      ((src, status), d)
    }.groupBy(_._1).map { case (k, g) =>
      k -> (g.size.toLong, g.map(_._2).sum)
    }
    val statuses = expected.keySet.map(_._2)
    assert(statuses == Set("added", "removed", "changed", "unchanged"),
      s"fixture exercises only $statuses")
    val got = Curation.q197ReleaseDiff(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == expected,
      s"diff mismatch: missing=${(expected.keySet -- got.keySet).take(3)} " +
        s"extra=${(got.keySet -- expected.keySet).take(3)}")
  }
}
