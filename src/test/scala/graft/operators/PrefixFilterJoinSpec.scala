package graft.operators

import graft.SparkSpec

/** q195's prefix-filtered exact-Jaccard join against a brute-force
  * all-pairs recomputation (completeness + exactness), plus the pruning
  * property that justifies the operator: the prefix candidate set must
  * be strictly smaller than the any-shared-shingle candidate set.
  */
class PrefixFilterJoinSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** Spark `trim` removes only ' '. */
  private def trimSpaces(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private def shingleSets(): Map[Long, Set[String]] =
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .filter(_.getLong(0) % 2 == 0)
      .map { r =>
        val norm = trimSpaces(r.getString(1).toLowerCase)
        val t = norm.split(" ", -1)
        val sh =
          if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
          else Set(norm)
        r.getLong(0) -> sh
      }.toMap

  test("q195 equals the brute-force all-pairs J >= 1/2 join") {
    val sets = shingleSets()
    val ids = sets.keys.toArray.sorted
    val expected = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sets(a) & sets(b)).size
      if 3L * inter >= sets(a).size + sets(b).size
    } yield (a, b, sets(a).size.toLong, sets(b).size.toLong, inter.toLong)).toSet
    assert(expected.nonEmpty, "fixture produced no J >= 1/2 pairs")
    val got = Dedup.q195PrefixFilterJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("prefix filtering prunes the candidate space") {
    val sets = shingleSets()
    val ids = sets.keys.toArray.sorted
    val anyShared = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      if (sets(ids(i)) & sets(ids(j))).nonEmpty
    } yield 1).sum
    // recompute the prefix candidate count under the operator's global
    // (df asc, shingle asc) order and tau = 0.5 prefix length
    val df = sets.values.toSeq.flatten.groupBy(identity)
      .map { case (g, o) => g -> o.size }
    val prefixes = sets.map { case (id, s) =>
      val n = s.size
      val plen = n - (n + 1) / 2 + 1
      id -> s.toSeq.sortBy(g => (df(g), g)).take(plen).toSet
    }
    val prefixCands = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      na = sets(ids(i)).size; nb = sets(ids(j)).size
      if 2 * math.min(na, nb) >= math.max(na, nb)
      if (prefixes(ids(i)) & prefixes(ids(j))).nonEmpty
    } yield 1).sum
    assert(prefixCands < anyShared,
      s"prefix candidates $prefixCands not smaller than any-shared $anyShared")
    assert(prefixCands > 0)
  }
}
