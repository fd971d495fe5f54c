package graft.operators

import graft.SparkSpec

/** q206's margin reranking against a brute-force recompute (shared
  * probe via AnnTestKit, top-4 neighbourhood means on both sides, the
  * distance margin), plus evidence that the margin genuinely reranks
  * (some query's margin-top-1 differs from the raw-cosine top-1 q201
  * emits).
  */
class BitextMarginSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def vecs(): Array[(Long, Array[Long], String)] = {
    val langs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(AnnTestKit.lift).toArray,
        langs(r.getLong(0))))
      .sortBy(_._1)
  }

  private def bruteMargins(vs: Array[(Long, Array[Long], String)])
      : Map[Long, (Long, Double, Double)] = {
    val scored = AnnTestKit.bruteProbe[String](vs,
      standing = _ => true,
      queryOk = v => v._3 == "en" && v._1 % 5 == 0,
      candOk = v => v._3 == "fr",
      k = 8, nprobe = 3, topK = Int.MaxValue).toSeq
    def dec(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val fwd = scored.groupBy(_._1).map { case (q, g) =>
      val top = g.sortBy(t => (-t._4, t._3)).take(4)
      q -> (top.map(t => dec(t._4)).sum, top.size)
    }
    val bwd = scored.groupBy(_._3).map { case (c, g) =>
      val top = g.sortBy(t => (-t._4, t._1)).take(4)
      c -> (top.map(t => dec(t._4)).sum, top.size)
    }
    scored.groupBy(_._1).map { case (q, g) =>
      val withMargin = g.map { case (_, _, c, cos) =>
        // the exact integer micro-unit margin q206 computes: margin·10⁶
        // = num/den, HALF_UP — never a rounded double (round-18 rework)
        val (sf, kf) = fwd(q)
        val (sb, kb) = bwd(c)
        val cosE6 = math.round(cos * 1e6)
        val sfE6 = (sf * BigDecimal(1000000)).toLongExact
        val sbE6 = (sb * BigDecimal(1000000)).toLongExact
        val num = cosE6 * 2 * kf * kb - (sfE6 * kb + sbE6 * kf)
        val den = 2L * kf * kb
        val mE6 =
          if (num < 0) -((2 * -num + den) / (2 * den))
          else (2 * num + den) / (2 * den)
        (c, cos, mE6.toDouble / 1e6)
      }
      q -> withMargin.sortBy(t => (-t._3, t._1)).head
    }
  }

  test("q206 equals the brute-force margin reranking") {
    val expected = bruteMargins(vecs())
    assert(expected.nonEmpty)
    val got = graft.queries.OperatorQueries.q206BitextMargin(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got == expected,
      s"diff=${expected.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(3)}")
  }

  test("the margin genuinely reranks at least one query") {
    val byMargin = graft.queries.OperatorQueries.q206BitextMargin(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCos = graft.queries.OperatorQueries.q201BitextMining(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byMargin.keySet == byCos.keySet)
    assert(byMargin.exists { case (q, c) => byCos(q) != c },
      "margin never changed a top-1 — the rerank is vacuous on this fixture")
  }
}
