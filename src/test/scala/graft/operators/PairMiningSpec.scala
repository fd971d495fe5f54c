package graft.operators

import graft.SparkSpec

/** q143/q144: contrastive pair mining and the inverted index, both
  * checked against full brute-force in-memory recomputations.
  */
class PairMiningSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("q143 triplets match a brute-force recomputation") {
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .map { case (id, l) => (id, l, h32(s"cp:$id")) }
    val withBucket = base.map { case (id, l, h) => (id, l, h, h % 16) }
    val pos: Map[Long, Option[Long]] =
      withBucket.toSeq.groupBy(t => (t._2, t._4)).iterator.flatMap { case (_, g) =>
        val sorted = g.sortBy(t => (t._3, t._1))
        val nexts: Seq[Option[Long]] =
          sorted.drop(1).map(t => Option(t._1)) :+ Option.empty[Long]
        sorted.map(_._1).zip(nexts)
      }.toMap
    val neg = withBucket.flatMap { case (id, l, _, bkt) =>
      val cands = withBucket.filter(c => c._4 == bkt && c._2 != l)
      if (cands.isEmpty) None
      else Some(id -> Some(cands.map(c => c._3 * 1048576L + c._1).min % 1048576L))
    }.toMap
    val expected = withBucket.map { case (id, l, _, _) =>
      (id, l, pos(id), neg.getOrElse(id, None))
    }.sortBy(_._1)
    val rows = Similarity.q143ContrastivePairs(spark, dir).collect().map { r =>
      (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }
    assert(rows.length == base.length, "no anchor may be dropped")
    assert(rows.toSeq == expected.toSeq)
  }

  test("q143 partners are valid: pos shares the label, neg differs") {
    val labels = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    Similarity.q143ContrastivePairs(spark, dir).collect().foreach { r =>
      val l = r.getInt(1)
      if (!r.isNullAt(2)) assert(labels(r.getLong(2)) == l, "pos label mismatch")
      if (!r.isNullAt(3)) assert(labels(r.getLong(3)) != l, "neg label collision")
    }
  }

  test("q143 packed-key guard: out-of-range vec_id fails loud") {
    import org.apache.spark.sql.functions._
    // in range: passes through unchanged
    val ok = spark.range(3).select(
      Similarity.guardedPackedId(col("id") + 1048573L).as("p")).collect()
    assert(ok.map(_.getLong(0)).toSeq == Seq(1048573L, 1048574L, 1048575L))
    // 2^20 itself is out of the pack range: the argmin key would
    // collide with (h+1)·2^20 + 0 — must raise, not corrupt
    val e = intercept[Exception] {
      spark.range(1).select(
        Similarity.guardedPackedId(col("id") + 1048576L).as("p")).collect()
    }
    assert(e.getMessage != null)
  }

  test("q144 postings match a brute-force index build") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val byTok = docs.flatMap { case (id, ts) => ts.map(_ -> id) }
    val stats = byTok.groupBy(_._1).map { case (t, g) =>
      (t, g.map(_._2).distinct.length.toLong, g.length.toLong,
        g.map(_._2).distinct.sorted.take(20).mkString(","))
    }
    val expected = stats.toSeq.sortBy { case (t, df, _, _) => (-df, t) }.take(50)
    val rows = TextAnalysis.q144InvertedIndex(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == expected)
  }
}
