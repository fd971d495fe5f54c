package graft.operators

import graft.SparkSpec

/** q202's segment-mask invariants: within every window the segments
  * tile the token range seamlessly (b(seg) == a(seg+1), starting at 0)
  * and every window except each shard's last fills to exactly SeqLen —
  * the zero-padding contract q90's aggregate view asserts, here at
  * span grain. Also cross-checks the per-window rollup of the spans
  * against q90's aggregates (n_docs, win_tokens).
  */
class PackingMasksSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("segments tile each window; all but the shard's last fill to SeqLen") {
    val rows = Curation.q202PackingMasks(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val byWin = rows.groupBy(r => (r._1, r._2))
    val lastWin = rows.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).max }
    byWin.foreach { case ((shard, win), segs) =>
      val ordered = segs.sortBy(_._3)
      assert(ordered.head._5 == 0L, s"($shard,$win) does not start at 0")
      ordered.sliding(2).foreach {
        case Array(x, y) =>
          assert(x._6 == y._5, s"($shard,$win) gap between seg ${x._3} and ${y._3}")
        case _ =>
      }
      if (win != lastWin(shard))
        assert(ordered.last._6 == Curation.SeqLen,
          s"($shard,$win) fills to ${ordered.last._6}, expected ${Curation.SeqLen}")
    }
  }

  test("span rollup equals q90's per-window aggregates") {
    val spans = Curation.q202PackingMasks(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(5) - r.getLong(4)))
      .groupBy(_._1).map { case (k, g) => k -> (g.length.toLong, g.map(_._2).sum) }
    val agg = Curation.q90SplitPacking(spark, dir).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(spans.keySet == agg.keySet)
    spans.foreach { case (k, v) =>
      assert(agg(k) == v, s"window $k: spans say $v, q90 says ${agg(k)}")
    }
  }
}
