package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** q90's boundary-splitting packer: every non-final window is exactly
  * SeqLen tokens (zero padding waste) and no token is lost or doubled.
  */
class SplitPackingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.01"

  test("all windows except each shard's last are exactly SeqLen tokens") {
    val rows = Curation.q90SplitPacking(spark, dir)
      .select("shard", "win", "win_tokens").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val lastWin = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val partial = rows.filter { case (s, w, t) =>
      w != lastWin(s) && t != Curation.SeqLen
    }
    assert(partial.isEmpty, s"non-final windows not full: ${partial.take(5).toSeq}")
    // windows are contiguous from 0 — a gap would mean a dropped span
    rows.groupBy(_._1).foreach { case (s, ws) =>
      val wins = ws.map(_._2).sorted
      assert(wins.sameElements(0L to lastWin(s)), s"shard $s windows not contiguous: ${wins.toSeq}")
    }
  }

  test("token counts are conserved against the raw corpus") {
    val packed = Curation.q90SplitPacking(spark, dir)
      .agg(sum("win_tokens")).collect()(0).getLong(0)
    val raw = Tables.documents(spark, dir)
      .select(size(split(col("text"), " ")).cast("bigint").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(packed == raw, s"packed $packed tokens vs raw $raw")
  }
}
