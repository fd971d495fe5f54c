package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q214: the audit's invariants are the two packers' contracts —
  * identical token mass (packing moves tokens, never drops them), a
  * zero-overflow split strategy whose only underfill is the final
  * window of each shard, and a first-token strategy that genuinely
  * pays waste on the fixture (or the audit proves nothing).
  */
class PackingWasteSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val rows = Curation.q214PackingWaste(spark, dir).collect()
    .map(r => r.getAs[String]("strategy") -> r).toMap

  test("token mass is conserved and equals the corpus's") {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows("first_token").getAs[Long]("tokens") == corpus)
    assert(rows("split").getAs[Long]("tokens") == corpus)
  }

  test("split packing never overflows; underfill is final-window only") {
    val split = rows("split")
    assert(split.getAs[Long]("overflow") == 0L,
      "split windows are capped at SeqLen by construction")
    // at most one underfilled window per shard, each under SeqLen
    val nShards = Curation.PackShards.toLong
    assert(split.getAs[Long]("underfill") < nShards * Curation.SeqLen,
      "only each shard's final window may underfill")
  }

  test("the fixture exercises first-token waste") {
    val ft = rows("first_token")
    assert(ft.getAs[Long]("underfill") + ft.getAs[Long]("overflow") > 0L,
      "fixture too uniform to demonstrate the packers' difference")
    // both strategies see the same corpus through the same windowing
    // arithmetic, so window counts stay within one window per shard
    val d = math.abs(ft.getAs[Long]("n_windows") -
      rows("split").getAs[Long]("n_windows"))
    assert(d <= Curation.PackShards.toLong)
  }
}
