package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfAnn
import graft.sources.Tables

/** q233's two-stage retrieve→rerank contract: the rerank output is a
  * permutation of the retrieve pool (never reaches outside it), the L1
  * scores match a brute-force recomputation from the raw embeddings,
  * and both rank columns obey their orderings.
  */
class CrossRerankSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("rerank stays inside the pool, L1 exact, ranks consistent") {
    val got = OperatorQueries.q233CrossRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getInt(5)))

    // the first-stage pool, straight from the shared probe
    val index = IvfAnn.sharedIndex(spark, dir, k = 8)
    val queries = Tables.embeddingsSharded(spark, dir)
      .filter(col("vec_id") % 25 === 0)
    val pool = IvfAnn.probe(spark, index, queries, nprobe = 2, topK = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap

    // int64-scaled vectors, the index's own quantization
    val sv = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"),
        x => round(x.cast("double") * 1000000).cast("bigint")).as("sv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

    assert(got.nonEmpty)
    got.foreach { case (q, rrk, c, rk, l1, shift) =>
      assert(pool.get((q, c)).contains(rk),
        s"($q,$c) not in pool at retrieve rank $rk")
      val expL1 = sv(q).zip(sv(c)).map { case (a, b) => math.abs(a - b) }.sum
      assert(l1 == expL1, s"($q,$c) l1 $l1 != $expL1")
      assert(shift == rk - rrk)
    }
    // per query: rerank ranks are 1..n dense and L1-sorted
    got.groupBy(_._1).foreach { case (q, rows) =>
      val byRk = rows.sortBy(_._2)
      assert(byRk.map(_._2).toSeq == (1 to rows.length),
        s"query $q rerank ranks not dense")
      val l1s = byRk.map(r => (r._5, r._3))
      assert(l1s.toSeq == l1s.sortBy(identity).toSeq,
        s"query $q not ordered by (l1, cand)")
    }
  }
}
