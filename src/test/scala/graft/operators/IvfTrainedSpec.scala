package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q100's Lloyd-trained IVF: training strictly helps (or at least never
  * hurts) the assignment distortion, moves the codebook, and keeps
  * probe recall.
  */
class IvfTrainedSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("training reduces distortion and moves the codebook") {
    val seed = IvfAnn.buildIndex(spark, dir, k = 8)
    val trained = IvfAnn.buildTrainedIndex(spark, dir, k = 8, iters = 2)
    val d0 = IvfAnn.distortion(seed)
    val d2 = IvfAnn.distortion(trained)
    assert(d2 <= d0, s"Lloyd iterations worsened distortion: $d0 -> $d2")
    assert(d2 < d0, s"training was a no-op on the fixture ($d0)")
    val moved = seed.pivots.zip(trained.pivots).count {
      case ((_, a, _), (_, b, _)) => !a.sameElements(b)
    }
    assert(moved > 0, "no centroid moved in two iterations")
  }

  test("trained probe keeps useful recall vs exact top-5") {
    val trained = IvfAnn.buildTrainedIndex(spark, dir, k = 8, iters = 2)
    val queries = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 25 === 0)
    val approx = IvfAnn.probe(spark, trained, queries, nprobe = 3, topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.q34CosineTopk(spark, dir)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    info(f"trained recall@5 (3/8 cells): $recall%.3f")
    assert(recall > 0.45, s"recall=$recall")
  }
}
