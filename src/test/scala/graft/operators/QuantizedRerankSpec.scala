package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q87's int8 coarse scan + exact rerank: quantization stays in int8
  * range, zero vectors don't poison it, and the reranked top-k tracks
  * the full-precision bucket scan (q35).
  */
class QuantizedRerankSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("quantized components stay in [-127, 127] and zero vectors quantize to zeros") {
    import spark.implicits._
    val frames = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: must not divide by 0
      (3L, Array(-0.003f, 0.001f, 0.002f, -0.001f)))
      .toDF("vec_id", "embedding")
    val sv = transform(col("embedding"),
      x => round(x.cast("double") * 1000000).cast("bigint"))
    val q = Similarity.withQuantized(frames.withColumn("sv", sv))
      .select(col("vec_id"), col("qv"), col("qnrm"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    q.values.foreach { case (qv, _) =>
      assert(qv.forall(v => v >= -127 && v <= 127), s"out of int8 range: $qv")
    }
    assert(q(2L)._1.forall(_ == 0L) && q(2L)._2 == 0L, "zero vector mis-quantized")
    // the max-|component| always quantizes to ±127 (scale anchoring)
    assert(q(1L)._1.exists(v => math.abs(v) == 127), s"no ±127 anchor in ${q(1L)._1}")
  }

  test("reranked top-3 tracks the exact bucket scan") {
    // q35 = exact cosine over ALL bucket candidates; q87 differs only
    // when a true top-3 falls outside the int8 coarse top-10 — rare by
    // construction (int8 keeps ~2 decimal digits of cosine)
    val exact = Similarity.q35LshAnn(spark, dir)
      .select("query_id", "rk", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val quant = Similarity.q87QuantizedRerank(spark, dir)
      .select("query_id", "rk", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "fixture produced no q35 rows")
    val recall = exact.intersect(quant).size.toDouble / exact.size
    info(f"recall@3 vs exact bucket scan: $recall%.3f (${exact.size} rows)")
    assert(recall >= 0.9, f"quantized rerank recall $recall%.3f below 0.9")
  }
}
