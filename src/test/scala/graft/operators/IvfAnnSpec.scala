package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfAnnSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("IVF probe recalls a useful fraction of exact top-5 neighbours") {
    val index = IvfAnn.buildIndex(spark, dir, k = 8)
    val queries = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 25 === 0)
    val approx = IvfAnn.probe(spark, index, queries, nprobe = 3, topK = 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = Similarity.q34CosineTopk(spark, dir)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (approx & exact).size.toDouble / exact.size
    // probing 3 of 8 cells must beat scanning 3/8 of the corpus blindly
    assert(recall > 0.45, s"recall=$recall")
    // every returned neighbour must come from a probed cell: bounded work
    val cells = index.cells.groupBy("cell").count().collect()
    assert(cells.length <= 8 && cells.map(_.getLong(1)).sum == 500L)
  }

  test("index build survives a sparse, offset id space") {
    // ids nowhere near 0: positional cell labelling must still yield a
    // contiguous codebook and a working probe
    val offset = graft.sources.Tables.embeddings(spark, dir)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val index = IvfAnn.buildIndexFrom(offset, k = 8)
    assert(index.pivots.nonEmpty)
    assert(index.pivots.map(_._1).toSeq == index.pivots.indices.toSeq,
      "cell ids must be contiguous from 0")
    val queries = offset.filter(col("vec_id") % 25 === 0).limit(4)
    assert(IvfAnn.probe(spark, index, queries, nprobe = 2, topK = 3).count() > 0)
  }

  test("an empty codebook fails loud instead of probing nothing") {
    // two odd ids with k=1 → m=2 → no id ≡ 0 (mod 2) → no seeds
    val odd = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(3L, 5L))
    val e = intercept[IllegalArgumentException] {
      IvfAnn.buildIndexFrom(odd, k = 1)
    }
    assert(e.getMessage.contains("codebook is empty"))
  }

  test("q185: the persisted+reloaded index probes identically to the in-memory one") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val direct = {
      val idx = IvfAnn.buildIndex(spark, dir, k = 8)
      val q = graft.sources.Tables.embeddingsSharded(spark, dir)
        .filter(col("vec_id") % 25 === 0)
      IvfAnn.probe(spark, idx, q, nprobe = 2, topK = 3).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    }
    val reloaded = graft.queries.OperatorQueries.q185IvfPersist(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(reloaded == direct,
      s"round-trip drifted: only-direct=${(direct -- reloaded).take(3)} " +
        s"only-reloaded=${(reloaded -- direct).take(3)}")
  }
}
