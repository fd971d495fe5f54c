package graft.operators

import graft.SparkSpec

/** q200's incremental maintenance contract: appending the
  * frozen-codebook-assigned delta to the stored cells must serve a
  * probe bit-identical to a from-scratch assignment of the full corpus
  * against the same codebook, and the stored layout must hold exactly
  * one row per vector after the merge (no duplication across the
  * overwrite + append pair).
  */
class IvfDeltaSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("delta merge serves the same probe as a monolithic rebuild") {
    import org.apache.spark.sql.functions._
    val all = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val standing = all.filter(col("vec_id") % 10 =!= 0)
    val index = IvfAnn.buildIndexFrom(standing, k = 8)
    val monolithic = IvfAnn.probe(spark,
        IvfAnn.Index(IvfAnn.assignTo(index, all), index.pivots),
        graft.sources.Tables.embeddings(spark, dir)
          .filter(col("vec_id") % 25 === 0),
        nprobe = 2, topK = 3)
      .collect().map(_.toSeq).toSet
    val merged = graft.queries.OperatorQueries
      .q200IvfDeltaMerge(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(monolithic.nonEmpty)
    assert(merged == monolithic,
      s"missing=${(monolithic -- merged).take(2)} extra=${(merged -- monolithic).take(2)}")
  }

  test("the merged layout holds exactly one row per vector") {
    import org.apache.spark.sql.functions._
    // q200 has just (re)written the layout in the previous test, but
    // re-run it so this test stands alone
    graft.queries.OperatorQueries.q200IvfDeltaMerge(spark, dir).collect()
    val idxRoot = graft.sources.ShardPaths.resolve(spark, "q200_index", dir)
    val stored = spark.read.parquet(s"$idxRoot/cells")
    val n = graft.sources.Tables.embeddings(spark, dir).count()
    assert(stored.count() == n)
    assert(stored.select("vec_id").distinct().count() == n,
      "duplicate vec_ids in the merged cell layout")
    // the delta slice really lives in the stored layout
    assert(stored.filter(col("vec_id") % 10 === 0).count() > 0)
  }
}
