package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q83: the combined keeper set must be exactly the minhash keepers
  * minus the embedding discards bridged over vec_id = doc_id, and
  * documents with no vector must survive the semantic stage (they have
  * no semantic evidence against them).
  */
class SemanticBridgeSpec extends SparkSpec {

  test("q83 equals q56 keepers minus q79 discards over the id bridge") {
    val dir = "/root/testdata/sf0.001"
    val text = Dedup.q56DedupKeepers(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val vecKept = Similarity.q79EmbeddingKeepers(spark, dir)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val combined = Similarity.q83CombinedKeepers(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected = text.filter(id => id >= nVecs || vecKept.contains(id))
    assert(combined == expected,
      s"bridge drift: ${(combined diff expected).size} extra, " +
        s"${(expected diff combined).size} missing")
    assert(combined.subsetOf(text), "q83 kept a doc q56 discarded")
  }

  test("documents without a vector survive the semantic stage") {
    // sf0.1 has 5000 documents but only 2000 embeddings: every sampled
    // minhash keeper with doc_id >= 2000 must appear in q83 untouched
    val dir = "/root/testdata/sf0.1"
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val text = Dedup.q56DedupKeepers(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val combined = Similarity.q83CombinedKeepers(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val uncovered = text.filter(_ >= nVecs)
    assert(uncovered.nonEmpty, "fixture regression: every doc has a vector")
    assert(uncovered.subsetOf(combined),
      "a document with no vector was discarded by the semantic stage")
  }
}
