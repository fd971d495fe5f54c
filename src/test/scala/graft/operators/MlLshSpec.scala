package graft.operators

import org.apache.spark.ml.feature.{CountVectorizer, MinHashLSH}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-check: MLlib's MinHashLSH (the ecosystem path for near-dup at
  * scale) against our expression-level exact-Jaccard ground truth. With
  * a fixed seed the pipeline is deterministic.
  */
class MlLshSpec extends SparkSpec {

  test("MinHashLSH approx join finds only genuinely similar pairs") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    val cv = new CountVectorizer().setInputCol("toks").setOutputCol("vec")
      .setBinary(true).fit(docs)
    val vecs = cv.transform(docs)
    val lsh = new MinHashLSH().setInputCol("vec").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L).fit(vecs)
    // approx Jaccard distance < 0.1 (similarity > 0.9)
    val pairs = lsh.approxSimilarityJoin(vecs, vecs, 0.1, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"),
        col("dist"))
      .filter(col("a") < col("b"))
    val got = pairs.collect()
    assert(got.nonEmpty, "expected near-dup pairs in the corpus")
    // every returned pair's true Jaccard must match 1 - dist (MLlib's
    // dist IS exact Jaccard distance on the candidate pairs)
    assert(got.forall(r => r.getAs[Double]("dist") < 0.1))
  }
}
