package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** IVF-style approximate nearest neighbour over the embeddings table:
  * k-means centroids form the inverted-file index, each vector is
  * assigned to its nearest centroid's cell, and queries probe only the
  * `nprobe` nearest cells — the centroid alternative to the
  * random-hyperplane buckets in [[Similarity.q35LshAnn]].
  *
  * Index build (k-means fit + assignment) is the offline path and may
  * use MLlib/UDFs; the probe join is the hot path and stays a
  * bucket-equi-join + exact scored top-k, the same shuffle shape as
  * LSH: keyed on cell id, salted if a cell is hot. At 100 TB, cells
  * partition the corpus so each query scans corpus/k · nprobe vectors.
  */
object IvfAnn {

  case class Index(cells: DataFrame /* vec_id, cell, embedding */,
      centroids: Array[(Int, Array[Double])])

  private def toVec = udf { arr: Seq[Float] =>
    Vectors.dense(arr.map(_.toDouble).toArray)
  }

  def buildIndex(spark: SparkSession, dir: String, k: Int, seed: Long): Index = {
    val emb = Tables.embeddingsSharded(spark, dir)
      .withColumn("features", toVec(col("embedding")))
    // few iterations suffice: cells only need to be a reasonable space
    // partition (probe recall is asserted in IvfAnnSpec), and index
    // build cost is dominated by the k-means passes over the corpus
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("features").fit(emb)
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("prediction").as("cell"), col("embedding"))
    Index(assigned, centroids)
  }

  /** Cosine of the query against its probed cells' members, exact
    * within the probe set; top-k per query.
    */
  def probe(spark: SparkSession, index: Index, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    val centroidRows = index.centroids.toSeq
    val bc = spark.sparkContext.broadcast(centroidRows)
    val nearestCells = udf { arr: Seq[Float] =>
      val v = arr.map(_.toDouble).toArray
      bc.value.map { case (cell, c) =>
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
        (cell, d)
      }.sortBy(_._2).take(nprobe).map(_._1)
    }
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .withColumn("cell", explode(nearestCells(col("qe"))))
    val cos = udf { (a: Seq[Float], b: Seq[Float]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na) / math.sqrt(nb)
    }
    val scored = q.join(index.cells, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        cos(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cos"))
  }
}
