package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q184's cluster invariants on the real sample: same-bucket media
  * always co-cluster, Hamming-1 buckets always co-cluster, and every
  * cluster_id is the minimum member of its component.
  */
class MediaClustersSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("same-bucket and Hamming-1 media co-cluster; labels are component minima") {
    val hashed = Multimodal.phashed(spark, dir)
      .filter(col("doc_id") % 3 === 0).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    val cluster = Multimodal.q184MediaClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cluster.keySet == hashed.map(_._1).toSet)
    // same ahash → same cluster
    hashed.groupBy(_._2).values.foreach { g =>
      assert(g.map(e => cluster(e._1)).distinct.length == 1,
        s"bucket split across clusters: $g")
    }
    // Hamming-1 buckets → same cluster
    val byHash = hashed.groupBy(_._2).map { case (h, g) => h -> g.head._1 }
    byHash.foreach { case (h, d) =>
      (0 until 16).foreach { k =>
        byHash.get(h ^ (1 << k)).foreach { d2 =>
          assert(cluster(d) == cluster(d2),
            s"Hamming-1 buckets $h and ${h ^ (1 << k)} not merged")
        }
      }
    }
    // label = min member
    cluster.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min, s"cluster $label not its min member")
    }
  }
}
