package graft.operators

import graft.SparkSpec

/** q76's distributed label propagation: converges to the true
  * connected components and frees superseded checkpoint generations.
  */
class DedupClustersSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q76 labels equal a driver-side transitive closure") {
    val pairs = Dedup.q32MinhashNeardup(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // tiny union-find over the collected fixture edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min member per component is the expected cluster id
    val members = parent.keys.toSeq.groupBy(find)
      .flatMap { case (_, ms) => val m = ms.min; ms.map(_ -> m) }

    val got = Dedup.q76DedupClusters(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    got.foreach { case (doc, cluster) =>
      assert(cluster == members.getOrElse(doc, doc),
        s"doc $doc labelled $cluster, closure says ${members.getOrElse(doc, doc)}")
    }
  }

  test("superseded label generations do not pile up on executors") {
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(Dedup.q76DedupClusters(spark, dir).count() > 0)
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the FINAL generation (plus nothing else from the loop) may
    // remain — a leak would leave one RDD per iteration
    assert(after - before <= 2,
      s"persistent RDDs grew by ${after - before}; generations are leaking")
  }
}
