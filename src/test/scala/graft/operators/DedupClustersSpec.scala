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

  test("a 30-hop chain converges to one component (frontier propagation)") {
    // a path graph is the worst case for label propagation: diameter =
    // n-1, so the min label must walk the whole chain hop by hop —
    // before MaxClusterIters was raised and guarded, a >20-hop chain
    // silently returned wrong labels
    import spark.implicits._
    val n = 31
    val docs = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L),
      s"chain did not fully converge: ${labels.filter(_._2 != 0L)}")
  }

  test("a >MaxClusterIters-diameter graph fails loud, not silently wrong") {
    import spark.implicits._
    val n = Dedup.MaxClusterIters + 10
    val docs = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(docs, pairs).collect()
    }
    assert(e.getMessage.contains("did not converge"))
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
