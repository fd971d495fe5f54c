package graft.queries

import graft.SparkSpec

/** q191 retrieval eval: the counters must equal a driver-side
  * recomputation from the probe rows and the label table, and the
  * output must cover exactly the probe's query set.
  */
class RetrievalEvalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("quality counters match a direct recomputation") {
    import scala.jdk.CollectionConverters._
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collectAsList().asScala
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probe = OperatorQueries.q49IvfAnn(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
        r.getAs[Long]("cand_id")))
    val rows = OperatorQueries.q191RetrievalEval(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet ==
      probe.map(_._1).toSet, "one eval row per probed query")
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val mine = probe.filter(_._1 == q)
      val rel = mine.filter(t => labels(t._3) == labels(q))
      assert(r.getAs[Int]("qlabel") == labels(q))
      assert(r.getAs[Long]("n_rel") == rel.length.toLong, s"n_rel of $q")
      val frr = if (rel.isEmpty) null else Int.box(rel.map(_._2).min)
      assert(r.getAs[Integer]("first_rel_rank") == frr, s"frr of $q")
    }
  }
}
