package graft.queries

import graft.SparkSpec

/** q213: the recall@k curve must be internally consistent (monotone
  * counters, constant query set) and must agree with q191 — both grade
  * the same q49 probe geometry, so the k=3 point of the curve IS
  * q191's aggregate.
  */
class RecallCurveSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val rows = OperatorQueries.q213RecallAtK(spark, dir)
    .collect().sortBy(_.getAs[Int]("k"))

  test("counters are monotone in k over a constant query set") {
    assert(rows.map(_.getAs[Int]("k")).toSeq == OperatorQueries.RecallKs)
    val nq = rows.map(_.getAs[Long]("n_queries")).distinct
    assert(nq.length == 1 && nq.head > 0,
      "every k grades the same query set")
    val rel = rows.map(_.getAs[Long]("rel_found"))
    val hit = rows.map(_.getAs[Long]("n_hit"))
    assert(rel.zip(rel.tail).forall { case (a, b) => a <= b },
      s"rel_found must not shrink as k grows: ${rel.toSeq}")
    assert(hit.zip(hit.tail).forall { case (a, b) => a <= b },
      s"n_hit must not shrink as k grows: ${hit.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_queries"))
      assert(r.getAs[Long]("rel_found") <=
        r.getAs[Int]("k").toLong * r.getAs[Long]("n_queries"))
    }
  }

  test("the k=3 point equals q191's aggregate over the same probe") {
    val q191 = OperatorQueries.q191RetrievalEval(spark, dir).collect()
    val k3 = rows.find(_.getAs[Int]("k") == 3).get
    assert(k3.getAs[Long]("rel_found") ==
      q191.map(_.getAs[Long]("n_rel")).sum)
    assert(k3.getAs[Long]("n_hit") ==
      q191.count(r => !r.isNullAt(r.fieldIndex("first_rel_rank"))).toLong)
  }
}
