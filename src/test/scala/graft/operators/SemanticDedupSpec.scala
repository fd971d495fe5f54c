package graft.operators

import graft.SparkSpec

/** q190 SemDeDup-style semantic dedup: driver-side brute-force
  * recomputation of the whole chain — seed-codebook assignment, exact
  * integer distances, centroid cosines, within-cell duplicate pairs,
  * keep-the-outlier rule — must reproduce every emitted row.
  */
class SemanticDedupSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val rows = Similarity.q190SemanticDedup(spark, dir).collect()

  private lazy val vecs: Map[Long, Array[Long]] = {
    import scala.jdk.CollectionConverters._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collectAsList().asScala
      .map { r =>
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => BigDecimal(x.toDouble * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      }.toMap
  }

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kept set matches the brute-force SemDeDup recipe") {
    val n = vecs.size.toLong
    val m = math.max(1L, (n + 7) / 8)
    val seeds = vecs.keys.filter(_ % m == 0).toSeq.sorted.zipWithIndex
      .map { case (id, cell) => cell -> vecs(id) }.toMap
    def nrm(v: Array[Long]): Long = dot(v, v)
    val cellOf = vecs.map { case (id, v) =>
      id -> seeds.toSeq.map { case (c, s) =>
        (nrm(v) + nrm(s) - 2 * dot(v, s), c)
      }.min._2
    }
    val ccOf = vecs.map { case (id, v) =>
      val s = seeds(cellOf(id))
      id -> round6(dot(v, s).toDouble / math.sqrt(nrm(v).toDouble) /
        math.sqrt(nrm(s).toDouble))
    }
    val byCell = vecs.keys.groupBy(cellOf)
    val dropped = byCell.values.flatMap { ids =>
      val sorted = ids.toSeq.sorted
      for {
        i <- sorted; j <- sorted if i < j
        cos = round6(dot(vecs(i), vecs(j)).toDouble /
          math.sqrt(nrm(vecs(i)).toDouble) / math.sqrt(nrm(vecs(j)).toDouble))
        if cos >= Similarity.SemTau
      } yield if (ccOf(i) > ccOf(j)) i
        else if (ccOf(i) < ccOf(j)) j
        else math.max(i, j)
    }.toSet
    assert(dropped.nonEmpty, "fixture should contain semantic near-dups")
    assert(rows.length == vecs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Boolean]("kept") == !dropped(id), s"kept flag of $id")
      assert(r.getAs[Double]("cos_centroid") == ccOf(id), s"cc of $id")
      assert(r.getAs[Long]("n_cell") ==
        byCell(cellOf(id)).size.toLong, s"n_cell of $id")
    }
  }

  test("plan: no window; embeddings read through the cached cell boundary") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Similarity.q190SemanticDedup(spark, dir)
        .queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "q190 must not use a window")
      val direct = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("embeddings")) => f
      }
      assert(direct.isEmpty,
        s"embeddings scanned outside the cached cell boundary:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
