package graft.operators

import graft.SparkSpec

/** q188 hybrid RRF: the emitted rows are the two pool ranks, so the
  * semantic proof — that the fusion actually is reciprocal-rank fusion
  * of the BM25 and cosine rankings — is a driver-side brute-force
  * recomputation of both pools and the fused ordering from the raw
  * fixture.
  */
class HybridRrfSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val rows = Similarity.q188HybridRrf(spark, dir).collect()

  private lazy val bm25Ranks: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split(" ").toSeq).toMap
    val terms = TextAnalysis.Bm25QueryTerms
    val nDocs = docs.size.toDouble
    val avgdl = docs.values.map(_.size.toLong).sum.toDouble / nDocs
    val df = terms.map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    def score(toks: Seq[String]): Double = terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
        (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.size / avgdl))
    }.sum
    docs.toSeq.filter { case (_, toks) => terms.exists(toks.contains) }
      .map { case (id, toks) => (id, BigDecimal(score(toks))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }
      .take(Similarity.RrfPoolN).map(_._1)
  }

  private lazy val denseRanks: Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collectAsList().asScala
      .map { r =>
        // HALF_UP like Spark's round(), not math.round (which sends
        // -0.5 toward +inf — the settled q100 divergence)
        r.getLong(0) -> r.getSeq[Float](1)
          .map(x => BigDecimal(x.toDouble * 1000000.0)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
      }.toMap
    val q = vecs(0L)
    def nrm(v: Array[Long]): Double =
      math.sqrt(v.map(x => x * x).sum.toDouble)
    val qn = nrm(q)
    vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        val cos = v.zip(q).map { case (a, b) => a * b }.sum.toDouble / qn / nrm(v)
        (id, BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }
      .take(Similarity.RrfPoolN).map(_._1)
  }

  test("fused order is brute-force RRF of the two pools") {
    val rb = bm25Ranks.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val rd = denseRanks.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val expected = (rb.keySet ++ rd.keySet).toSeq
      .map { id =>
        val s = rb.get(id).map(r => 1.0 / (Similarity.RrfK + r)).getOrElse(0.0) +
          rd.get(id).map(r => 1.0 / (Similarity.RrfK + r)).getOrElse(0.0)
        (id, s)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(Similarity.RrfTopK).map(_._1)
    assert(rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      == expected, "RRF fusion diverged from brute force")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(Option(r.getAs[Integer]("r_bm25")).map(_.toInt) == rb.get(id))
      assert(Option(r.getAs[Integer]("r_dense")).map(_.toInt) == rd.get(id))
    }
  }

  test("plan: pools and fusion rank without any window") {
    val plan = Similarity.q188HybridRrf(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "q188 must not rank via a window")
  }
}
