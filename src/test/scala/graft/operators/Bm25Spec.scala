package graft.operators

import graft.SparkSpec

/** q187 BM25 retrieval: the emitted rows are integer-exact model stats
  * (the q68/q158 hashing discipline), so the SEMANTIC proof — that the
  * rank order actually is BM25 — lives here: a driver-side brute-force
  * recomputation of Okapi BM25 (Lucene +1 idf, k1=1.2, b=0.75) from
  * the raw fixture must reproduce the query's ranking exactly, and the
  * emitted counts must match the corpus they came from.
  */
class Bm25Spec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val rows = TextAnalysis
    .q187Bm25Retrieval(spark, dir).collect()

  private lazy val docs: Map[Long, Seq[String]] = {
    import scala.jdk.CollectionConverters._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collectAsList().asScala
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split(" ").toSeq).toMap
  }

  test("emitted stats are the corpus's exact counts") {
    val terms = TextAnalysis.Bm25QueryTerms
    assert(rows.length == TextAnalysis.Bm25TopK)
    val nDocs = docs.size.toLong
    val sumDl = docs.values.map(_.size.toLong).sum
    val df = terms.map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id)
      assert(r.getAs[Long]("dl") == toks.size.toLong, s"dl of $id")
      assert(r.getAs[Long]("tf_hash") == toks.count(_ == "hash").toLong)
      assert(r.getAs[Long]("tf_join") == toks.count(_ == "join").toLong)
      assert(r.getAs[Long]("tf_stream") == toks.count(_ == "stream").toLong)
      assert(r.getAs[Long]("df_hash") == df("hash"))
      assert(r.getAs[Long]("df_join") == df("join"))
      assert(r.getAs[Long]("df_stream") == df("stream"))
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("sum_dl") == sumDl)
    }
  }

  test("ranking is brute-force BM25 (Lucene idf, k1=1.2, b=0.75)") {
    val terms = TextAnalysis.Bm25QueryTerms
    val nDocs = docs.size.toDouble
    val sumDl = docs.values.map(_.size.toLong).sum.toDouble
    val df = terms.map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    // independent formulation: avgdl-form denominator
    // k1*(1 - b + b*dl/avgdl) instead of the query's expanded
    // 0.3 + 0.9*dl*N/S — algebraically identical, differently coded
    val avgdl = sumDl / nDocs
    def score(toks: Seq[String]): Double = terms.map { t =>
      val tf = toks.count(_ == t).toDouble
      val idf = math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.size / avgdl))
    }.sum
    val expected = docs.toSeq
      .filter { case (_, toks) => terms.exists(toks.contains) }
      .map { case (id, toks) =>
        (id, BigDecimal(score(toks))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(TextAnalysis.Bm25TopK).map(_._1)
    assert(rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      == expected, "BM25 brute-force ranking diverged")
  }

  test("plan: no rank window, top-k is the partial aggregate") {
    val plan = TextAnalysis.q187Bm25Retrieval(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), "q187 must not rank via a window")
    assert(plan.contains("topkbylong") || plan.contains("TopKByLong"),
      s"top-k must ride the TopKByLong aggregate:\n$plan")
  }

  test("plan: the corpus is tokenized once — consumers reuse the exchange") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.q187Bm25Retrieval(spark, dir)
        .queryExecution.executedPlan
      // every documents read must route through the PERSISTED perDoc
      // boundary (StageBoundary): zero direct scans of the corpus in
      // the executed tree — the one corpus tokenize+aggregate ran at
      // boundary-build time — and the multiple consumers show as
      // scans of the boundary parquet instead
      val direct = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("documents")) => f
      }
      assert(direct.isEmpty,
        s"documents scanned outside the perDoc boundary:\n$plan")
      val boundary = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("q187pd")) => f
      }
      assert(boundary.size >= 3,
        s"expected >=3 perDoc boundary consumers, found ${boundary.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
