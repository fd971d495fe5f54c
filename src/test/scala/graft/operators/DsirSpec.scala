package graft.operators

import graft.SparkSpec

/** q189 DSIR-style contrastive importance weights: emitted rows are
  * integer-exact model aggregates, so the semantic proof — that the
  * selection really ranks by the two-LM log-ratio — is a driver-side
  * brute-force recomputation with the same per-token round → exact
  * decimal accumulation contract.
  */
class DsirSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private lazy val rows = TextAnalysis.q189DsirWeights(spark, dir).collect()

  private lazy val docs: Map[Long, (String, Seq[String])] = {
    import scala.jdk.CollectionConverters._
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collectAsList().asScala
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2).trim.toLowerCase.split(" ").toSeq))
      .toMap
  }

  test("selection is the brute-force two-LM importance ranking") {
    val all = docs.toSeq.flatMap { case (id, (lang, toks)) =>
      toks.map(t => (id, lang, t))
    }
    val cr = all.groupBy(_._3).map { case (t, xs) => t -> xs.size.toLong }
    val ct = all.filter(_._2 == TextAnalysis.DsirTargetLang)
      .groupBy(_._3).map { case (t, xs) => t -> xs.size.toLong }
    val nR = cr.values.sum
    val nT = ct.values.sum
    val v = cr.size.toLong
    def term(tok: String): BigDecimal = BigDecimal(
      math.log(ct.getOrElse(tok, 0L) + 1.0) - math.log((nT + v).toDouble) -
        math.log(cr(tok) + 1.0) + math.log((nR + v).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val weights = docs.toSeq.map { case (id, (_, toks)) =>
      id -> toks.groupBy(identity)
        .map { case (t, xs) => term(t) * xs.size }.sum
    }
    val expected = weights.sortBy { case (id, w) => (-w.toDouble, id) }
      .take(TextAnalysis.DsirTopK).map(_._1)
    assert(rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("doc_id")).toSeq
      == expected, "importance ranking diverged from brute force")
    val crTot = cr // captured for count checks below
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, toks) = docs(id)
      assert(r.getAs[String]("lang") == lang)
      assert(r.getAs[Long]("n_toks") == toks.size.toLong)
      assert(r.getAs[Long]("sum_ct") ==
        toks.map(t => ct.getOrElse(t, 0L)).sum)
      assert(r.getAs[Long]("sum_cr") == toks.map(crTot).sum)
      assert(r.getAs[Long]("n_t") == nT)
      assert(r.getAs[Long]("n_r") == nR)
      assert(r.getAs[Long]("vsz") == v)
    }
  }

  test("selected documents skew toward the target language") {
    val enShare = rows.count(_.getAs[String]("lang") ==
      TextAnalysis.DsirTargetLang).toDouble / rows.length
    val baseShare = docs.values.count(_._1 ==
      TextAnalysis.DsirTargetLang).toDouble / docs.size
    assert(enShare > baseShare,
      f"top-k en share $enShare%.2f should exceed base rate $baseShare%.2f")
  }

  test("plan: no rank window; one cached doc-token boundary") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = TextAnalysis.q189DsirWeights(spark, dir)
        .queryExecution.executedPlan
      assert(plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, "q189 must not rank via a window")
      val direct = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.metadata.get("Location").exists(_.contains("documents")) => f
      }
      assert(direct.isEmpty,
        s"documents scanned outside the doc-token cache boundary:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
