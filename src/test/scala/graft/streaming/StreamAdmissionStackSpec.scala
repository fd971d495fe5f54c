package graft.streaming

import graft.SparkSpec

/** q194's streaming admission stack against a full in-memory
  * recomputation of all three gates — quality/scrub/mixture, then the
  * k-anonymity cohort probe, then the DSIR fold over the SCRUBBED
  * text — plus stage-selectivity (each gate must drop rows on the
  * fixture, or the chain is vacuously testing pass-through) and
  * statelessness (the full stack registers no state operator).
  */
class StreamAdmissionStackSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** Spark `trim` removes only ' ' (not all Java whitespace). */
  private def trimSpaces(s: String): String =
    s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** The whole stack, brute-forced row by row off the collected
    * fixture. Returns (admitted set, per-stage survivor counts).
    */
  private def bruteStack(rows: Array[(Long, String, String, String, Long)])
      : (Set[(Long, String, String, Long)], Seq[Int]) = {
    import graft.operators.Curation.{AnonK, EmailRe, IdRe, QualityMin}
    // stage 1a — composite quality on the RAW text
    val punctSet = Set('.', ',', ';', ':', '!', '?')
    val afterQuality = rows.filter { case (_, text, _, _, nChars) =>
      val toks = text.split(" ", -1)
      val nToks = toks.length.toDouble
      val nUniq = toks.distinct.length.toDouble
      val punct = text.count(punctSet.contains).toDouble
      // Spark's round() yields a DOUBLE compared against the 0.55
      // double literal — mirror that exactly (a BigDecimal compare
      // would flip docs landing exactly on the threshold, because
      // BigDecimal(0.55) is the binary expansion 0.55000…044…)
      val score = r6(0.4 * math.min(1.0, nToks / 100.0)
        + 0.4 * (nUniq / nToks)
        + 0.2 * (1.0 - punct / nChars)).toDouble
      score >= QualityMin
    }
    // stage 1b — PII scrub, then 1c — deterministic mixture gate on the
    // scrubbed text
    val scrubbed = afterQuality.map { case (id, text, lang, source, nChars) =>
      (id, text.replaceAll(EmailRe, "<EMAIL>").replaceAll(IdRe, "<ID>"),
        lang, source, nChars)
    }
    val afterMixture = scrubbed.filter { case (id, text, _, source, _) =>
      val thr = source match {
        case "src0" => "8000"; case "src1" => "4000"; case _ => "2000"
      }
      md5hex(s"$id:$text").substring(0, 4) < thr
    }
    // stage 2 — k-anonymity cohorts from the RAW reference corpus
    val cohorts = rows.groupBy { case (_, _, lang, source, nChars) =>
      (lang, source, nChars / 100)
    }.collect { case (k, g) if g.length >= AnonK => k }.toSet
    val afterAnon = afterMixture.filter { case (_, _, lang, source, nChars) =>
      cohorts((lang, source, nChars / 100))
    }
    // stage 3 — DSIR fold over the SCRUBBED text, model from the RAW
    // corpus (scrub placeholders are OOV and take the add-1 term)
    val rawToks = rows.flatMap { case (_, text, _, _, _) =>
      trimSpaces(text.toLowerCase).split(" ", -1)
    }
    val cr = rawToks.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val ct = rows.filter(_._3 == graft.operators.TextAnalysis.DsirTargetLang)
      .flatMap { case (_, text, _, _, _) =>
        trimSpaces(text.toLowerCase).split(" ", -1)
      }.groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val nR = cr.values.sum.toDouble
    // NOT cr.keys.map(ct.getOrElse(_, 0L)).sum — keys is a Set, so
    // mapping it deduplicates equal counts before the sum
    val nT = ct.values.sum.toDouble
    val vsz = cr.size.toDouble
    val admitted = afterAnon.flatMap { case (id, text, lang, source, _) =>
      val toks = trimSpaces(text.toLowerCase).split(" ", -1)
      val w6 = toks.map { t =>
        r6(math.log(ct.getOrElse(t, 0L) + 1.0) - math.log(nT + vsz)
          - math.log(cr.getOrElse(t, 0L) + 1.0) + math.log(nR + vsz))
      }.sum
      if (w6 >= 0) Some((id, lang, source, toks.length.toLong)) else None
    }
    (admitted.toSet,
      Seq(rows.length, afterQuality.length, afterMixture.length,
        afterAnon.length, admitted.length))
  }

  test("stream admission stack equals the brute-force three-gate recompute") {
    val rows = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val (expected, stageCounts) = bruteStack(rows)
    // the row-local, mixture and cohort gates must each bite on the
    // fixture — a pass-through stage would make the parity below
    // vacuous for it. The DSIR stage sees only the handful of cohort
    // survivors here (3 at sf0.001), so its selectivity is pinned
    // corpus-wide by StreamDsirGateSpec instead of per-stage here.
    assert(stageCounts.take(4).sliding(2).forall(w => w(1) < w.head),
      s"some gate dropped nothing: survivors per stage = $stageCounts")
    assert(expected.nonEmpty, "the full stack admitted nothing — fixture too strict")
    val got = StreamingQueries.q194StreamAdmissionStack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("the admission stack is stateless end to end") {
    val ss = EventsStreaming.streamSession(spark)
    import org.apache.spark.sql.functions._
    // the stack's stream shape minus the row-local fold: the row-local
    // gates plus BOTH stream-static joins (cohort probe + model row) —
    // stream-static inner joins must register no state operator
    val cohorts = graft.sources.Tables.documents(ss, dir)
      .select(col("lang"), col("source"), expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("cohort_n"))
      .filter(col("cohort_n") >= graft.operators.Curation.AnonK)
      .drop("cohort_n")
    val model = graft.sources.Tables.documents(ss, dir)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_docs")))
    val q = StreamingQueries.readDocumentsStream(ss, dir)
      .filter(graft.operators.Curation.qualityScoreCol >= graft.operators.Curation.QualityMin)
      .withColumn("len_bucket", expr("n_chars div 100"))
      .join(broadcast(cohorts), Seq("lang", "source", "len_bucket"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_chars")))
      .join(model, Seq("_k"))
      .select(col("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("q194_stateless_probe").start()
    q.processAllAvailable()
    val stateOps = Option(q.lastProgress).map(_.stateOperators)
      .getOrElse(Array.empty)
    q.stop()
    assert(stateOps.isEmpty,
      s"admission stack grew streaming state: ${stateOps.map(_.operatorName).mkString(",")}")
  }
}
