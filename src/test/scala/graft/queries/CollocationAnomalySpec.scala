package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q175/q176 against full in-memory recomputations on sf0.001: the PMI
  * top-k list (values and order) and the integer 3σ anomaly set,
  * cross-checked against its floating-point z-score formulation.
  */
class CollocationAnomalySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("q175 reproduces a brute-force PMI ranking") {
    val texts = graft.sources.Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0).toLowerCase.trim)
    val bigrams = texts.flatMap { t =>
      val toks = t.split(" ", -1)
      toks.zip(toks.drop(1))
    }
    val cAb = bigrams.groupBy(identity).map { case (k, g) => k -> g.length }
    val cA = bigrams.groupBy(_._1).map { case (k, g) => k -> g.length }
    val cB = bigrams.groupBy(_._2).map { case (k, g) => k -> g.length }
    val n = bigrams.length.toDouble
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // ranking still runs on the rounded PMI; the emitted columns are
    // the exact integer counts it derives from (tie-proof contract)
    val expected = cAb.toSeq
      .filter(_._2 >= graft.operators.TextAnalysis.MinPairCount)
      .map { case ((a, b), ab) =>
        (a, b, ab.toLong, r6(math.log(n * ab / (cA(a).toDouble * cB(b)))))
      }
      .sortBy { case (a, b, _, p) => (-p, a, b) }
      .take(graft.operators.TextAnalysis.PmiTopK)
      .zipWithIndex
      .map { case ((a, b, ab, _), i) =>
        (i + 1, a, b, ab, cA(a).toLong, cB(b).toLong, bigrams.length.toLong) }
    val got = graft.operators.TextAnalysis.q175PmiCollocations(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == expected, s"\n got=${got.toSeq}\n exp=$expected")
  }

  test("q186 conserves rows when values go negative (structural zeroKey)") {
    // the opaque join key must be 0 for EVERY row — a negative value
    // used to produce a non-matching key and silently drop the row
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q186_neg").toString
    try {
      Seq.tabulate(100) { i =>
        (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          i.toLong % 7, s"t${i % 3}", i.toDouble - 50.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.parquet(s"$tmp/events.parquet")
      val out = StatsQueries.q186EquiDepthBuckets(spark, tmp).collect()
      assert(out.map(_.getLong(2)).sum == 100L, "negative values were dropped")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q186 buckets are equi-depth within tie tolerance and cover every row") {
    val vals = graft.sources.Tables.events(spark, dir)
      .select("value").collect().map(_.getDouble(0))
    val out = StatsQueries.q186EquiDepthBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._3).sum == vals.length.toLong, "rows lost in binning")
    assert(out.forall(r => r._2 >= 1 && r._2 <= 4))
    // global bucket masses ~25% each (ties can skew only by the tied mass)
    val byBucket = out.groupBy(_._2).map { case (b, g) => b -> g.map(_._3).sum }
    byBucket.foreach { case (b, n) =>
      assert(math.abs(n.toDouble / vals.length - 0.25) < 0.05,
        s"bucket $b holds ${n.toDouble / vals.length} of the mass")
    }
    // thresholds really are the interpolated quartiles
    val sorted = vals.sorted
    def q(p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val lo = sorted(idx.toInt)
      lo + (idx - idx.toInt) * (sorted(math.ceil(idx).toInt) - lo)
    }
    val expB1 = vals.count(_ <= q(0.25)).toLong
    assert(byBucket(1) == expB1, s"bucket 1: ${byBucket(1)} vs $expB1")
  }

  test("q176's integer 3-sigma test agrees with the floating-point z-score form") {
    val hours = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(ts AS LONG) div 3600").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, h), g) => (t, h, g.length.toLong) }
      .toSeq
    val expected = hours.groupBy(_._1).flatMap { case (t, g) =>
      val cs = g.map(_._3.toDouble)
      val mu = cs.sum / cs.length
      val sigma = math.sqrt(cs.map(c => (c - mu) * (c - mu)).sum / cs.length)
      g.filter { case (_, _, c) => math.abs(c - mu) > 3 * sigma }
        .map { case (_, h, c) => (t, h * 3600, c) }
    }.toSet
    val got = EventsQueries.q176RateAnomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"\n got=$got\n exp=$expected")
  }
}
