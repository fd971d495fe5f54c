package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`,
  * dim 64): brute-force cosine top-k as the baseline, a
  * random-hyperplane LSH-bucketed variant as the scale path, and a
  * cosine near-duplicate pair scan.
  *
  * Exactness strategy (oracle is hash-compared bit-for-bit): float
  * components are scaled to integers (round(x·10^6)), so dot products
  * and norms are EXACT integer sums — order-independent — and the final
  * cosine is one IEEE division chain both engines evaluate identically.
  *
  * Scale notes (100 TB): the brute-force form is quadratic and exists
  * as the correctness baseline; the LSH form buckets each vector once
  * (per-row codegen'd projections, no shuffle) and joins only within
  * buckets — the bucket key is the shuffle key, hot buckets get salted,
  * and k stays per-bucket-local. An IVF variant would replace the
  * random planes with k-means centroids; same join shape.
  */
object Similarity {

  /** round(x·10^6) as BIGINT — exact in both engines. */
  private def scaled: Column =
    transform(col("embedding"), x => round(x.cast("double") * 1000000).cast("bigint"))

  /** Exact integer dot product of two scaled vectors — a native
    * codegen'd Expression (one fused multiply-add loop) rather than
    * `aggregate(zip_with(...))`, which materializes an intermediate
    * array and evaluates a lambda per element. Same exact semantics.
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProductLong.dot_product_long(a, b)

  private def cosine(dotCol: Column, na: Column, nb: Column): Column =
    round(dotCol.cast("double") / sqrt(na.cast("double")) / sqrt(nb.cast("double")), 6)

  private def withScaledNorm(df: DataFrame): DataFrame =
    df.withColumn("sv", scaled).withColumn("nrm", dot(col("sv"), col("sv")))

  private val SqlScaled =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  private val SqlBase =
    s"""SELECT vec_id, label, $SqlScaled AS sv,
       |    CAST(list_sum(list_transform(generate_series(1, len(embedding)),
       |      i -> ($SqlScaled)[i] * ($SqlScaled)[i])) AS BIGINT) AS nrm
       |  FROM embeddings""".stripMargin
  private val SqlDot =
    "CAST(list_sum(list_transform(generate_series(1, len(a.sv)), i -> a.sv[i] * b.sv[i])) AS BIGINT)"
  private def sqlCos(dot: String): String =
    s"round(CAST($dot AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE)) / sqrt(CAST(b.nrm AS DOUBLE)), 6)"

  // --------------------------------------------------------------------
  // q34 — brute-force cosine top-k: every 25th vector queries the full
  // table, k=5, ties broken by candidate id.
  // BASELINE-ONLY CONTRACT: the `query_id =!= vec_id` non-equi join is
  // a BroadcastNestedLoopJoin — the exact-recall correctness baseline
  // at fixture scale. The declared scale paths are q35 (hyperplane LSH)
  // and q49 (IVF); PlanRegressionSpec locks the nested-loop count to
  // exactly q34/q36.
  def q34CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val all = withScaledNorm(Tables.embeddingsSharded(spark, dir))
    val q = all.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("sv").as("qsv"), col("nrm").as("qnrm"))
    val scored = q.join(all, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        cosine(dot(col("qsv"), col("sv")), col("qnrm"), col("nrm")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q34Oracle: String =
    s"""WITH base AS (
       |  $SqlBase),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |    ${sqlCos(SqlDot)} AS cos
       |  FROM base a JOIN base b ON a.vec_id % 25 = 0 AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, cand_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rk
       |  FROM scored)
       |SELECT query_id, rk, cand_id, cos FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin

  // --------------------------------------------------------------------
  // q35 — LSH-bucketed ANN: 8 deterministic ±1 hyperplanes (seeded from
  // md5, materialized as literal arrays in BOTH engines), sign bits →
  // 8-bit bucket; candidates share the query's bucket; top-3 by exact
  // cosine within the bucket.
  val Dim = 64
  val NumPlanes = 8

  /** ±1 hyperplane matrix, deterministic from md5("p:i"). */
  private def mkPlanes(n: Int): Array[Array[Int]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n, Dim) { (p, i) =>
      val h = digest.digest(s"$p:$i".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1 else -1
    }
  }

  lazy val planes: Array[Array[Int]] = mkPlanes(NumPlanes)

  private def bucketCol: Column =
    (0 until NumPlanes).map { p =>
      val lits = array(planes(p).map(v => lit(v.toLong)): _*)
      val proj = graft.functions.DotProductLong.dot_product_long(col("sv"), lits)
      when(proj >= 0, lit(1 << p)).otherwise(0)
    }.reduce(_ + _).cast("int")

  def q35LshAnn(spark: SparkSession, dir: String): DataFrame = {
    val all = withScaledNorm(Tables.embeddingsSharded(spark, dir)).withColumn("bucket", bucketCol)
    val q = all.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("sv").as("qsv"),
        col("nrm").as("qnrm"), col("bucket").as("qbucket"))
    val scored = q.join(all,
      col("qbucket") === col("bucket") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("qbucket").as("bucket"), col("vec_id").as("cand_id"),
        cosine(dot(col("qsv"), col("sv")), col("qnrm"), col("nrm")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("cand_id"), col("bucket"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  /** The q35 bucket assignment as DuckDB SQL — shared by every oracle
    * that replays the hyperplane LSH (q35, q77).
    */
  private lazy val sqlBucketTerms: String =
    (0 until NumPlanes).map { p =>
      val litList = planes(p).mkString("[", ", ", "]")
      s"""CASE WHEN CAST(list_sum(list_transform(generate_series(1, len(sv)),
         |      i -> sv[i] * ($litList)[i])) AS BIGINT) >= 0 THEN ${1 << p} ELSE 0 END""".stripMargin
    }.mkString("\n    + ")

  val q35Oracle: String = {
    s"""WITH base AS (
       |  $SqlBase),
       |bucketed AS (
       |  SELECT vec_id, sv, nrm,
       |    CAST($sqlBucketTerms AS INTEGER) AS bucket
       |  FROM base),
       |scored AS (
       |  SELECT a.vec_id AS query_id, a.bucket AS bucket, b.vec_id AS cand_id,
       |    ${sqlCos(SqlDot)} AS cos
       |  FROM bucketed a JOIN bucketed b
       |    ON a.vec_id % 25 = 0 AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |ranked AS (
       |  SELECT query_id, bucket, cand_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INTEGER) AS rk
       |  FROM scored)
       |SELECT query_id, rk, cand_id, bucket, cos FROM ranked WHERE rk <= 3
       |ORDER BY query_id, rk""".stripMargin
  }

  // --------------------------------------------------------------------
  // q87 — int8-QUANTIZED coarse scan + exact rerank: the memory-bound
  // form of ANN at 100 TB. Vectors are scalar-quantized per row to
  // int8 (q_j = round(127·sv_j / max|sv|); cosine is scale-invariant,
  // so the per-vector scale cancels and never needs storing), the
  // bucket scan scores candidates on the 4×-smaller quantized payload,
  // and only the coarse top-10 per query re-fetches the full-precision
  // vectors BY ID for an exact rerank to top-3. Plan shape: bucket
  // equi-join (q35's), two per-query windows, two id equi-joins for the
  // re-fetch — no nested loop, nothing broadcast by hint.
  // Scale notes (100 TB): the coarse stage's working set is the int8
  // corpus (the production reason to quantize); the rerank re-reads
  // k·|queries| full vectors — ids are tiny against payloads, and the
  // storage re-fetch is exactly how a real two-stage ANN serves it.
  val QuantCoarseK = 10
  val QuantFinalK = 3

  /** Adds maxabs/qv/qnrm to a frame carrying `sv` — int8 quantization
    * with a zero-vector guard (all-zero sv quantizes to zeros, not
    * NaN). 127·sv_j stays well under 2^53, so the double division and
    * round are bit-identical in both engines.
    */
  private[operators] def withQuantized(df: DataFrame): DataFrame = df
    .withColumn("maxabs", array_max(transform(col("sv"), x => abs(x))))
    .withColumn("qv",
      when(col("maxabs") === 0, transform(col("sv"), _ => lit(0L)))
        .otherwise(transform(col("sv"),
          x => round(x.cast("double") * 127 / col("maxabs").cast("double")).cast("bigint"))))
    .withColumn("qnrm", dot(col("qv"), col("qv")))

  def q87QuantizedRerank(spark: SparkSession, dir: String): DataFrame = {
    val all = withQuantized(withScaledNorm(Tables.embeddingsSharded(spark, dir))
      .withColumn("bucket", bucketCol))
      .select(col("vec_id"), col("bucket"), col("qv"), col("qnrm"))
    val q = all.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"),
        col("qnrm").as("qqnrm"), col("bucket").as("qbucket"))
    val coarse = q.join(all,
      col("qbucket") === col("bucket") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        cosine(dot(col("qqv"), col("qv")), col("qqnrm"), col("qnrm")).as("qcos"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("qcos").desc, col("cand_id"))
    val top = coarse.withColumn("qrk", row_number().over(wq))
      .filter(col("qrk") <= QuantCoarseK)
      .select(col("query_id"), col("cand_id"), col("qcos"))
    // exact rerank over the survivors: re-fetch full-precision vectors
    // by id from the base table (NOT carried through the coarse scan —
    // that would re-inflate the int8 working set the stage exists to
    // shrink)
    val full = withScaledNorm(Tables.embeddingsSharded(spark, dir))
    val qf = full.select(col("vec_id").as("query_id"),
      col("sv").as("qsv"), col("nrm").as("qfnrm"))
    val cf = full.select(col("vec_id").as("cand_id"),
      col("sv").as("csv"), col("nrm").as("cfnrm"))
    val rer = top.join(qf, Seq("query_id")).join(cf, Seq("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qcos"),
        cosine(dot(col("qsv"), col("csv")), col("qfnrm"), col("cfnrm")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    rer.withColumn("rk", row_number().over(w)).filter(col("rk") <= QuantFinalK)
      .select(col("query_id"), col("rk"), col("cand_id"), col("qcos"), col("cos"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q87Oracle: String = {
    val qdot = "CAST(list_sum(list_transform(generate_series(1, len(a.qv)), " +
      "i -> a.qv[i] * b.qv[i])) AS BIGINT)"
    s"""WITH base AS (
       |  $SqlBase),
       |bucketed AS (
       |  SELECT vec_id, sv, nrm,
       |    CAST($sqlBucketTerms AS INTEGER) AS bucket
       |  FROM base),
       |quant AS (
       |  SELECT vec_id, bucket,
       |    CASE WHEN maxabs = 0 THEN list_transform(sv, x -> CAST(0 AS BIGINT))
       |      ELSE list_transform(sv,
       |        x -> CAST(round(CAST(127 * x AS DOUBLE) / maxabs) AS BIGINT)) END AS qv
       |  FROM (SELECT vec_id, bucket, sv,
       |          CAST(list_max(list_transform(sv, x -> abs(x))) AS DOUBLE) AS maxabs
       |        FROM bucketed)),
       |qn AS (
       |  SELECT vec_id, bucket, qv,
       |    CAST(list_sum(list_transform(generate_series(1, len(qv)),
       |      i -> qv[i] * qv[i])) AS BIGINT) AS qnrm
       |  FROM quant),
       |coarse AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |    round(CAST($qdot AS DOUBLE) / sqrt(CAST(a.qnrm AS DOUBLE))
       |      / sqrt(CAST(b.qnrm AS DOUBLE)), 6) AS qcos
       |  FROM qn a JOIN qn b
       |    ON a.vec_id % 25 = 0 AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |top AS (
       |  SELECT query_id, cand_id, qcos FROM (
       |    SELECT query_id, cand_id, qcos,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY qcos DESC, cand_id) AS qrk
       |    FROM coarse)
       |  WHERE qrk <= $QuantCoarseK),
       |rer AS (
       |  SELECT query_id, cand_id, qcos, ${sqlCos(SqlDot)} AS cos
       |  FROM top
       |  JOIN base a ON query_id = a.vec_id
       |  JOIN base b ON cand_id = b.vec_id)
       |SELECT query_id, rk, cand_id, qcos, cos FROM (
       |  SELECT query_id, cand_id, qcos, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, cand_id) AS INTEGER) AS rk
       |  FROM rer)
       |WHERE rk <= $QuantFinalK
       |ORDER BY query_id, rk""".stripMargin
  }

  // --------------------------------------------------------------------
  // q36 — embedding cosine near-duplicate pairs: every 10th vector vs
  // the table, cosine ≥ 0.4, with a same-label flag.
  // BASELINE-ONLY CONTRACT: the `vec_a < vec_id` non-equi join plans a
  // BroadcastNestedLoopJoin — O(n²/10) comparisons and a broadcast of
  // the full table. It exists as the exact-recall oracle reference at
  // fixture scale; the 100-TB path is q77 below, which pushes the same
  // pair semantics through banded hyperplane LSH buckets (equi-join,
  // no broadcast of the big side). PlanRegressionSpec pins q34/q36 as
  // the ONLY registered queries allowed to plan a nested-loop join.
  def q36EmbeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val all = withScaledNorm(Tables.embeddingsSharded(spark, dir))
    val a = all.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("vec_a"), col("sv").as("asv"),
        col("nrm").as("anrm"), col("label").as("label_a"))
    a.join(all, col("vec_a") < col("vec_id"))
      .select(col("vec_a"), col("vec_id").as("vec_b"),
        cosine(dot(col("asv"), col("sv")), col("anrm"), col("nrm")).as("cos"),
        (col("label_a") === col("label")).as("same_label"))
      .filter(col("cos") >= 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val q36Oracle: String =
    s"""WITH base AS (
       |  $SqlBase),
       |pairs AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${sqlCos(SqlDot)} AS cos,
       |    a.label = b.label AS same_label
       |  FROM base a JOIN base b ON a.vec_id % 10 = 0 AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cos, same_label FROM pairs
       |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  // --------------------------------------------------------------------
  // q77 — BUCKETED embedding near-dup pairs: q36's semantics pushed
  // through BANDED hyperplane LSH buckets — the declared scale path for
  // the pair report. Geometry: 8 bands × 2 planes. A pair is a
  // candidate when SOME band's sign pattern agrees (OR-amplification);
  // at the fixture's cos ≥ 0.4 gate (p = 1 − θ/π ≈ 0.63 per plane)
  // per-band collision is p² ≈ 0.40, so 8 bands give ≈ 98 % recall —
  // all 8 fixture pairs collide (verified). Band keys are per-row
  // codegen'd projections (no shuffle to assign); the pair scan is one
  // band-key EQUI-join; duplicate candidates (pairs colliding in
  // several bands) are eliminated shuffle-free by q32's
  // first-colliding-band rule; exact scaled-integer cosine then gates
  // at 0.4. Output schema = q36's.
  // Scale notes (100 TB): neither join side is broadcast (both scale
  // with the corpus — that broadcast is what kills q36 at 100×).
  // Bucket cardinality is bands × 2^rows; rows trades recall for
  // bucket granularity, so at production near-dup thresholds
  // (cos ≥ 0.9, p ≈ 0.86) you raise rows to 8–16 (256–65 k buckets per
  // band, recall per band 0.3–0.09 re-amplified across bands) — the
  // fixture's low 0.4 threshold is what forces rows = 2 here. Hot
  // buckets (skewed sign patterns) are the residual risk: salting
  // (Skew.scala) or AQE skew-join splits them — BandSkewSpec builds a
  // pathological one-pattern corpus and proves the AQE split fires and
  // shrinks the measured max per-task shuffle read.
  val PairBands = 8
  val PairRows = 2

  lazy val pairPlanes: Array[Array[Int]] = mkPlanes(PairBands * PairRows)

  /** Band keys: element b is band b's bucket id, offset so keys are
    * globally unique across bands (b·2^rows + sign bits).
    */
  private def bandKeysCol: Column = array((0 until PairBands).map { b =>
    ((0 until PairRows).map { j =>
      val lits = array(pairPlanes(b * PairRows + j).map(v => lit(v.toLong)): _*)
      val proj = graft.functions.DotProductLong.dot_product_long(col("sv"), lits)
      when(proj >= 0, lit(1 << j)).otherwise(0)
    }.reduce(_ + _) + lit(b * (1 << PairRows))).cast("int")
  }: _*)

  /** The banded pair scan shared by q77 (sampled a-side, pair report),
    * q79 (full graph, keep/discard decision), and q156 (k-NN graph,
    * thresholdless): emits (vec_a, vec_b, cos, same_label) for
    * bucket-colliding pairs with cos ≥ minCos, vec_a < vec_b, vec_a
    * restricted by `aFilter`.
    */
  private[operators] def bandedPairScan(spark: SparkSession, dir: String,
      aFilter: Option[Column], minCos: Double = 0.4): DataFrame =
    bandedPairScanOf(Tables.embeddingsSharded(spark, dir), aFilter, minCos)

  /** [[bandedPairScan]] over any (vec_id, label, embedding) frame —
    * lets SkewSpec drive the join with a pathological sign-pattern
    * cluster that the testdata doesn't exhibit.
    */
  private[operators] def bandedPairScanOf(raw: DataFrame,
      aFilter: Option[Column], minCos: Double = 0.4): DataFrame = {
    val all = withScaledNorm(raw)
      .withColumn("bkeys", bandKeysCol)
    // foldable explode + element_at, not explode(bkeys): the inferred
    // size(bkeys) > 0 filter would otherwise inline the 16-projection
    // pipeline below the exchange (q32's InferFiltersFromGenerate trap)
    def banded(df: DataFrame): DataFrame = df
      .withColumn("band", explode(sequence(lit(0), lit(PairBands - 1))))
      .withColumn("bkey", element_at(col("bkeys"), col("band") + 1))
    val a = banded(aFilter.fold(all)(all.filter))
      .select(col("vec_id").as("vec_a"), col("sv").as("asv"),
        col("nrm").as("anrm"), col("label").as("label_a"),
        col("bkeys").as("abkeys"), col("band").as("aband"), col("bkey").as("abkey"))
    val b = banded(all)
    val firstCollidingBand =
      array_position(zip_with(col("abkeys"), col("bkeys"), (x, y) => x === y), true) - 1
    a.join(b,
        col("abkey") === col("bkey") && col("vec_a") < col("vec_id") &&
          firstCollidingBand === col("aband"))
      .select(col("vec_a"), col("vec_id").as("vec_b"),
        cosine(dot(col("asv"), col("sv")), col("anrm"), col("nrm")).as("cos"),
        (col("label_a") === col("label")).as("same_label"))
      .filter(col("cos") >= minCos)
  }

  /** Diagnostic: the largest single band-bucket's share of one band's
    * rows. BandSkewSpec uses it to certify its fixture really
    * concentrates a band's rows under one key.
    */
  private[operators] def bandedTopBucketShare(raw: DataFrame): Double = {
    val all = withScaledNorm(raw).withColumn("bkeys", bandKeysCol)
    val top = all.select(explode(col("bkeys")).as("bkey"))
      .groupBy(col("bkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).cast("double").as("mx")).collect()(0).getDouble(0)
    top / raw.count()
  }

  def q77EmbeddingNeardupBucketed(spark: SparkSession, dir: String): DataFrame =
    bandedPairScan(spark, dir, Some(col("vec_id") % 10 === 0))
      .orderBy(col("vec_a"), col("vec_b"))

  /** Band-key SQL for band b — replays [[bandKeysCol]] exactly. */
  private def sqlBandKey(b: Int): String = {
    val terms = (0 until PairRows).map { j =>
      val litList = pairPlanes(b * PairRows + j).mkString("[", ", ", "]")
      s"""CASE WHEN CAST(list_sum(list_transform(generate_series(1, len(sv)),
         |      i -> sv[i] * ($litList)[i])) AS BIGINT) >= 0 THEN ${1 << j} ELSE 0 END""".stripMargin
    }.mkString("\n    + ")
    s"$terms + ${b * (1 << PairRows)}"
  }

  val q77Oracle: String = {
    val bandRows = (0 until PairBands).map { b =>
      s"SELECT vec_id, CAST(${sqlBandKey(b)} AS INTEGER) AS bkey FROM base"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH base AS (
       |  $SqlBase),
       |bands AS (
       |  $bandRows),
       |cands AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.bkey = y.bkey AND x.vec_id % 10 = 0 AND x.vec_id < y.vec_id),
       |pairs AS (
       |  SELECT vec_a, vec_b,
       |    ${sqlCos(SqlDot)} AS cos,
       |    a.label = b.label AS same_label
       |  FROM cands
       |  JOIN base a ON vec_a = a.vec_id
       |  JOIN base b ON vec_b = b.vec_id)
       |SELECT vec_a, vec_b, cos, same_label FROM pairs
       |WHERE cos >= 0.4 ORDER BY vec_a, vec_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q165 — JOHNSON-LINDENSTRAUSS sketch fidelity: the 16 ±1
  // hyperplanes that band the LSH buckets double as a dense random
  // projection (signs give buckets; the RAW projections are a 16-dim
  // JL sketch, 4× smaller than the 64-dim original). For every q77
  // sampled near-dup pair the query emits original-space and
  // sketch-space cosine side by side — the fidelity report that
  // decides whether downstream stages (clustering, rerank prefilter)
  // can run on the sketch. All projections are exact integer dots of
  // the scaled vectors; only the final cosine chain is double, written
  // with the same shape in both engines, so the report itself is
  // hash-exact even though the sketch is lossy.
  // Scale notes (100 TB): projections are per-row codegen (16 dot
  // products in one pass, no shuffle to assign); the pair set is q77's
  // band equi-join; the two sketch joins co-locate on the pair ids.
  // Production tunes sketch width like PairRows — more planes, tighter
  // JL error (~1/√k).
  def q165JlSketch(spark: SparkSession, dir: String): DataFrame = {
    val dot = graft.functions.DotProductLong.dot_product_long _
    val pairs = bandedPairScan(spark, dir, Some(col("vec_id") % 10 === 0))
      .select(col("vec_a"), col("vec_b"), col("cos").as("cos_orig"))
    val sketch = withScaledNorm(Tables.embeddingsSharded(spark, dir))
      .withColumn("pr", array((0 until PairBands * PairRows).map { k =>
        dot(col("sv"), array(pairPlanes(k).map(v => lit(v.toLong)): _*))
      }: _*))
      .select(col("vec_id"), col("pr"), dot(col("pr"), col("pr")).as("pn"))
    pairs
      .join(sketch.select(col("vec_id").as("vec_a"), col("pr").as("pa"),
        col("pn").as("na")), Seq("vec_a"))
      .join(sketch.select(col("vec_id").as("vec_b"), col("pr").as("pb"),
        col("pn").as("nb")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"), col("cos_orig"),
        round(dot(col("pa"), col("pb")).cast("double") /
          sqrt(col("na").cast("double")) / sqrt(col("nb").cast("double")), 6)
          .as("cos_sketch"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val q165Oracle: String = {
    val bandRows = (0 until PairBands).map { b =>
      s"SELECT vec_id, CAST(${sqlBandKey(b)} AS INTEGER) AS bkey FROM base"
    }.mkString("\n  UNION ALL\n  ")
    val projExprs = (0 until PairBands * PairRows).map { k =>
      val litList = pairPlanes(k).mkString("[", ", ", "]")
      s"""CAST(list_sum(list_transform(generate_series(1, len(sv)),
         |      i -> sv[i] * ($litList)[i])) AS BIGINT)""".stripMargin
    }.mkString(",\n    ")
    s"""WITH base AS (
       |  $SqlBase),
       |bands AS (
       |  $bandRows),
       |cands AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.bkey = y.bkey AND x.vec_id % 10 = 0 AND x.vec_id < y.vec_id),
       |proj AS (
       |  SELECT vec_id, [$projExprs] AS pr FROM base),
       |pp AS (
       |  SELECT vec_id, pr,
       |    CAST(list_sum(list_transform(generate_series(1, ${PairBands * PairRows}),
       |      i -> pr[i] * pr[i])) AS BIGINT) AS pn
       |  FROM proj),
       |pairs AS (
       |  SELECT vec_a, vec_b, ${sqlCos(SqlDot)} AS cos_orig
       |  FROM cands
       |  JOIN base a ON vec_a = a.vec_id
       |  JOIN base b ON vec_b = b.vec_id)
       |SELECT vec_a, vec_b, cos_orig,
       |  round(CAST(list_sum(list_transform(generate_series(1, ${PairBands * PairRows}),
       |      i -> pa.pr[i] * pb.pr[i])) AS DOUBLE)
       |    / sqrt(CAST(pa.pn AS DOUBLE)) / sqrt(CAST(pb.pn AS DOUBLE)), 6)
       |    AS cos_sketch
       |FROM pairs
       |JOIN pp pa ON vec_a = pa.vec_id
       |JOIN pp pb ON vec_b = pb.vec_id
       |WHERE cos_orig >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  // --------------------------------------------------------------------
  // q79 — the semantic-dedup DECISION the pair scan exists for: greedy
  // keep/discard over the FULL banded pair graph (no query sample —
  // every vector is a candidate on both sides). A vector is discarded
  // iff it has a bucket-colliding near-dup (cos ≥ 0.4) with a smaller
  // vec_id; kept vectors survive via left-anti join — the embedding
  // analogue of q56's minhash keepers. Scale notes: same equi-join
  // shape as q77 (nothing broadcast, nothing nested-loop); the discard
  // set scales with the corpus, so the anti join stays shuffled and
  // AQE may downgrade it to broadcast when small.
  def q79EmbeddingKeepers(spark: SparkSession, dir: String): DataFrame = {
    val discards = bandedPairScan(spark, dir, None)
      .select(col("vec_b").as("vec_id")).distinct()
    Tables.embeddingsSharded(spark, dir)
      .select(col("vec_id"), col("label"))
      .join(discards, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  /** base + bands + distinct colliding-candidate CTEs — the SQL twin
    * of the banded bucket structure, shared by the q79/q83 discard
    * chain and q156's k-NN graph so the bucket geometry is written
    * once on the oracle side.
    */
  private lazy val sqlBandedCandCtes: String = {
    val bandRows = (0 until PairBands).map { b =>
      s"SELECT vec_id, CAST(${sqlBandKey(b)} AS INTEGER) AS bkey FROM base"
    }.mkString("\n  UNION ALL\n  ")
    s"""base AS (
       |  $SqlBase),
       |bands AS (
       |  $bandRows),
       |cands AS (
       |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM bands x JOIN bands y
       |    ON x.bkey = y.bkey AND x.vec_id < y.vec_id)""".stripMargin
  }

  /** The banded discard-set CTE chain (base → bands → cands →
    * discards) — the SQL twin of `bandedPairScan(_, _, None)` reduced
    * to distinct vec_b, shared by q79 and q83 so the two oracles
    * cannot drift.
    */
  private lazy val sqlBandedDiscardCtes: String =
    s"""$sqlBandedCandCtes,
       |discards AS (
       |  SELECT DISTINCT vec_b
       |  FROM cands
       |  JOIN base a ON vec_a = a.vec_id
       |  JOIN base b ON vec_b = b.vec_id
       |  WHERE ${sqlCos(SqlDot)} >= 0.4)""".stripMargin

  val q79Oracle: String =
    s"""WITH $sqlBandedDiscardCtes
       |SELECT vec_id, label FROM embeddings
       |WHERE vec_id NOT IN (SELECT vec_b FROM discards)
       |ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------------
  // q156 — k-NN GRAPH construction from the banded candidates: every
  // vector's top-K neighbors by exact cosine among its bucket-colliding
  // candidates, both directions (the pair scan emits each unordered
  // pair once; the graph symmetrizes it). This is the approximate-kNN
  // graph an embedding pipeline builds before clustering / diversity
  // sampling / graph-based ANN serving — and the banded candidate set
  // is what makes it buildable at all: top-K over ALL pairs is the
  // q34-class nested loop.
  // Scale notes (100 TB): candidates come from the same band equi-join
  // as q77 (neither side broadcast, first-colliding-band dedup, AQE
  // skew-split on hot buckets); the top-K is a per-vector window over
  // each vector's OWN candidate list — partition size is bounded by
  // bucket geometry (rows per band trades recall for bucket size), so
  // the window never sees corpus-sized partitions. Recall follows the
  // same OR-amplification math as q77; raise PairRows at production
  // thresholds for tighter buckets.
  val KnnK = 3

  /** The UNSORTED kNN graph — q156's body without the presentation
    * sort, so q210's hubness aggregate composes without inheriting a
    * sort it immediately destroys. PERSISTED as a stage boundary (the
    * q82 rule): the graph is a dataset-determined artifact consumed by
    * q156 and q210 (and, in a production pipeline, every clustering /
    * diversity-sampling stage downstream), so the band join + top-K
    * window run once per DATASET, not once per consumer per session —
    * exactly how an embedding pipeline ships its kNN graph (built at
    * index time, read at serving/analysis time).
    */
  private def knnGraph(spark: SparkSession, dir: String): DataFrame =
    graft.sources.StageBoundary(spark, "q156knn", dir) {
      import org.apache.spark.sql.expressions.Window
      val pairs = bandedPairScan(spark, dir, None, minCos = -1.0)
        .select(col("vec_a"), col("vec_b"), col("cos"))
      val sym = pairs.unionByName(pairs.select(col("vec_b").as("vec_a"),
        col("vec_a").as("vec_b"), col("cos")))
      sym.withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_a")).orderBy(col("cos").desc, col("vec_b")))
          .cast("int"))
        .filter(col("rk") <= KnnK)
        .select(col("vec_a").as("vec_id"), col("rk"),
          col("vec_b").as("nbr_id"), col("cos"))
    }

  def q156KnnGraph(spark: SparkSession, dir: String): DataFrame =
    knnGraph(spark, dir).orderBy(col("vec_id"), col("rk"))

  // --------------------------------------------------------------------
  // q210 — kNN-graph HUBNESS audit: the in-degree distribution of
  // q156's graph. High-dimensional similarity graphs grow "hubs" —
  // vectors that appear in a disproportionate share of other vectors'
  // top-k lists — and hubness is the standard diagnostic for degraded
  // ANN recall and biased diversity sampling (a hub crowds true
  // neighbors out of every list it joins). Per observed in-degree:
  // how many vectors carry it, with min/max ids as exemplars; vectors
  // nobody lists (in-degree 0, including band-isolated ones) are a
  // first-class row via the left join from the full table.
  // Scale notes (100 TB): the in-degree aggregate keys on nbr_id —
  // hot by definition at the hubs — but count is map-side combined so
  // partials absorb the skew before the shuffle; the histogram input
  // is one row per vector and its output is bounded by k·n distinct
  // degrees (in practice dozens). Rides q156's banded graph, so no
  // all-pairs anything.
  def q210KnnHubness(spark: SparkSession, dir: String): DataFrame = {
    val knn = knnGraph(spark, dir)
    val deg = Tables.embeddingsSharded(spark, dir).select(col("vec_id"))
      .join(knn.select(col("nbr_id")), col("nbr_id") === col("vec_id"),
        "left_outer")
      .groupBy(col("vec_id")).agg(count(col("nbr_id")).as("in_deg"))
    deg.groupBy(col("in_deg"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"))
      .orderBy(col("in_deg"))
  }

  val q210Oracle: String =
    s"""WITH $sqlBandedCandCtes,
       |pairs AS (
       |  SELECT vec_a, vec_b, ${sqlCos(SqlDot)} AS cos
       |  FROM cands
       |  JOIN base a ON vec_a = a.vec_id
       |  JOIN base b ON vec_b = b.vec_id),
       |sym AS (
       |  SELECT vec_a, vec_b, cos FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS vec_a, vec_a AS vec_b, cos FROM pairs),
       |knn AS (
       |  SELECT vec_a AS vec_id, vec_b AS nbr_id FROM (
       |    SELECT vec_a, vec_b,
       |      ROW_NUMBER() OVER (PARTITION BY vec_a
       |        ORDER BY cos DESC, vec_b) AS rk
       |    FROM sym)
       |  WHERE rk <= $KnnK),
       |deg AS (
       |  SELECT e.vec_id, count(k.nbr_id) AS in_deg
       |  FROM embeddings e LEFT JOIN knn k ON k.nbr_id = e.vec_id
       |  GROUP BY 1)
       |SELECT in_deg, count(*) AS n_vecs, min(vec_id) AS min_vec,
       |  max(vec_id) AS max_vec
       |FROM deg GROUP BY 1 ORDER BY in_deg""".stripMargin

  val q156Oracle: String =
    s"""WITH $sqlBandedCandCtes,
       |pairs AS (
       |  SELECT vec_a, vec_b, ${sqlCos(SqlDot)} AS cos
       |  FROM cands
       |  JOIN base a ON vec_a = a.vec_id
       |  JOIN base b ON vec_b = b.vec_id),
       |sym AS (
       |  SELECT vec_a, vec_b, cos FROM pairs
       |  UNION ALL
       |  SELECT vec_b AS vec_a, vec_a AS vec_b, cos FROM pairs)
       |SELECT vec_id, rk, nbr_id, cos FROM (
       |  SELECT vec_a AS vec_id, vec_b AS nbr_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY vec_a
       |      ORDER BY cos DESC, vec_b) AS INTEGER) AS rk
       |  FROM sym)
       |WHERE rk <= $KnnK ORDER BY vec_id, rk""".stripMargin

  // --------------------------------------------------------------------
  // q83 — COMBINED keepers: the doc↔vector bridge the pipeline story
  // needed. A document survives iff it is kept by BOTH dedup
  // decisions: q56's minhash keep/discard on its text AND q79's
  // embedding keep/discard on its vector (vec_id = doc_id over the
  // aligned testdata ids). Documents without a vector (sf0.1 has 5 000
  // docs but 2 000 embeddings) have no semantic evidence against them
  // and survive the semantic stage by construction of the anti join.
  // Scale notes (100 TB): both discard sets scale with the corpus, so
  // both anti joins stay shuffled (AQE downgrades when small); the
  // bridge itself is just the key equality — no extra shuffle beyond
  // the two anti joins, which co-locate on the same doc_id hashing.
  /** Unordered combined keeper set (kept by BOTH the minhash text
    * decision and the banded embedding decision) — shared by q83 and
    * Multimodal's q154 cross-modal composition so the doc-tier keep
    * decision is written exactly once.
    */
  private[operators] def combinedKeeperSet(spark: SparkSession, dir: String): DataFrame = {
    val textKeepers = graft.operators.Dedup.keeperSet(spark, dir)
    val vecDiscards = bandedPairScan(spark, dir, None)
      .select(col("vec_b").as("doc_id")).distinct()
    textKeepers.join(vecDiscards, Seq("doc_id"), "left_anti")
  }

  def q83CombinedKeepers(spark: SparkSession, dir: String): DataFrame =
    combinedKeeperSet(spark, dir).orderBy(col("doc_id"))

  /** The full combined-keeper CTE chain (banded discards + minhash
    * pairs) and its WHERE predicate — the SQL twin of
    * [[combinedKeeperSet]], shared by the q83 and q154 oracles.
    */
  private[operators] lazy val sqlCombinedCtes: String = {
    val minhashPairs = graft.operators.Dedup.sqlMinhashPairs(
      "documents WHERE doc_id % 5 = 0")
    s"""$sqlBandedDiscardCtes,
       |pairs AS (
       |$minhashPairs
       |)""".stripMargin
  }

  private[operators] def sqlCombinedWhere(id: String): String =
    s"""$id % 5 = 0
       |  AND $id NOT IN (SELECT doc_b FROM pairs)
       |  AND $id NOT IN (SELECT vec_b FROM discards)""".stripMargin

  val q83Oracle: String =
    s"""WITH $sqlCombinedCtes
       |SELECT doc_id, lang, n_chars FROM documents
       |WHERE ${sqlCombinedWhere("doc_id")}
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q121 — per-source centroid drift: each source's embedding centroid
  // and every document's cosine alignment to its own source's centroid
  // — the corpus-health statistic that catches a source whose content
  // drifted from its cluster (low min/avg alignment). Exactness: the
  // centroid is never materialized as floats — cos(v, mean(S)) equals
  // cos(v, sum(S)), so all dot products run on exact DECIMAL sums of
  // the scaled-integer components; only the final sqrt/divide chain is
  // double, written with the same shape in both engines.
  // Scale notes (100 TB): one posexplode (rows × dim) feeding three
  // map-side-combined aggregates — (source,pos), (vec,source), and
  // (source) — all hash-partitioned, the tiny per-source tables
  // broadcast back. No pairwise comparisons anywhere: this is O(n·d),
  // the cheapest corpus-drift signal there is.
  def q121CentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val sv = Tables.embeddingsSharded(spark, dir).select(col("vec_id"),
      transform(col("embedding"),
        x => round(x.cast("double") * 1000000).cast("bigint")).as("sv"))
    val src = Tables.documentsSharded(spark, dir)
      .select(col("doc_id"), col("source"))
    val pe = sv.join(src, sv("vec_id") === src("doc_id"))
      .select(col("vec_id"), col("source"), posexplode(col("sv")))
      .select(col("vec_id"), col("source"), col("pos"),
        col("col").cast(DecimalType(18, 0)).as("x"))
    val sums = pe.groupBy(col("source"), col("pos")).agg(sum(col("x")).as("s"))
    val ssq = sums.groupBy(col("source")).agg(sum(col("s") * col("s")).as("ss"))
    val per = pe.join(sums, Seq("source", "pos"))
      .groupBy(col("vec_id"), col("source"))
      .agg(sum(col("x") * col("s")).as("vs"), sum(col("x") * col("x")).as("vv"))
    per.join(broadcast(ssq), Seq("source"))
      .withColumn("cos", round(col("vs").cast("double") /
        sqrt(col("vv").cast("double")) / sqrt(col("ss").cast("double")), 6))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("cos").cast(DecimalType(10, 6))).cast("double") /
          count(lit(1)), 6).as("avg_cos"),
        min(col("cos")).as("min_cos"), max(col("cos")).as("max_cos"))
      .orderBy(col("source"))
  }

  val q121Oracle: String =
    s"""WITH sv AS (
       |  SELECT vec_id, $SqlScaled AS sv FROM embeddings),
       |br AS (
       |  SELECT s.vec_id, d.source, s.sv
       |  FROM sv s JOIN documents d ON s.vec_id = d.doc_id),
       |pe AS (
       |  SELECT vec_id, source, i AS pos, CAST(sv[i] AS DECIMAL(18,0)) AS x
       |  FROM br, unnest(generate_series(1, len(sv))) AS t(i)),
       |sums AS (
       |  SELECT source, pos, SUM(x) AS s FROM pe GROUP BY 1, 2),
       |ssq AS (
       |  SELECT source, SUM(s * s) AS ss FROM sums GROUP BY 1),
       |per AS (
       |  SELECT vec_id, source, SUM(x * s) AS vs, SUM(x * x) AS vv
       |  FROM pe JOIN sums USING (source, pos) GROUP BY 1, 2),
       |scored AS (
       |  SELECT per.source,
       |    round(CAST(vs AS DOUBLE) / sqrt(CAST(vv AS DOUBLE))
       |      / sqrt(CAST(ss AS DOUBLE)), 6) AS cos
       |  FROM per JOIN ssq ON per.source = ssq.source)
       |SELECT source, COUNT(*) AS n_docs,
       |  round(CAST(SUM(CAST(cos AS DECIMAL(10,6))) AS DOUBLE) / COUNT(*), 6)
       |    AS avg_cos,
       |  MIN(cos) AS min_cos, MAX(cos) AS max_cos
       |FROM scored GROUP BY 1 ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q143 — deterministic contrastive pair mining: each vector gets a
  // positive partner (same label) and a hard-negative candidate
  // (different label) with ZERO RNG — the (anchor, pos, neg) triplets
  // contrastive/embedding training consumes, reproducible across runs
  // and engines. Positives pair each vector with the NEXT vector in
  // md5-hash order within its (label, bucket) group — a per-group
  // window, deterministic, uniformly "random" in hash order. Negatives
  // take the minimum combined key h·2²⁰+vec_id over different-label
  // vectors sharing the anchor's hash bucket — an all-integer argmin,
  // so ties are impossible (vec_id is unique) and both engines pick
  // the same partner. Group ends yield null pos / bucket-local
  // cross-label absence yields null neg; anchors are never dropped.
  // Scale notes (100 TB): the window partitions on (label, bucket) —
  // bucket count is the knob that bounds partition size (16 here;
  // production sizes it to corpus/task). The negative join is one
  // bucket equi-join with the label inequality as a post-filter —
  // never a cross join; the argmin aggregates map-side. vec_id < 2²⁰
  // is ENFORCED scan-side ([[guardedPackedId]]): an id outside the
  // pack range fails loud instead of silently corrupting the argmin
  // ordering and the decoded neg_id — widen the shift at larger id
  // spaces.
  /** An id admitted into a base·2²⁰+id packed key only if it fits the
    * 20-bit pack range; anything else raises at execution time. Lives
    * inside a needed column so column pruning can't drop it. Shared by
    * q143's argmin key and q157's chunk-occurrence key.
    */
  private[operators] def guardedPackedId(id: Column): Column =
    when(id >= 0L && id < (1L << 20), id)
      .otherwise(raise_error(concat(
        lit("packed id outside the 20-bit range — widen the shift: "),
        id.cast("string"))).cast("long"))

  def q143ContrastivePairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = Tables.embeddingsSharded(spark, dir)
      .select(col("vec_id"), col("label"),
        conv(substring(md5(concat(lit("cp:"), col("vec_id").cast("string"))),
          1, 8), 16, 10).cast("long").as("h"))
      .withColumn("bucket", col("h") % 16)
    val pos = b.withColumn("pos_id", lead(col("vec_id"), 1).over(
      Window.partitionBy(col("label"), col("bucket"))
        .orderBy(col("h"), col("vec_id"))))
    val neg = b.as("a").join(b.as("c"),
        col("a.bucket") === col("c.bucket") && col("a.label") =!= col("c.label"))
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("c.h") * 1048576L + guardedPackedId(col("c.vec_id"))).as("nk"))
    pos.join(neg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("pos_id"),
        (col("nk") % 1048576L).as("neg_id"))
      .orderBy(col("vec_id"))
  }

  val q143Oracle: String =
    """WITH b AS (
      |  SELECT vec_id, label,
      |    CAST('0x' || substring(md5('cp:' || CAST(vec_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) AS h
      |  FROM embeddings),
      |bb AS (SELECT vec_id, label, h, h % 16 AS bucket FROM b),
      |pos AS (
      |  SELECT vec_id, label,
      |    LEAD(vec_id) OVER (PARTITION BY label, bucket ORDER BY h, vec_id)
      |      AS pos_id
      |  FROM bb),
      |neg AS (
      |  SELECT a.vec_id, MIN(c.h * 1048576 + c.vec_id) AS nk
      |  FROM bb a JOIN bb c ON a.bucket = c.bucket AND a.label <> c.label
      |  GROUP BY a.vec_id)
      |SELECT p.vec_id, p.label, p.pos_id,
      |  CAST(n.nk % 1048576 AS BIGINT) AS neg_id
      |FROM pos p LEFT JOIN neg n ON p.vec_id = n.vec_id
      |ORDER BY p.vec_id""".stripMargin

  // --------------------------------------------------------------------
  // q161 — per-DIMENSION embedding health stats: exact mean and
  // population variance of every coordinate, plus the variance rank.
  // Dead dimensions (variance ≈ 0) and runaway ones are the first
  // thing to check when a retrained encoder degrades retrieval; this
  // is the embedding-space analogue of q101's column profiler.
  // Exactness: coordinates ride the q121 scaled-integer lift, moments
  // accumulate as DECIMAL(18,0) sums, and only the final mean/variance
  // expressions are double — written with the same shape in both
  // engines. The rank window is over DIMENSION rows (64 here; bounded
  // by model width, never by data) — the q116 bounded-window class.
  // Scale notes (100 TB): one posexplode (rows × dim) into one
  // map-side-combined aggregate keyed on the dimension — O(n·d), no
  // joins, nothing collected.
  def q161DimensionStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pe = Tables.embeddingsSharded(spark, dir)
      .select(posexplode(transform(col("embedding"),
        x => round(x.cast("double") * 1000000).cast("bigint"))).as(Seq("pos", "x")))
      .select(col("pos"), col("x").cast(DecimalType(18, 0)).as("x"))
    val stats = pe.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("pos"), col("n"),
        round(col("sx").cast("double") / col("n") / 1000000.0, 6).as("mean"),
        round((col("sxx").cast("double") / col("n") -
          (col("sx").cast("double") / col("n")) *
          (col("sx").cast("double") / col("n"))) / 1000000000000.0, 6)
          .as("variance"))
    stats.withColumn("var_rank", row_number().over(
        Window.orderBy(col("variance").desc, col("pos"))).cast("int"))
      .orderBy(col("pos"))
  }

  val q161Oracle: String =
    """WITH pe AS (
      |  SELECT unnest(range(1, len(embedding) + 1)) AS pos1,
      |    unnest(list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS x
      |  FROM embeddings),
      |a AS (
      |  SELECT CAST(pos1 - 1 AS INTEGER) AS pos, COUNT(*) AS n,
      |    SUM(CAST(x AS DECIMAL(18,0))) AS sx,
      |    SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx
      |  FROM pe GROUP BY 1),
      |s AS (
      |  SELECT pos, n,
      |    round(CAST(sx AS DOUBLE) / n / 1000000.0, 6) AS mean,
      |    round((CAST(sxx AS DOUBLE) / n
      |      - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
      |      / 1000000000000.0, 6) AS variance
      |  FROM a)
      |SELECT pos, n, mean, variance,
      |  CAST(ROW_NUMBER() OVER (ORDER BY variance DESC, pos) AS INTEGER)
      |    AS var_rank
      |FROM s ORDER BY pos""".stripMargin

  // --------------------------------------------------------------------
  // q188 — HYBRID retrieval by RECIPROCAL RANK FUSION (Cormack,
  // Clarke & Büttcher, SIGIR'09): fuse the sparse BM25 ranking (q187's
  // scored frame) with a dense cosine ranking against a fixed query
  // vector (vec_id 0, riding the 1-row opaque join; the query vector
  // itself is excluded from its own candidate pool). Each list
  // contributes 1/(RrfK + rank) for its top-RrfPoolN entries; absent
  // lists contribute 0 (standard RRF over partial pools — at sf0.1 the
  // id spaces genuinely differ: 5 000 docs vs 2 000 vectors).
  // Determinism contract: BOTH pool ranks order on 6-decimal-rounded
  // scores with an id tiebreak (the settled internal-sort-key
  // discipline), and the fused score is divisions and additions of
  // exact integers ONLY — every op is IEEE-correctly-rounded, so the
  // rrf doubles are BIT-IDENTICAL across engines (no transcendental
  // anywhere); emitted columns are the two integer ranks.
  // Scale notes (100 TB): both pools are TopKByLong PARTIAL aggregates
  // (k rows of state per map task, no rank window — the dense side is
  // one codegen'd dot-product scan, the q49 IVF probe being the
  // narrower-candidate variant); fusion joins two ≤RrfPoolN-row
  // frames — driver-bounded by construction.
  val RrfK = 60
  val RrfPoolN = 50
  val RrfTopK = 10

  def q188HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val sparse = TextAnalysis.bm25Scored(spark, dir)
      .agg(graft.functions.TopKByLong.topk_by(
        col("score"), col("doc_id"), RrfPoolN).as("ids"))
      .select(posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("r_bm25"))
    val all = withScaledNorm(Tables.embeddingsSharded(spark, dir))
    val qv = all.filter(col("vec_id") === 0)
      .select(col("sv").as("qsv"), col("nrm").as("qnrm"),
        graft.plans.Opaque.zeroKey(col("nrm")).as("_k"))
    val dense = all.filter(col("vec_id") =!= 0)
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("nrm")))
      .join(qv, Seq("_k"))
      .select(col("vec_id"),
        cosine(dot(col("qsv"), col("sv")), col("qnrm"), col("nrm")).as("cos"))
      .agg(graft.functions.TopKByLong.topk_by(
        col("cos"), col("vec_id"), RrfPoolN).as("ids"))
      .select(posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("r_dense"))
    val fused = sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(RrfK) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("r_dense")), lit(0.0)))
    val top = fused.agg(graft.functions.TopKByLong.topk_by(
        col("rrf"), col("doc_id"), RrfTopK).as("ids"))
      .select(posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select((col("pos") + 1).cast("int").as("rk"), col("doc_id"))
    broadcast(top).join(fused, Seq("doc_id"))
      .select(col("rk"), col("doc_id"), col("r_bm25"), col("r_dense"))
      .orderBy(col("rk"))
  }

  val q188Oracle: String =
    s"""WITH ${TextAnalysis.Bm25ScoredCtes},
       |sr AS (
       |  SELECT doc_id, r_bm25 FROM (
       |    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
       |      AS INTEGER) AS r_bm25 FROM scored)
       |  WHERE r_bm25 <= $RrfPoolN),
       |base AS (
       |  $SqlBase),
       |dscored AS (
       |  SELECT b.vec_id, ${sqlCos(SqlDot)} AS cos
       |  FROM (SELECT sv, nrm FROM base WHERE vec_id = 0) a, base b
       |  WHERE b.vec_id <> 0),
       |dr AS (
       |  SELECT doc_id, r_dense FROM (
       |    SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER (ORDER BY cos DESC,
       |      vec_id) AS INTEGER) AS r_dense FROM dscored)
       |  WHERE r_dense <= $RrfPoolN),
       |fused AS (
       |  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id, s.r_bm25, d.r_dense,
       |    COALESCE(CAST(1 AS DOUBLE) / ($RrfK + s.r_bm25), CAST(0 AS DOUBLE)) +
       |    COALESCE(CAST(1 AS DOUBLE) / ($RrfK + d.r_dense), CAST(0 AS DOUBLE))
       |      AS rrf
       |  FROM sr s FULL JOIN dr d ON s.doc_id = d.doc_id)
       |SELECT rk, doc_id, r_bm25, r_dense FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id)
       |    AS INTEGER) AS rk FROM fused)
       |WHERE rk <= $RrfTopK ORDER BY rk""".stripMargin

  // --------------------------------------------------------------------
  // q190 — SEMANTIC dedup, cluster-bucketed (the SemDeDup recipe,
  // Abbas et al. 2023): assign every embedding to its IVF cell (q49's
  // deterministic seed codebook), generate candidate pairs only WITHIN
  // a cell, call a pair duplicate at cos ≥ SemTau (the fixture's q36
  // near-dup convention), and inside each duplicate pair KEEP the
  // vector LESS similar to its cell centroid (the paper's
  // keep-the-outlier rule — it preserves diversity), ties on the
  // rounded centroid-cosine breaking to the smaller vec_id. The
  // pair-local greedy form (drop any vector that loses at least one
  // pair) is the same keeper semantic as q56/q79, with cluster cells
  // replacing LSH bands as the candidate generator.
  // Output: every vector with its kept flag, centroid cosine (rounded
  // divide/sqrt — the quiet IEEE channel every cosine emitter shares),
  // and its cell's population; cell LABELS are never emitted (the
  // positional-vs-DIV labeling contract in IvfAnn.buildIndexFrom).
  // Scale notes (100 TB): candidates are cell-bucketed — the
  // within-cell pair join is an equi-join on the cell key whose block
  // size is bounded by cell population (production k ~ thousands of
  // cells keeps blocks small; fixture k=8); the codebook is the
  // bounded IVF collect; the multi-consumer cell+centroid frame is a
  // cached cut-point (the q82/q187 rule); no window, no nested loop.
  val SemTau = 0.4

  def q190SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // the multi-consumer cell+centroid frame is a PERSISTED cut-point
    // (StageBoundary, the q82 rule): on a boundary hit the IVF build —
    // corpus count, codebook collect, assignment — never runs at all;
    // the shared (dir, k=8) index underneath is itself boundary-backed
    // (IvfAnn.sharedIndex), so even a cc rebuild reuses it
    val cc = graft.sources.StageBoundary(spark, "q190cc", dir) {
      import spark.implicits._
      val index = IvfAnn.sharedIndex(spark, dir, k = 8)
      val piv = index.pivots.toSeq.map { case (c, sv, n) => (c, sv.toSeq, n) }
        .toDF("cell", "psv", "pnrm")
      index.cells.join(broadcast(piv), Seq("cell"))
        .withColumn("cos_centroid",
          cosine(dot(col("sv"), col("psv")), col("nrm"), col("pnrm")))
        .select(col("cell"), col("vec_id"), col("sv"), col("nrm"),
          col("cos_centroid"))
    }
    val a = cc.select(col("cell"), col("vec_id").as("va"),
      col("sv").as("sva"), col("nrm").as("na"), col("cos_centroid").as("cca"))
    val b = cc.select(col("cell"), col("vec_id").as("vb"),
      col("sv").as("svb"), col("nrm").as("nb"), col("cos_centroid").as("ccb"))
    val pairs = a.join(b, Seq("cell")).filter(col("va") < col("vb"))
      .withColumn("cos", cosine(dot(col("sva"), col("svb")), col("na"), col("nb")))
      .filter(col("cos") >= SemTau)
    val dropped = pairs.select(
        when(col("cca") > col("ccb"), col("va"))
          .when(col("cca") < col("ccb"), col("vb"))
          .otherwise(greatest(col("va"), col("vb"))).as("vec_id"))
      .distinct()
      .withColumn("_d", lit(1))
    val ncell = cc.groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
    cc.join(broadcast(ncell), Seq("cell"))
      .join(broadcast(dropped), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("_d").isNull.as("kept"),
        col("cos_centroid"), col("n_cell"))
      .orderBy(col("vec_id"))
  }

  /** The `sva`→`dropped` CTE chain mirroring [[q190SemanticDedup]]'s
    * cell assignment, centroid cosines and pair-local drop rule —
    * shared by the q190 and q192 oracle texts. Defined BEFORE its
    * consumers (strict-val source-order initialization).
    */
  private[operators] val SemDroppedCtes: String =
    s"""sva AS (
       |  SELECT vec_id, $SqlScaled AS sv FROM embeddings),
       |base AS (
       |  SELECT vec_id, sv,
       |    CAST(list_sum(list_transform(generate_series(1, len(sv)),
       |      i -> sv[i] * sv[i])) AS BIGINT) AS nrm
       |  FROM sva),
       |mm AS (
       |  SELECT GREATEST(1, CAST(ceil(CAST(count(*) AS DOUBLE) / 8) AS BIGINT)) AS m
       |  FROM embeddings),
       |seeds AS (
       |  SELECT CAST(vec_id // (SELECT m FROM mm) AS INTEGER) AS cell, sv, nrm
       |  FROM base WHERE vec_id % (SELECT m FROM mm) = 0),
       |dists AS (
       |  SELECT a.vec_id, s.cell, a.sv, a.nrm,
       |    a.nrm + s.nrm - 2 * CAST(list_sum(list_transform(
       |      generate_series(1, len(a.sv)), i -> a.sv[i] * s.sv[i])) AS BIGINT) AS d
       |  FROM base a CROSS JOIN seeds s),
       |assigned AS (
       |  SELECT vec_id, cell, sv, nrm FROM dists
       |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
       |cc AS (
       |  SELECT a.vec_id, a.cell, a.sv, a.nrm,
       |    round(CAST(CAST(list_sum(list_transform(generate_series(1, len(a.sv)),
       |        i -> a.sv[i] * s.sv[i])) AS BIGINT) AS DOUBLE)
       |      / sqrt(CAST(a.nrm AS DOUBLE)) / sqrt(CAST(s.nrm AS DOUBLE)), 6)
       |      AS cos_centroid
       |  FROM assigned a JOIN seeds s USING (cell)),
       |pairs AS (
       |  SELECT * FROM (
       |    SELECT a.vec_id AS va, b.vec_id AS vb,
       |      a.cos_centroid AS cca, b.cos_centroid AS ccb,
       |      ${sqlCos(SqlDot)} AS cos
       |    FROM cc a JOIN cc b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |  WHERE cos >= $SemTau),
       |dropped AS (
       |  SELECT DISTINCT CASE WHEN cca > ccb THEN va
       |    WHEN cca < ccb THEN vb ELSE GREATEST(va, vb) END AS vec_id
       |  FROM pairs)""".stripMargin

  val q190Oracle: String =
    s"""WITH $SemDroppedCtes,
       |ncell AS (
       |  SELECT cell, CAST(count(*) AS BIGINT) AS n_cell
       |  FROM assigned GROUP BY 1)
       |SELECT c.vec_id, (d.vec_id IS NULL) AS kept, c.cos_centroid, n.n_cell
       |FROM cc c LEFT JOIN dropped d USING (vec_id) JOIN ncell n USING (cell)
       |ORDER BY c.vec_id""".stripMargin

  // --------------------------------------------------------------------
  // q196 — INT8 SCALAR QUANTIZATION of the embedding table: the
  // compression step an ANN serving layer runs before building its
  // index (4x smaller vectors, SIMD-friendly integer distance). Each
  // dimension gets a corpus-wide [min, max] range; each coordinate
  // maps to code = floor((x - min) * 255 / (max - min)) in 0..255
  // (dead dimensions — max = min — code to 0). Output is the per-vector
  // code profile: dims, code sum, code energy (sum of squares), and
  // the saturation count (codes pinned at 0 or 255 — the diagnostic
  // for outlier-squashed ranges).
  // Exactness: coordinates ride the q121 scaled-integer lift
  // (round(x * 1e6) as BIGINT), ranges are integer min/max, and the
  // quantizer numerator/denominator are integers. Spark evaluates
  // floor((xi - mn) * 255 / span) through one double division: with
  // |num| <= 2.8e8 and span >= 1, the quotient q <= 255 carries IEEE
  // error <= 255 * 2^-53 ~ 3e-14 while nonzero fractional parts are
  // >= 1/span >= 4.5e-7 — five orders of magnitude apart, so the floor
  // equals exact integer division (DuckDB's //) for every
  // representable input. Every emitted column is a BIGINT.
  // Scale notes (100 TB): ONE posexplode -> d-row map-side-combined
  // aggregate for the ranges; the d-row collect is model-width bounded
  // (the q49/q185 codebook-collect class); quantize + profile is a
  // row-local array fold over the corpus — no join, no second shuffle.
  def q196Int8Quantize(spark: SparkSession, dir: String): DataFrame = {
    val lift: Column => Column =
      x => round(x.cast("double") * 1000000).cast("bigint")
    val ranges = Tables.embeddingsSharded(spark, dir)
      .select(posexplode(transform(col("embedding"), lift)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val mnLit = array(ranges.map(r => lit(r._2)): _*)
    val mxLit = array(ranges.map(r => lit(r._3)): _*)
    val codes = transform(col("embedding"), (x, i) => {
      val xi = lift(x)
      val mn = element_at(mnLit, i + 1)
      val mx = element_at(mxLit, i + 1)
      when(mx === mn, lit(0L))
        .otherwise(floor((xi - mn) * lit(255L) / (mx - mn)).cast("bigint"))
    })
    Tables.embeddingsSharded(spark, dir)
      .select(col("vec_id"), codes.as("c"))
      .select(col("vec_id"),
        size(col("c")).cast("bigint").as("n_dims"),
        aggregate(col("c"), lit(0L), (a, c) => a + c).as("code_sum"),
        aggregate(col("c"), lit(0L), (a, c) => a + c * c).as("code_l2sq"),
        size(filter(col("c"), c => c === 0L || c === 255L)).cast("bigint")
          .as("n_sat"))
      .orderBy(col("vec_id"))
  }

  val q196Oracle: String =
    """WITH pe AS (
      |  SELECT vec_id,
      |    CAST(unnest(range(1, len(embedding) + 1)) AS INTEGER) AS pos1,
      |    unnest(list_transform(embedding,
      |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS x
      |  FROM embeddings),
      |mm AS (SELECT pos1, min(x) AS mn, max(x) AS mx FROM pe GROUP BY 1),
      |codes AS (
      |  SELECT vec_id, CASE WHEN mx = mn THEN 0
      |    ELSE CAST((x - mn) * 255 // (mx - mn) AS BIGINT) END AS c
      |  FROM pe JOIN mm USING (pos1))
      |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
      |  CAST(sum(c) AS BIGINT) AS code_sum,
      |  CAST(sum(c * c) AS BIGINT) AS code_l2sq,
      |  CAST(sum(CASE WHEN c = 0 OR c = 255 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sat
      |FROM codes GROUP BY 1 ORDER BY vec_id""".stripMargin

  // --------------------------------------------------------------------
  // q209 — PER-SUBSPACE COVARIANCE STATS: the second-moment matrix an
  // OPQ/PCA/whitening stage fits before product quantization — PQ
  // splits the d dims into subspace blocks and learns a rotation per
  // block, which needs exactly the within-block covariance. Dims ride
  // the q121 scaled-integer lift, so every emitted stat is an exact
  // BIGINT (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ per within-block dim pair i ≤ j); the
  // covariance itself is (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n — a consumer-side divide
  // kept out of the hash (the q191 no-rounded-channel discipline).
  // Scale notes (100 TB): one posexplode (d rows/vec) + one bounded
  // within-block sequence explode (≤ CovBlock more per dim row —
  // d·B/2 avg pair rows per vector, NOT d²) feeding a map-side-combined
  // hash agg; output is d·(B+1)/2 rows (544 at d=64, B=16), bounded by
  // model width, never by corpus size. The block structure is the
  // point: full-d covariance would square the expansion for entries a
  // per-block rotation never reads. A BLAS Gram-matrix mapPartitions
  // would cut constant factors at extreme d; the declarative form
  // keeps codegen and the oracle.
  val CovBlock = 16

  def q209SubspaceCov(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddingsSharded(spark, dir)
      .select(col("vec_id"), scaled.as("sv"))
    val ei = base
      .select(col("sv"), posexplode(col("sv")).as(Seq("i", "xi")))
      .withColumn("blk", (col("i") / CovBlock).cast("int"))
    val pairs = ei
      .select(col("blk"), col("i"), col("xi"),
        explode(sequence(col("i"),
          col("blk") * CovBlock + lit(CovBlock - 1))).as("j"),
        col("sv"))
      .withColumn("xj", element_at(col("sv"), col("j") + 1))
    pairs.groupBy(col("blk"), col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("s_i"), sum(col("xj")).as("s_j"),
        sum(col("xi") * col("xj")).as("s_ij"))
      .orderBy(col("i"), col("j"))
  }

  val q209Oracle: String =
    s"""WITH sva AS (
       |  SELECT vec_id, $SqlScaled AS sv FROM embeddings),
       |ei AS (
       |  SELECT vec_id, sv, unnest(generate_series(1, len(sv))) - 1 AS i
       |  FROM sva),
       |ej AS (
       |  SELECT CAST(i // $CovBlock AS INTEGER) AS blk, CAST(i AS INTEGER) AS i,
       |    CAST(unnest(generate_series(i,
       |      (i // $CovBlock) * $CovBlock + ${CovBlock - 1})) AS INTEGER) AS j,
       |    sv
       |  FROM ei),
       |ex AS (SELECT blk, i, j, sv[i + 1] AS xi, sv[j + 1] AS xj FROM ej)
       |SELECT blk, i, j, count(*) AS n, CAST(sum(xi) AS BIGINT) AS s_i,
       |  CAST(sum(xj) AS BIGINT) AS s_j, CAST(sum(xi * xj) AS BIGINT) AS s_ij
       |FROM ex GROUP BY 1, 2, 3 ORDER BY i, j""".stripMargin

  // --------------------------------------------------------------------
  // q231 — ROBUST SCALING stats per embedding dimension: median and
  // MAD (median absolute deviation) of every dimension over the
  // scaled-integer lift — the outlier-resistant normalization prep
  // (q196's min/max quantizer saturates on one outlier; median/MAD
  // does not, which is why robust scalers use it). Medians are the
  // interpolated-percentile aggregate both engines compute
  // bit-identically (the q169/q186 contract); the deviation |v − med|
  // is the same IEEE subtract+abs on both sides, so the second
  // percentile's input is identical too. min/max ride along for the
  // saturation comparison against q196.
  // Scale notes (100 TB): one posexplode (d rows/vec) into two
  // d-group percentile aggregates with a d-row broadcast join between
  // them — group count is model width, never corpus size.
  def q231RobustScaling(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.embeddingsSharded(spark, dir)
      .select(posexplode(scaled).as(Seq("dim", "v")))
    val med = ex.groupBy(col("dim"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    ex.join(broadcast(med), Seq("dim"))
      .withColumn("dev", abs(col("v") - col("med")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        expr("percentile(dev, 0.5)").as("mad"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .orderBy(col("dim"))
  }

  val q231Oracle: String =
    s"""WITH sva AS (
       |  SELECT $SqlScaled AS sv FROM embeddings),
       |ei AS (SELECT sv, unnest(generate_series(1, len(sv))) AS i FROM sva),
       |ex AS (SELECT CAST(i - 1 AS INTEGER) AS dim, sv[i] AS v FROM ei),
       |med AS (SELECT dim, quantile_cont(v, 0.5) AS med FROM ex GROUP BY 1),
       |ag AS (
       |  SELECT e.dim, CAST(count(*) AS BIGINT) AS n, max(med) AS med,
       |    quantile_cont(abs(v - med), 0.5) AS mad,
       |    CAST(min(v) AS BIGINT) AS vmin, CAST(max(v) AS BIGINT) AS vmax
       |  FROM ex e JOIN med USING (dim) GROUP BY 1)
       |SELECT dim, n, med, mad, vmin, vmax FROM ag ORDER BY dim""".stripMargin

  // --------------------------------------------------------------------
  // q227 — PRINCIPAL DIRECTION per subspace via POWER ITERATION: two
  // unrolled matrix-vector iterations on each block's Gram matrix
  // (q209's exact moments, averaged per row) — the rotation-fitting
  // step OPQ/PCA runs on exactly the statistics q209 collects. The
  // q100 Lloyd discipline applied to power iteration: after every
  // matvec the vector renormalizes to a ±1000 integer scale through
  // one double divide + round, and both engines execute the SAME IEEE
  // op sequence (cast, divide, ×1000, round-half-away), so the whole
  // trained loop replays in DuckDB bit-for-bit. Emitted vectors are
  // exact BIGINTs; v1 AND v2 ship so convergence is visible.
  // Scale notes (100 TB): everything downstream of q209's one corpus
  // pass operates on d·(B+1)/2-row frames — matvecs are equi-joins on
  // (blk, j) over model-width-bounded data; per-block maxima are
  // 4-row aggregates. Corpus size never reappears. The ÷n averaging
  // also bounds the second matvec's products inside int64 at any
  // corpus scale.
  def q227PowerIteration(spark: SparkSession, dir: String): DataFrame = {
    // MATERIALIZE THE INVARIANTS ONCE (q137's settled lesson): the
    // unrolled iterations reference cov/sym/v1/u2 two-to-eightfold,
    // and without a cut-point the q209 corpus pass inlines at every
    // reference — the initial physical plan carried SIXTEEN
    // embeddings scans (round-19 audit) where the scale note promised
    // one. Every checkpointed frame is model-width-bounded
    // (d·(B+1)/2 rows and below), so the lineage cut is free at any
    // corpus scale; lazy localCheckpoint materializes on the query's
    // own action.
    val cov = q209SubspaceCov(spark, dir).localCheckpoint(false)
    val sym = cov.select(col("blk"), col("i"), col("j"), col("s_ij"), col("n"))
      .unionByName(cov.filter(col("i") =!= col("j"))
        .select(col("blk"), col("j").as("i"), col("i").as("j"),
          col("s_ij"), col("n")))
      .withColumn("m", round(col("s_ij").cast("double") / col("n")).cast("bigint"))
      .localCheckpoint(false)
    val u1 = sym.groupBy(col("blk"), col("i")).agg(sum(col("m")).as("u1"))
    val n1 = u1.groupBy(col("blk"))
      .agg(greatest(max(abs(col("u1"))), lit(1L)).as("mx1"))
    val v1 = u1.join(n1, Seq("blk"))
      .withColumn("v1",
        round(col("u1").cast("double") / col("mx1") * 1000).cast("bigint"))
      .localCheckpoint(false)
    val u2 = sym
      .join(v1.select(col("blk"), col("i").as("j"), col("v1")), Seq("blk", "j"))
      .groupBy(col("blk"), col("i")).agg(sum(col("m") * col("v1")).as("u2"))
      .localCheckpoint(false)
    val n2 = u2.groupBy(col("blk"))
      .agg(greatest(max(abs(col("u2"))), lit(1L)).as("mx2"))
    u2.join(n2, Seq("blk"))
      .withColumn("v2",
        round(col("u2").cast("double") / col("mx2") * 1000).cast("bigint"))
      .join(v1.select(col("blk"), col("i"), col("v1")), Seq("blk", "i"))
      .select(col("blk"), col("i"), col("v1"), col("v2"))
      .orderBy(col("blk"), col("i"))
  }

  /** q209's oracle nests as the moment source; both iterations replay
    * with the same double-op sequence the Spark side runs.
    */
  val q227Oracle: String = {
    val covNoOrder = q209Oracle.replace("ORDER BY i, j", "")
    s"""WITH cov AS (
       |$covNoOrder
       |),
       |sym AS (
       |  SELECT blk, i, j, s_ij, n FROM cov
       |  UNION ALL
       |  SELECT blk, j AS i, i AS j, s_ij, n FROM cov WHERE i <> j),
       |mm AS (
       |  SELECT blk, i, j,
       |    CAST(round(CAST(s_ij AS DOUBLE) / n) AS BIGINT) AS m
       |  FROM sym),
       |u1 AS (SELECT blk, i, CAST(sum(m) AS BIGINT) AS u1
       |       FROM mm GROUP BY 1, 2),
       |n1 AS (SELECT blk, GREATEST(max(abs(u1)), 1) AS mx1
       |       FROM u1 GROUP BY 1),
       |v1 AS (
       |  SELECT u1.blk, i,
       |    CAST(round(CAST(u1 AS DOUBLE) / mx1 * 1000) AS BIGINT) AS v1
       |  FROM u1 JOIN n1 ON u1.blk = n1.blk),
       |u2 AS (
       |  SELECT mm.blk, mm.i, CAST(sum(mm.m * v1.v1) AS BIGINT) AS u2
       |  FROM mm JOIN v1 ON mm.blk = v1.blk AND mm.j = v1.i
       |  GROUP BY 1, 2),
       |n2 AS (SELECT blk, GREATEST(max(abs(u2)), 1) AS mx2
       |       FROM u2 GROUP BY 1)
       |SELECT u2.blk, u2.i, v1.v1,
       |  CAST(round(CAST(u2 AS DOUBLE) / mx2 * 1000) AS BIGINT) AS v2
       |FROM u2
       |JOIN n2 ON u2.blk = n2.blk
       |JOIN v1 ON v1.blk = u2.blk AND v1.i = u2.i
       |ORDER BY u2.blk, u2.i""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q227_power_iteration" -> q227PowerIteration,
    "q231_robust_scaling" -> q231RobustScaling,
    "q209_subspace_cov" -> q209SubspaceCov,
    "q210_knn_hubness" -> q210KnnHubness,
    "q196_int8_quantize" -> q196Int8Quantize,
    "q190_semantic_dedup" -> q190SemanticDedup,
    "q188_hybrid_rrf" -> q188HybridRrf,
    "q143_contrastive_pairs" -> q143ContrastivePairs,
    "q161_dimension_stats" -> q161DimensionStats,
    "q121_centroid_drift" -> q121CentroidDrift,
    "q34_cosine_topk" -> q34CosineTopk,
    "q35_lsh_ann" -> q35LshAnn,
    "q36_embedding_neardup" -> q36EmbeddingNeardup,
    "q77_embedding_neardup_bucketed" -> q77EmbeddingNeardupBucketed,
    "q79_embedding_keepers" -> q79EmbeddingKeepers,
    "q83_combined_keepers" -> q83CombinedKeepers,
    "q87_quantized_rerank" -> q87QuantizedRerank,
    "q156_knn_graph" -> q156KnnGraph,
    "q165_jl_sketch" -> q165JlSketch)

  def oracleSql: Map[String, String] = Map(
    "q227_power_iteration" -> q227Oracle,
    "q231_robust_scaling" -> q231Oracle,
    "q209_subspace_cov" -> q209Oracle,
    "q210_knn_hubness" -> q210Oracle,
    "q196_int8_quantize" -> q196Oracle,
    "q190_semantic_dedup" -> q190Oracle,
    "q188_hybrid_rrf" -> q188Oracle,
    "q143_contrastive_pairs" -> q143Oracle,
    "q161_dimension_stats" -> q161Oracle,
    "q121_centroid_drift" -> q121Oracle,
    "q34_cosine_topk" -> q34Oracle,
    "q35_lsh_ann" -> q35Oracle,
    "q36_embedding_neardup" -> q36Oracle,
    "q77_embedding_neardup_bucketed" -> q77Oracle,
    "q79_embedding_keepers" -> q79Oracle,
    "q83_combined_keepers" -> q83Oracle,
    "q87_quantized_rerank" -> q87Oracle,
    "q156_knn_graph" -> q156Oracle,
    "q165_jl_sketch" -> q165Oracle)
}
