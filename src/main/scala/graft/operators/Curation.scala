package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw crawl and tokenizer: benchmark-contamination detection,
  * TF-IDF term scoring, repetition scoring, PII scrubbing, and
  * deterministic source-mixture sampling. All five are oracle-checked
  * against DuckDB.
  *
  * Scale notes (100 TB):
  *   - contamination joins the corpus against the benchmark shingle
  *     set on the shingle key; benchmark suites are tiny by nature, so
  *     AQE broadcasts that side at runtime (no forced hint — the
  *     fixture's benchmark slice scales with the corpus, and a forced
  *     broadcast of a corpus-scaled set is the q56 anti-pattern);
  *   - TF-IDF is two hash aggregations (doc-term, then term) with the
  *     document-frequency side derived from the first — the corpus
  *     tokenizes exactly once; the per-doc top-k window partitions on
  *     doc_id (fine-grained, skew-free);
  *   - repetition is the same explode + two-level aggregate, never a
  *     per-row O(len²) loop;
  *   - PII scrub and mixture sampling are pure scan-side projections /
  *     filters — zero shuffle, codegen'd regex and md5.
  */
object Curation {

  private def toksCol: Column = split(lower(trim(col("text"))), " ")

  /** Distinct 3-token shingles (doc shorter than 3 tokens → the whole
    * normalized text), with `toks` pre-materialized so the slice lambda
    * references a column, not a re-split (see q30/q40 lambda trap).
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame =
    // one compiled pass (graft.functions.ShingleSet) replacing the
    // interpreted transform/slice/distinct chain — bit-identical
    // semantics including the <3-token whole-norm fallback
    // (ShingleSetSpec pins the equivalence), oracles unchanged
    Tables.documentsSharded(spark, dir)
      .select(col("doc_id"),
        graft.functions.ShingleSet.shingle_set(
          split(lower(trim(col("text"))), " "), 3).as("sh"))

  // --------------------------------------------------------------------
  // q212 — contamination REPORT across n-gram levels: the overlap
  // audit an eval-integrity review runs before fixing a single
  // decontamination n. 3-gram overlap over-flags (common phrases),
  // 8-gram under-flags (only verbatim spans) — the report quantifies
  // that tradeoff on THIS corpus: per n ∈ {3, 5, 8}, how many
  // train-bench doc pairs share at least one n-shingle and how many
  // distinct train docs a decontamination pass at that n would drop.
  // The q67 join shape at each level (no broadcast hint — the bench
  // slice scales with the corpus; AQE upgrades when genuinely small).
  // Scale notes (100 TB): three passes, a bounded constant — each one
  // shingle explode + one shuffled equi-join on the shingle key + a
  // distinct + two-counter aggregate; levels don't share state, so a
  // production run schedules them as independent jobs. Output is 3
  // rows.
  val ContamLevels: Seq[Int] = Seq(3, 5, 8)

  def q212ContaminationLevels(spark: SparkSession, dir: String): DataFrame =
    ContamLevels.map { n =>
      val sh = Tables.documentsSharded(spark, dir)
        .select(col("doc_id"),
          graft.functions.ShingleSet.shingle_set(toksCol, n).as("sh"))
      val bench = sh.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_id"), explode_outer(col("sh")).as("g"))
      val train = sh.filter(col("doc_id") % 5 === 0 && col("doc_id") % 97 =!= 0)
        .select(col("doc_id").as("train_id"), explode_outer(col("sh")).as("g"))
      train.join(bench, Seq("g"))
        .select(col("train_id"), col("bench_id")).distinct()
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("train_id")).as("n_contaminated"))
        .select(lit(n).as("ngram"), col("n_pairs"), col("n_contaminated"))
    }.reduce(_ unionByName _).orderBy(col("ngram"))

  val q212Oracle: String = {
    val level = (n: Int) =>
      s"""SELECT $n AS ngram, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(count(DISTINCT train_id) AS BIGINT) AS n_contaminated
         |FROM (
         |  SELECT DISTINCT train_id, bench_id FROM (
         |    SELECT doc_id AS train_id, unnest(s) AS g FROM sh$n
         |    WHERE doc_id % 5 = 0 AND doc_id % 97 <> 0) t
         |  JOIN (
         |    SELECT doc_id AS bench_id, unnest(s) AS g FROM sh$n
         |    WHERE doc_id % 97 = 0) b USING (g))""".stripMargin
    val shingles = (n: Int) =>
      s"""sh$n AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= $n
         |    THEN list_transform(generate_series(1, len(t) - ${n - 1}),
         |           i -> array_to_string(t[i:i+${n - 1}], ' '))
         |    ELSE [array_to_string(t, ' ')] END) AS s
         |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
         |        FROM documents))""".stripMargin
    s"""WITH ${ContamLevels.map(shingles).mkString(",\n")}
       |${ContamLevels.map(level).mkString("\nUNION ALL\n")}
       |ORDER BY ngram""".stripMargin
  }

  // --------------------------------------------------------------------
  // q67 — benchmark contamination: documents sharing >= 2 distinct
  // 3-shingles with a held-out "benchmark" slice (doc_id % 97 == 0) are
  // flagged with the benchmark doc and the overlap count — the
  // decontamination step every LLM training pipeline runs before
  // training. explode_outer instead of explode: it infers no
  // size(sh) > 0 filter, so the shingle pipeline isn't duplicated into
  // a pushed-down predicate (sh is never empty by construction).
  val ContaminationMinShingles = 2

  def q67Contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"), explode_outer(col("sh")).as("g"))
    val train = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id").as("train_id"), explode_outer(col("sh")).as("g"))
    // NO broadcast hint: on real data the benchmark suite is tiny and
    // AQE broadcasts it at runtime, but the %97 fixture slice SCALES
    // WITH the corpus — forcing a broadcast of a corpus-scaled set is
    // exactly the mistake q56 documents avoiding (a 100 TB corpus's
    // slice would blow the broadcast limit). The shuffled join is the
    // safe default; AQE upgrades it when the bench side is small.
    train.join(bench, Seq("g"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContaminationMinShingles)
      .orderBy(col("train_id"), col("bench_id"))
  }

  val q67Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
       |    THEN list_transform(generate_series(1, len(t) - 2),
       |           i -> array_to_string(t[i:i+2], ' '))
       |    ELSE [array_to_string(t, ' ')] END) AS s
       |  FROM toks),
       |bench AS (SELECT doc_id AS bench_id, unnest(s) AS g FROM sh WHERE doc_id % 97 = 0),
       |train AS (SELECT doc_id AS train_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0)
       |SELECT train_id, bench_id, count(*) AS n_shared
       |FROM train JOIN bench USING (g)
       |GROUP BY 1, 2 HAVING count(*) >= $ContaminationMinShingles
       |ORDER BY train_id, bench_id""".stripMargin

  // --------------------------------------------------------------------
  // q86 — bloom-prefiltered contamination: q67's semantics with the
  // 100-TB scan shape. q67 ships EVERY train shingle into the join
  // machinery; here a bloom filter built over the benchmark shingles
  // (Spark's own BloomFilterAggregate / BloomFilterMightContain pair —
  // the expressions behind InjectRuntimeFilter) is evaluated scan-side
  // on the train shingles, so only probable hits reach the exact join
  // and its (train_id, bench_id) aggregation. The bloom has no false
  // negatives, so the exact join over survivors returns byte-identical
  // q67 output (false positives are dropped by the join itself).
  //
  // Contract: unlike q67 (whose bench slice deliberately scales with
  // the corpus), the bloom form assumes a BOUNDED benchmark suite —
  // the realistic case: held-out eval sets are millions of shingles at
  // most. The bloom is sized for 2^20 items / 2^23 bits (1 MiB, ~6
  // hashes); its bytes travel as a SCALAR SUBQUERY, exactly like
  // Spark's injected runtime filters, so no megabyte literal ever
  // appears in the plan or its explain string, and the whole query
  // stays ONE lazy plan (nothing executes at query-construction time).
  private val BloomEstItems = 1L << 20
  private val BloomNumBits = 1L << 23

  /** The bloom prefilter: rows of `train` whose `g` might be in
    * `bench`'s `g` set. Both sides hash with xxhash64 so insert and
    * probe agree; superset-of-members is guaranteed (no false
    * negatives), which the spec pins.
    */
  private[operators] def bloomPrefilter(bench: DataFrame, train: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bloom = bench.select(ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("g"))),
        Literal(BloomEstItems), Literal(BloomNumBits)).toAggregateExpression()).as("bf"))
    train.filter(ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(ColumnBridge.scalarSubquery(bloom)),
      ColumnBridge.expression(xxhash64(col("g"))))))
  }

  def q86BloomContamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"), explode_outer(col("sh")).as("g"))
    val train = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id").as("train_id"), explode_outer(col("sh")).as("g"))
    // exact verify over the bloom survivors only — same join/aggregate
    // as q67, fed ~fpp of the corpus instead of all of it
    bloomPrefilter(bench.select(col("g")), train)
      .join(bench, Seq("g"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContaminationMinShingles)
      .orderBy(col("train_id"), col("bench_id"))
  }

  /** Same result as q67 by construction — the oracle IS q67's. */
  val q86Oracle: String = q67Oracle

  // --------------------------------------------------------------------
  // q68 — per-document top-3 TF-IDF terms. df is derived from the
  // (doc, term) aggregate — the corpus is tokenized and shuffled once.
  // Ranking sorts on the ROUNDED score (then term) so both engines
  // break ties identically regardless of last-ulp ln() differences.
  // The rounded score itself is NOT emitted (settled round 10): the
  // hashed columns are the exact BIGINT model counts (tf, df, n_docs)
  // from which tfidf = tf·ln(n_docs/df) is one log away — a rounded
  // transcendental in a hashed column is an engine-build lottery (see
  // q158/q94). A rank flip needs a second score inside the same 1e-6
  // boundary straddle — two compounded ulp-rare events.
  def q68TfidfTopterms(spark: SparkSession, dir: String): DataFrame = {
    val ex = Tables.documentsSharded(spark, dir)
      .select(col("doc_id"), explode(toksCol).as("tok"))
    val tf = ex.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // n_docs joins in as a 1-row aggregate so the whole query stays ONE
    // lazy plan (the previous eager .count() fired a job whenever the
    // query map was merely invoked for its plan, and snapshotted the
    // count at build time). The optimizer-opaque key is shared — see
    // graft.plans.Opaque for why a plain literal collapses to the
    // banned cartesian. AQE broadcasts the 1-row side.
    val nd = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
      .select(col("n_docs"),
        graft.plans.Opaque.zeroKey(col("n_docs")).as("_k"))
    val scored = tf.join(df, Seq("tok"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("df")))
      .join(nd, Seq("_k"))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("n_docs"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("tok"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok"), col("tf"), col("df"),
        col("n_docs"))
      .orderBy(col("doc_id"), col("rk"))
  }

  val q68Oracle: String =
    """WITH ex AS (
      |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
      |  FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM ex GROUP BY 1, 2),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tok, tf, df, (SELECT n_docs FROM n) AS n_docs,
      |    round(tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df), 6) AS tfidf
      |  FROM tf JOIN df USING (tok)),
      |ranked AS (
      |  SELECT doc_id, tok, tf, df, n_docs,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS INTEGER) AS rk
      |  FROM scored)
      |SELECT doc_id, rk, tok, tf, df, n_docs FROM ranked WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  // --------------------------------------------------------------------
  // q69 — repetition score: the most frequent token's share of the
  // document — the boilerplate/spam signal quality filters threshold
  // on. Distributed two-level aggregate, not a per-row frequency map.
  def q69Repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select(col("doc_id"), explode(toksCol).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_toks"), max(col("c")).as("max_tok"))
      .select(col("doc_id"), col("n_toks"), col("max_tok"),
        round(col("max_tok").cast("double") / col("n_toks"), 6).as("repetition"))
      .orderBy(col("doc_id"))

  val q69Oracle: String =
    """WITH ex AS (
      |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS tok
      |  FROM documents),
      |cnt AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks, CAST(max(c) AS BIGINT) AS max_tok,
      |  round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS repetition
      |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q70 — PII scrubbing: email addresses and long digit runs are
  // replaced with typed placeholders, with a per-row redaction count.
  // The corpus is synthetic and clean, so deterministic fake PII is
  // appended first — the scrub then provably removes it (the spec
  // asserts no residue). Patterns stay in the portable regex subset
  // Java and RE2 agree on. Scan-side projection, zero shuffle.
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val IdRe = "[0-9]{6,}"

  def q70PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com id "),
      (col("doc_id") * 7919 + 100000).cast("string"))
    Tables.documentsSharded(spark, dir)
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        // count ID runs on the email-scrubbed string, not the raw one:
        // a 6+-digit email local part would otherwise be counted twice
        // while producing a single <EMAIL> placeholder
        (regexp_count(col("dirty"), lit(EmailRe)) +
          regexp_count(regexp_replace(col("dirty"), EmailRe, "<EMAIL>"), lit(IdRe)))
          .cast("bigint").as("n_redacted"),
        regexp_replace(regexp_replace(col("dirty"), EmailRe, "<EMAIL>"),
          IdRe, "<ID>").as("scrubbed"))
      .orderBy(col("doc_id"))
  }

  val q70Oracle: String =
    s"""WITH dirty AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com id '
       |      || CAST(doc_id * 7919 + 100000 AS VARCHAR) AS dirty
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(dirty, '$EmailRe'))
       |    + len(regexp_extract_all(
       |        regexp_replace(dirty, '$EmailRe', '<EMAIL>', 'g'), '$IdRe')) AS BIGINT) AS n_redacted,
       |  regexp_replace(regexp_replace(dirty, '$EmailRe', '<EMAIL>', 'g'),
       |    '$IdRe', '<ID>', 'g') AS scrubbed
       |FROM dirty ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q71 — deterministic source-mixture sampling: per-source keep rates
  // applied via an md5(doc_id:text) threshold — the reproducible
  // "dataset mixture" step that downsamples over-represented sources.
  // Pure scan-side filter; the same row is kept on every run and every
  // engine, unlike rand()-based sampling.
  def q71SourceMixture(spark: SparkSession, dir: String): DataFrame = {
    val key = substring(
      md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))), 1, 4)
    val threshold = when(col("source") === "src0", "8000")
      .when(col("source") === "src1", "4000").otherwise("2000")
    Tables.documentsSharded(spark, dir)
      .filter(key < threshold)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val q71Oracle: String =
    """SELECT doc_id, source, lang FROM documents
      |WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 4) <
      |  CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000' ELSE '2000' END
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q74 — sequence packing: concat-then-chunk the corpus into
  // fixed-token training windows (the GPT-style pretraining packing
  // step). Documents are concatenated in doc_id order WITHIN a shard
  // (doc_id % 32) and each doc lands in the window its first token
  // starts in; output is one row per (shard, window). The running
  // offset is a per-shard window sum — partitioned, never global, so
  // shards pack in parallel and the shard count scales with the
  // cluster. Integer DIV keeps window ids exact in both engines.
  val SeqLen = 2048
  val PackShards = 32

  /** (doc_id, shard, n_tokens) from any (doc_id, text, ...) input —
    * the packing front-end, parameterized so q81 can feed the KEPT
    * document set instead of the whole corpus.
    */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), (col("doc_id") % PackShards).cast("int").as("shard"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"))

  /** The packed-window table without q74's presentation sort — q78/q81
    * consume this directly so the corpus-sized window set is never
    * globally ordered just to be re-shuffled by shard.
    */
  private def packedWindowsOf(docs: DataFrame): DataFrame = {
    // ROWS frame explicitly: Spark's default is RANGE, which on an
    // order-key tie would sum both peers into both rows' totals while
    // the oracle's ROWS frame gives distinct prefix sums
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("win", expr(s"start_off DIV $SeqLen"))
      .groupBy(col("shard"), col("win"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("win_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  private def packedWindows(spark: SparkSession, dir: String): DataFrame =
    packedWindowsOf(tokenized(Tables.documentsSharded(spark, dir)))

  def q74SequencePacking(spark: SparkSession, dir: String): DataFrame =
    packedWindows(spark, dir).orderBy(col("shard"), col("win"))

  // --------------------------------------------------------------------
  // q90 — SPLIT-aware sequence packing: q74 assigns each document to
  // the window its first token starts in, so a window can overflow or
  // underfill by up to one document — padding waste the trainer pays
  // for. The production packer SPLITS documents across window
  // boundaries: a doc whose token span [start, end) straddles windows
  // contributes a span row to every window it touches, and every
  // window in a shard except the last holds EXACTLY SeqLen tokens
  // (asserted by SplitPackingSpec — the zero-padding invariant).
  // Same scale shape as q74: the running offset is a per-shard ROWS
  // window (never global), the span explode is per-row arithmetic
  // (a doc touches ceil(n/SeqLen)+1 windows at most), and the final
  // per-(shard, win) aggregate rides the same shard partitioning.
  /** q90's window table without the presentation sort — q214's waste
    * audit aggregates it directly.
    */
  private def splitWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = tokenized(Tables.documentsSharded(spark, dir))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("end_off", col("start_off") + col("n_tokens"))
    val spans = offs
      .withColumn("win", explode(sequence(
        expr(s"start_off DIV $SeqLen"), expr(s"(end_off - 1) DIV $SeqLen"))))
      .withColumn("tok_in_win",
        least((col("win") + 1) * SeqLen, col("end_off"))
          - greatest(col("win") * SeqLen, col("start_off")))
    spans.groupBy(col("shard"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in_win")).as("win_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }

  def q90SplitPacking(spark: SparkSession, dir: String): DataFrame =
    splitWindows(spark, dir).orderBy(col("shard"), col("win"))

  // --------------------------------------------------------------------
  // q214 — PACKING-WASTE audit: what the two packers actually cost.
  // q74's first-token assignment can underfill a window (padding the
  // trainer burns compute on) or overflow it (tokens a fixed-length
  // loader truncates); q90's split packer holds every non-final shard
  // window at exactly SeqLen. This report prices both on the same
  // corpus — per strategy: window count, token mass, total underfill
  // and total overflow vs the SeqLen capacity — the number that
  // justifies (or not) the split packer's extra span explode. Padding
  // fraction ≈ underfill / (n_windows·SeqLen) is a consumer-side
  // divide, kept out of the hash.
  // Scale notes (100 TB): both window tables ride the q74/q90 shapes
  // (per-shard ROWS windows, never global); the audit adds one
  // map-side-combined 2×4-counter aggregate per strategy over window
  // rows (corpus/SeqLen of them). Output is 2 rows.
  def q214PackingWaste(spark: SparkSession, dir: String): DataFrame = {
    def audit(wins: DataFrame, name: String): DataFrame = wins
      .agg(count(lit(1)).as("n_windows"),
        sum(col("win_tokens")).as("tokens"),
        sum(greatest(lit(0L), lit(SeqLen.toLong) - col("win_tokens")))
          .as("underfill"),
        sum(greatest(lit(0L), col("win_tokens") - lit(SeqLen.toLong)))
          .as("overflow"))
      .select(lit(name).as("strategy"), col("n_windows"), col("tokens"),
        col("underfill"), col("overflow"))
    audit(packedWindows(spark, dir), "first_token")
      .unionByName(audit(splitWindows(spark, dir), "split"))
      .orderBy(col("strategy"))
  }

  val q214Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
       |  FROM toks),
       |ft AS (
       |  SELECT shard, CAST(start_off // $SeqLen AS BIGINT) AS win,
       |    CAST(sum(n_tokens) AS BIGINT) AS win_tokens
       |  FROM offs GROUP BY 1, 2),
       |spans AS (
       |  SELECT doc_id, shard, start_off, start_off + n_tokens AS end_off,
       |    CAST(unnest(generate_series(CAST(start_off // $SeqLen AS BIGINT),
       |      CAST((start_off + n_tokens - 1) // $SeqLen AS BIGINT))) AS BIGINT) AS win
       |  FROM offs),
       |sp AS (
       |  SELECT shard, win,
       |    CAST(sum(least((win + 1) * $SeqLen, end_off)
       |      - greatest(win * $SeqLen, start_off)) AS BIGINT) AS win_tokens
       |  FROM spans GROUP BY 1, 2),
       |audit AS (
       |  SELECT 'first_token' AS strategy, count(*) AS n_windows,
       |    CAST(sum(win_tokens) AS BIGINT) AS tokens,
       |    CAST(sum(greatest(0, $SeqLen - win_tokens)) AS BIGINT) AS underfill,
       |    CAST(sum(greatest(0, win_tokens - $SeqLen)) AS BIGINT) AS overflow
       |  FROM ft
       |  UNION ALL
       |  SELECT 'split', count(*),
       |    CAST(sum(win_tokens) AS BIGINT),
       |    CAST(sum(greatest(0, $SeqLen - win_tokens)) AS BIGINT),
       |    CAST(sum(greatest(0, win_tokens - $SeqLen)) AS BIGINT)
       |  FROM sp)
       |SELECT * FROM audit ORDER BY strategy""".stripMargin

  val q90Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, shard, start_off, start_off + n_tokens AS end_off,
       |    CAST(unnest(generate_series(CAST(start_off // $SeqLen AS BIGINT),
       |      CAST((start_off + n_tokens - 1) // $SeqLen AS BIGINT))) AS BIGINT) AS win
       |  FROM offs)
       |SELECT shard, win, count(*) AS n_docs,
       |  CAST(sum(least((win + 1) * $SeqLen, end_off)
       |    - greatest(win * $SeqLen, start_off)) AS BIGINT) AS win_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM spans GROUP BY 1, 2 ORDER BY shard, win""".stripMargin

  val q74Oracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
       |  FROM docs)
       |SELECT shard, CAST(start_off // $SeqLen AS BIGINT) AS win, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM offs GROUP BY 1, 2 ORDER BY shard, win""".stripMargin

  // --------------------------------------------------------------------
  // q78 — deterministic shard writer: the last step of the training
  // pipeline, after q74's packing. Each packed window gets a stable
  // output shard from the md5 of its content key (engine-portable —
  // the oracle replays it; a Spark-only deployment would use
  // xxhash64), the windows are hash-SHUFFLED once on that shard and
  // written as one parquet directory per shard, and the oracle-checked
  // result is the per-shard MANIFEST (n_windows, n_tokens, content
  // fingerprint) computed from the READ-BACK files — so the gate
  // covers the write itself, not just the plan that fed it.
  // Scale notes (100 TB): one repartition on out_shard (the
  // "deterministic global shuffle"), no global sort anywhere —
  // packedWindows is consumed unordered; OutShards would be thousands
  // at scale (it only bounds files per directory). The content
  // fingerprint is a commutative bit_xor of per-row 48-bit md5
  // prefixes — order-insensitive, so no per-shard sort or collect_list
  // is ever needed (window keys are unique by construction:
  // shard:win is the group key of packedWindows).
  val OutShards = 16

  /** Content key + output shard for a packed-window frame — shared by
    * q78 (which writes, then manifests the read-back) and q81 (which
    * manifests in-plan).
    */
  private def withShardKey(packed: DataFrame): DataFrame = packed
    .withColumn("wkey", concat_ws(":", col("shard"), col("win"), col("n_docs"),
      col("win_tokens"), col("first_doc"), col("last_doc")))
    .withColumn("out_shard",
      conv(substring(md5(col("wkey")), 1, 1), 16, 10).cast("int"))

  /** Per-shard manifest of any (out_shard, win_tokens, wkey) frame. */
  private def manifestOf(df: DataFrame): DataFrame = df
    .groupBy(col("out_shard"))
    .agg(count(lit(1)).as("n_windows"),
      sum(col("win_tokens")).as("n_tokens"),
      expr("bit_xor(CAST(conv(substring(md5(wkey), 1, 12), 16, 10) AS BIGINT))")
        .as("content_hash"))
    .orderBy(col("out_shard"))

  def q78ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val keyed = withShardKey(packedWindows(spark, dir))
    // output root resolved through the Hadoop FS API and namespaced per
    // query + input dir (see ShardPaths — cluster-safe default, no
    // collision with q80 under the graft.shards.dir override)
    val outDir = graft.sources.ShardPaths.resolve(spark, "q78", dir)
    keyed
      .repartition(OutShards, col("out_shard"))
      .write.mode("overwrite").partitionBy("out_shard").parquet(outDir)
    manifestOf(spark.read.parquet(outDir))
  }

  /** The DuckDB packing + manifest tail over a caller-supplied `docs`
    * CTE chain — the SQL twin of tokenized→packedWindowsOf→withShardKey
    * →manifestOf, shared by q78 and q81 so the two oracles cannot
    * drift. `docsCtes` must end with a CTE named `docs` of
    * (doc_id, shard, n_tokens).
    */
  private def sqlPackManifest(docsCtes: String): String =
    s"""WITH $docsCtes,
       |offs AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
       |  FROM docs),
       |packed AS (
       |  SELECT shard, CAST(start_off // $SeqLen AS BIGINT) AS win, count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS win_tokens,
       |    min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |  FROM offs GROUP BY 1, 2),
       |keyed AS (
       |  SELECT win_tokens,
       |    shard || ':' || win || ':' || n_docs || ':' || win_tokens || ':'
       |      || first_doc || ':' || last_doc AS wkey
       |  FROM packed)
       |SELECT CAST(strpos('0123456789abcdef', substring(md5(wkey), 1, 1)) - 1 AS INTEGER)
       |    AS out_shard,
       |  count(*) AS n_windows,
       |  CAST(sum(win_tokens) AS BIGINT) AS n_tokens,
       |  bit_xor(CAST('0x' || substring(md5(wkey), 1, 12) AS BIGINT)) AS content_hash
       |FROM keyed GROUP BY 1 ORDER BY out_shard""".stripMargin

  val q78Oracle: String = sqlPackManifest(
    s"""docs AS (
       |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents)""".stripMargin)

  // --------------------------------------------------------------------
  // q81 — the training pipeline END-TO-END as one oracle-checked lazy
  // plan: minhash near-dup keep/discard (q56's keeper set) → sequence
  // packing over ONLY the kept documents (q74's windows) → per-shard
  // manifest (q78's key/hash, computed in-plan; the file write itself
  // is q78's covered concern). This is the composition the operator
  // tier exists for, and the whole chain — LSH banding, verify,
  // anti join, per-shard prefix sums, shard hashing — is replayed by
  // one DuckDB query, so the gate certifies the PIPELINE, not just its
  // stages. Scale notes: no stage collects or broadcasts a corpus-
  // sized side; the sorts inside q56/q32 compositions are eliminated
  // (keeperSet is the sort-free core), so the plan is the one you
  // would run at 100 TB, end to end.
  def q81TrainingPipeline(spark: SparkSession, dir: String): DataFrame = {
    val kept = Dedup.keeperSet(spark, dir).select(col("doc_id"))
    val docs = Tables.documentsSharded(spark, dir)
      .join(kept, Seq("doc_id"))
    manifestOf(withShardKey(packedWindowsOf(tokenized(docs))))
  }

  val q81Oracle: String = {
    val pairs = Dedup.q32Oracle.replace("ORDER BY doc_a, doc_b", "")
    sqlPackManifest(
      s"""pairs AS (
         |$pairs
         |),
         |docs AS (
         |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents
         |  WHERE doc_id % 5 = 0
         |    AND doc_id NOT IN (SELECT doc_b FROM pairs))""".stripMargin)
  }

  // --------------------------------------------------------------------
  // q82 — the FULL curation pipeline as one oracle-checked lazy plan:
  //   sample → decontaminate (q67's flags as an anti join, benchmark
  //   slice dropped) → quality gates (q29 composite ≥ 0.55 AND q69
  //   repetition ≤ 0.2, both on ROUNDED scores so the threshold
  //   comparison is engine-stable) → PII scrub (q70's regex chain over
  //   the real text — value-neutral on the clean fixture corpus but a
  //   real plan stage, and downstream tokenization reads the SCRUBBED
  //   text) → source-mixture sampling (q71's md5 threshold, keyed on
  //   the scrubbed text) → minhash near-dup keep/discard (q32/q56 over
  //   the SURVIVORS, not the raw sample) → sequence packing → per-shard
  //   manifest. One DuckDB query replays every stage, so the gate
  //   certifies the pipeline a pretraining run would execute — q81's
  //   chain with the whole curation tier wired in ahead of dedup.
  // Scale notes (100 TB): the stages compose without materialization —
  // no stage collects, caches, or broadcasts a corpus-sized side. The
  // contamination join shuffles on the shingle key with the benchmark
  // side AQE-broadcast when genuinely small (same contract as q67);
  // the quality gates are one explode+two-level aggregate joined back
  // on doc_id; scrub and mixture are scan-side projections fused into
  // the same stage; dedup and packing inherit q32/q74's shapes. The
  // per-doc stage columns (quality, repetition) ride the doc_id
  // partitioning, so the gate joins co-locate under one exchange.
  val QualityMin = 0.55
  val RepetitionMax = 0.2

  /** Stage 1 — decontaminated sample: the %5 sample minus the benchmark
    * slice and minus docs sharing ≥ ContaminationMinShingles 3-shingles
    * with any benchmark doc. The train side is restricted to the sample
    * (flags are only needed for docs the pipeline might keep).
    */
  private[operators] def decontaminated(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val bench = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"), explode_outer(col("sh")).as("g"))
    val train = sh.filter(col("doc_id") % 5 === 0 && col("doc_id") % 97 =!= 0)
      .select(col("doc_id").as("train_id"), explode_outer(col("sh")).as("g"))
    val contaminated = train.join(bench, Seq("g"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= ContaminationMinShingles)
      .select(col("train_id").as("doc_id")).distinct()
    Tables.documentsSharded(spark, dir)
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Stage 2 — quality-gated: q29's composite and q69's repetition,
    * thresholded on the rounded scores. The composite is row-local, so
    * it is a scan-side FILTER fused into the stage-1 output (a join
    * would re-derive the whole decontamination subtree for a value
    * computable in place); only the repetition score — which needs the
    * explode + two-level aggregate — joins back on doc_id.
    */
  /** q29's composite quality score as a row-local Column over
    * (text, n_chars) — ONE definition shared by the batch gate and the
    * streaming gate (q88), so the two cannot drift.
    */
  private[graft] def qualityScoreCol: Column = {
    val toks = split(col("text"), " ")
    val nToks = size(toks).cast("bigint")
    val nUniq = size(array_distinct(toks)).cast("bigint")
    val punct = (length(col("text"))
      - length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("bigint")
    round(lit(0.4) * least(lit(1.0), nToks / 100.0)
      + lit(0.4) * (nUniq.cast("double") / nToks)
      + lit(0.2) * (lit(1.0) - punct.cast("double") / col("n_chars")), 6)
  }

  private[operators] def qualityGated(docs: DataFrame): DataFrame = {
    val qualityOk = docs.filter(qualityScoreCol >= QualityMin)
    val repetition = qualityOk
      .select(col("doc_id"), explode(toksCol).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")).cast("double") / sum(col("c")), 6).as("repetition"))
      .filter(col("repetition") <= RepetitionMax)
    qualityOk.join(repetition.select(col("doc_id")), Seq("doc_id"))
  }

  /** Stages 3+4 — PII-scrubbed text, then the mixture filter keyed on
    * the scrubbed text (one fused scan-side projection+filter).
    */
  private[operators] def scrubbedAndMixed(docs: DataFrame): DataFrame = {
    val scrubbed = docs.select(col("doc_id"), col("source"),
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        IdRe, "<ID>").as("text"))
    val key = substring(
      md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))), 1, 4)
    val threshold = when(col("source") === "src0", "8000")
      .when(col("source") === "src1", "4000").otherwise("2000")
    scrubbed.filter(key < threshold)
  }

  /** The ROW-LOCAL slice of the curation gate (quality ≥ min → PII
    * scrub → mixture filter): every stage is a projection or filter, so
    * the SAME function applies unchanged to a batch frame or a
    * streaming one — q88 runs it over a document stream and pins the
    * batch/stream parity. The per-doc aggregates (repetition) and
    * cross-doc joins (contamination, dedup) are deliberately excluded:
    * they need shuffles/state and live in the batch pipeline (q82).
    */
  private[graft] def rowLocalGate(docs: DataFrame): DataFrame =
    scrubbedAndMixed(docs.filter(qualityScoreCol >= QualityMin))

  /** Stage 5 — minhash near-dup keep/discard over the survivors. */
  private[operators] def dedupKept(docs: DataFrame): DataFrame = {
    val pairs = Dedup.minhashPairsOf(
      docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks")))
    // shuffled anti join, same contract as q56: the discard set scales
    // with the corpus, AQE downgrades to broadcast when small
    val discards = pairs.select(col("doc_b").as("doc_id")).distinct()
    docs.join(discards, Seq("doc_id"), "left_anti")
  }

  def q82CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    // The two multi-consumer stage boundaries are PERSISTED cut-points
    // (StageBoundary), not in-plan .cache(): the decontaminated sample
    // feeds both quality-gate branches (scan filter + repetition
    // aggregate), and the post-mixture survivors feed dedupKept twice
    // (pair scan + anti-join left side) — unmaterialized, each consumer
    // re-derives the whole upstream chain and the contamination join
    // ran 4x (5.7s → 3.4s at sf0.1 with cut-points). A session cache
    // paid the 22.5 s sf0.1 fill once per SESSION (every bench/verify
    // run); the persisted boundary pays it once per DATASET, which is
    // what a 100 TB pipeline run does anyway (executor memory cannot
    // hold a corpus intermediate; restarts must not re-run upstream
    // stages). Both cuts are the stage MINIMA (decontaminated ≈ 2/3 of
    // the sample, mixture ≈ 13%). The boundary is keyed by the input
    // listing's (path, length, mtime) fingerprint — any file add /
    // remove / resize / rewrite invalidates it; the one blind spot is
    // a same-size in-place rewrite inside the FS's mtime granularity
    // (regenerated fixtures should delete-then-write, which the driver
    // does).
    val decon = graft.sources.StageBoundary(spark, "q82s1", dir)(
      decontaminated(spark, dir))
    val mixed = graft.sources.StageBoundary(spark, "q82s2", dir)(
      scrubbedAndMixed(qualityGated(decon)))
    manifestOf(withShardKey(packedWindowsOf(tokenized(dedupKept(mixed)))))
  }

  val q82Oracle: String = {
    val pairs = Dedup.sqlMinhashPairs("s4")
    sqlPackManifest(
      s"""shAll AS (
         |  SELECT doc_id, list_distinct(CASE WHEN len(t) >= 3
         |    THEN list_transform(generate_series(1, len(t) - 2),
         |           i -> array_to_string(t[i:i+2], ' '))
         |    ELSE [array_to_string(t, ' ')] END) AS s
         |  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
         |        FROM documents)),
         |bench AS (
         |  SELECT doc_id AS bench_id, unnest(s) AS g FROM shAll WHERE doc_id % 97 = 0),
         |train AS (
         |  SELECT doc_id AS train_id, unnest(s) AS g FROM shAll
         |  WHERE doc_id % 5 = 0 AND doc_id % 97 <> 0),
         |contam AS (
         |  SELECT DISTINCT train_id AS doc_id FROM (
         |    SELECT train_id, bench_id FROM train JOIN bench USING (g)
         |    GROUP BY 1, 2 HAVING count(*) >= $ContaminationMinShingles)),
         |s1 AS (
         |  SELECT * FROM documents
         |  WHERE doc_id % 5 = 0 AND doc_id % 97 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |qual AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id,
         |      len(string_split(text, ' ')) AS n_tokens,
         |      len(list_distinct(string_split(text, ' '))) AS n_uniq,
         |      len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct,
         |      n_chars
         |    FROM s1)
         |  WHERE round(0.4 * least(1.0, n_tokens / 100.0)
         |      + 0.4 * (CAST(n_uniq AS DOUBLE) / n_tokens)
         |      + 0.2 * (1.0 - CAST(punct AS DOUBLE) / n_chars), 6) >= $QualityMin),
         |rep AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS r
         |    FROM (SELECT doc_id, tok, count(*) AS c
         |          FROM (SELECT doc_id,
         |                  unnest(string_split(lower(trim(text)), ' ')) AS tok
         |                FROM s1)
         |          GROUP BY 1, 2)
         |    GROUP BY doc_id)
         |  WHERE r <= $RepetitionMax),
         |s2 AS (
         |  SELECT s1.* FROM s1 JOIN qual USING (doc_id) JOIN rep USING (doc_id)),
         |s3 AS (
         |  SELECT doc_id, source,
         |    regexp_replace(regexp_replace(text, '$EmailRe', '<EMAIL>', 'g'),
         |      '$IdRe', '<ID>', 'g') AS text
         |  FROM s2),
         |s4 AS (
         |  SELECT doc_id, text FROM s3
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 4) <
         |    CASE source WHEN 'src0' THEN '8000' WHEN 'src1' THEN '4000'
         |      ELSE '2000' END),
         |pairs AS (
         |$pairs
         |),
         |docs AS (
         |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM s4
         |  WHERE doc_id NOT IN (SELECT doc_b FROM pairs))""".stripMargin)
  }

  // --------------------------------------------------------------------
  // q104 — TOKEN-budget mixture rebalancing: q71 samples by document
  // count with fixed per-source rates; the mixture a trainer actually
  // specifies is TOKEN shares ("50% src0, 30% src1, ..."), and the
  // feasible corpus is bound by the scarcest source. Given integer
  // weights w_s, the feasible total is T = min_s(avail_s·Σw ÷ w_s),
  // each source's budget is B_s = w_s·T ÷ Σw, and docs are accepted in
  // deterministic md5 order while the running token sum stays within
  // budget — all integer arithmetic, so both engines agree exactly.
  // The plan stays ONE lazy tree: per-source availability is a 20-row
  // aggregate, Σw is DERIVED from the sources actually present (a
  // hardcoded sum would silently mis-budget a corpus with a different
  // source set while the oracle, sharing the constant, still matched),
  // and both 1-row values join back through the shared
  // optimizer-opaque key (graft.plans.Opaque).
  // Scale notes (100 TB): the per-source running sum is a window
  // partitioned by source — fine while sources are few thousand; a
  // corpus with giant single sources swaps it for the two-phase
  // sharded cumsum (q74/SurrogateKeys shape: per-(source, shard)
  // sums + shard offsets). The acceptance hash is per-row codegen.
  private def mixWeight: Column =
    when(col("source") === "src0", 3L)
      .when(col("source") === "src1", 2L).otherwise(1L)

  def q104TokenMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir).select(
      col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
      md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("h"))
      .withColumn("w", mixWeight)
    val avail = docs.groupBy(col("source"), col("w"))
      .agg(sum(col("n_tokens")).as("avail"))
    val sw = avail.agg(sum(col("w")).as("sumw"))
      .select(col("sumw"), graft.plans.Opaque.zeroKey(col("sumw")).as("_k"))
    val t = avail.withColumn("_k", graft.plans.Opaque.zeroKey(col("w")))
      .join(sw, Seq("_k"))
      .agg(min(expr("avail * sumw DIV w")).as("t"), max(col("sumw")).as("sumw"))
      .select(col("t"), col("sumw"), graft.plans.Opaque.zeroKey(col("t")).as("_k"))
    val win = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_k", graft.plans.Opaque.zeroKey(col("n_tokens")))
      .join(t, Seq("_k"))
      .withColumn("budget", expr("w * t DIV sumw"))
      .withColumn("cum", sum(col("n_tokens")).over(win))
      .filter(col("cum") <= col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val q104Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h,
      |    CAST(CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
      |      ELSE 1 END AS BIGINT) AS w
      |  FROM documents),
      |avail AS (SELECT source, w, sum(n_tokens) AS a FROM d GROUP BY 1, 2),
      |sw AS (SELECT CAST(sum(w) AS BIGINT) AS sumw FROM avail),
      |t AS (SELECT min(CAST(a * (SELECT sumw FROM sw) // w AS BIGINT)) AS t
      |      FROM avail),
      |cum AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(w * (SELECT t FROM t) // (SELECT sumw FROM sw) AS BIGINT) AS budget,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      |  FROM d)
      |SELECT doc_id, source, n_tokens FROM cum
      |WHERE c <= budget ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q89 — shard COMPACTION: the maintenance pass every long-running
  // ingest needs. Streaming appends and incremental batches leave each
  // shard directory littered with small files (q80 writes one file set
  // per micro-batch); q89 simulates that state by writing the q78
  // windows fragmented (FragFactor files per shard), then compacts with
  // a content-neutral rewrite — ONE shuffle on out_shard, one file per
  // shard after — and returns the manifest of the compacted read-back.
  // The manifest is content-based (count, token sum, commutative
  // bit_xor fingerprint), so compaction MUST leave it bit-identical to
  // q78's; the oracle is therefore q78's oracle, and the spec asserts
  // manifest equality plus the file-count collapse.
  // Scale notes (100 TB): compaction shuffles only the shards being
  // compacted and never sorts; one partition per shard is the fixture
  // shape — at scale the repartition key gains a bin component
  // (floor(cumulative_bytes / target_file_size)) so a hot shard
  // rewrites into several capped files instead of one giant one, and
  // compaction runs per shard-group so the rewrite is incremental, not
  // a full-corpus pass.
  val FragFactor = 8

  def q89CompactShards(spark: SparkSession, dir: String): DataFrame = {
    val keyed = withShardKey(packedWindows(spark, dir))
    val fragDir = graft.sources.ShardPaths.resolve(spark, "q89frag", dir)
    val compactDir = graft.sources.ShardPaths.resolve(spark, "q89", dir)
    // the fragmented ingest state: keying the spread on the UNIQUE wkey
    // scatters each shard's windows over distinct writer tasks → many
    // small files per shard directory ((out_shard, win) won't do: the
    // fixture packs one window per pack-shard, so win is constantly 0)
    keyed.repartition(OutShards * FragFactor, col("out_shard"), col("wkey"))
      .write.mode("overwrite").partitionBy("out_shard").parquet(fragDir)
    // the compaction itself: all of a shard's rows hash to one
    // partition, so each shard directory rewrites to exactly one file
    spark.read.parquet(fragDir)
      .repartition(OutShards, col("out_shard"))
      .write.mode("overwrite").partitionBy("out_shard").parquet(compactDir)
    manifestOf(spark.read.parquet(compactDir))
  }

  /** Compaction is content-neutral by contract: the oracle IS q78's. */
  val q89Oracle: String = q78Oracle

  // --------------------------------------------------------------------
  // q134 — deterministic k-fold assignment: every document lands in
  // one of 5 folds by an md5-derived hash of its id — the
  // cross-validation / multi-epoch-shuffle split that must be
  // reproducible across runs AND across engines (no RNG, no
  // row-order dependence). Folds are summarized (count, char mass,
  // language spread, id range); disjointness and full coverage are
  // arithmetic consequences of `hash % k`.
  // Scale notes (100 TB): fold derivation is a scan-side codegen'd
  // projection; the summary is one map-side-combined aggregate on a
  // 5-value key. Nothing here is data-ordered, so the split is stable
  // under repartitioning and incremental corpus growth (a new doc
  // never moves an old one).
  def q134KfoldSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fold",
        (conv(substring(md5(concat(lit("fold:"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long") % 5).cast("int"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("fold"))

  val q134Oracle: String =
    """SELECT
      |  CAST(CAST('0x' || substring(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8)
      |    AS BIGINT) % 5 AS INTEGER) AS fold,
      |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      |FROM documents GROUP BY 1 ORDER BY fold""".stripMargin

  // --------------------------------------------------------------------
  // q135 — per-source document cap: keep at most 12 documents per
  // source, preferring longer ones — the domain-frequency capping web
  // corpora apply so one crawler-friendly site cannot dominate the
  // mixture (a CAP, not a rate: small sources keep everything, big
  // sources are truncated). Priority is (n_chars DESC, doc_id) — fully
  // deterministic, no RNG. Contrast with q58 (stratified RATE
  // sampling) and q104 (token-budget mixture).
  // Scale notes (100 TB): one row_number window PARTITIONED BY source
  // — per-key, skew bounded by the largest single source (salt the
  // pathological one if a source exceeds a task); the report aggregate
  // rides the same source partitioning (zero extra shuffle).
  def q135SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(bySource))
      .withColumn("kept", col("rn") <= 12)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("kept_chars"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))
  }

  val q135Oracle: String =
    """WITH ranked AS (
      |  SELECT source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN rn <= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN rn <= 12 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM ranked GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q136 — deterministic weighted sampling: each document is accepted
  // with probability proportional to its (capped) length —
  // quality-weighted downsampling with zero RNG state. The acceptance
  // test is ALL-INTEGER: a 32-bit md5-derived uniform u and weight
  // w = min(n_chars, 400)/400 accept iff u·400 < w·2³², so both
  // engines compare exact BIGINT products (a double threshold would
  // drift the boundary — the q104 lesson). Per-source acceptance
  // report; expected rate = mean weight.
  // Scale notes (100 TB): scan-side hash + integer compare, one
  // aggregate on source — zero shuffle before the group-sized agg.
  def q136WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u32 = conv(substring(md5(concat(lit("ws:"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val wNum = least(col("n_chars"), lit(400L)) // weight numerator (den 400)
    val accepted = u32 * 400L < wNum * 4294967296L
    Tables.documents(spark, dir)
      .withColumn("acc", accepted)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("acc"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("acc"), col("n_chars")).otherwise(0L)).as("sampled_chars"))
      .orderBy(col("source"))
  }

  val q136Oracle: String =
    """WITH t AS (
      |  SELECT source, n_chars,
      |    CAST('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) AS u32,
      |    CAST(least(n_chars, 400) AS BIGINT) AS wnum
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN u32 * 400 < wnum * 4294967296 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_sampled,
      |  CAST(SUM(CASE WHEN u32 * 400 < wnum * 4294967296 THEN n_chars ELSE 0 END)
      |    AS BIGINT) AS sampled_chars
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q148 — per-source token-diversity profile — the diagnostic that
  // separates natural text from templated/repeated content (low
  // diversity = boilerplate-heavy source; compare q69's within-doc
  // repetition).
  // Determinism (settled round 10): the EMITTED columns are exact
  // BIGINTs — vocab, n_tokens, and the collision mass Σc² — from
  // which a consumer recovers the Rényi-2 (collision) entropy
  // H2 = ln(N²/Σc²) with ONE log over an exact rational. The Shannon
  // entropy Σ(c/N)·ln(N/c) this query historically emitted is a
  // per-term rounded transcendental sum — an engine-build lottery in
  // a hashed column (see q158/q94) — and now lives in the spec-only
  // sourceShannonEntropy view, proven by GraphStatsSpec's BigDecimal
  // recomputation (never registered, never hashed).
  // Scale notes (100 TB): one (source, token) count — the same
  // hash-partitioned aggregate as q94's vocab, head-token skew handled
  // by map-side combine — then a source-sized rollup. Nothing
  // collected, nothing quadratic. Σc² fits BIGINT through ~3e9-token
  // heads; a 100-TB production build would widen to DECIMAL(38,0).
  def q148SourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.documentsSharded(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    cnt.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum(col("c") * col("c")).as("sum_c2"))
      .orderBy(col("source"))
  }

  /** Spec-only Shannon-entropy view (never registered, never hashed):
    * Σ (c/N)·ln(N/c), each term rounded to 6 decimals and summed as an
    * EXACT decimal — the semantic proof behind q148's integer profile,
    * driven by GraphStatsSpec.
    */
  private[graft] def sourceShannonEntropy(
      spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.documentsSharded(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("source")).agg(sum(col("c")).as("n"))
    cnt.join(tot, Seq("source"))
      .withColumn("term",
        round((col("c").cast("double") / col("n")) *
          log(col("n").cast("double") / col("c")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), max(col("n")).as("n_tokens"),
        round(sum(col("term")).cast("double"), 6).as("entropy"))
      .orderBy(col("source"))
  }

  val q148Oracle: String =
    """WITH cnt AS (
      |  SELECT source, tok, COUNT(*) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source, COUNT(*) AS vocab, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(c * c) AS BIGINT) AS sum_c2
      |FROM cnt
      |GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q149 — temperature-scaled mixture weights: sampling probabilities
  // q_i ∝ p_i^(1/T) with 1/T = 0.5 (√-damping), the multilingual /
  // multi-source rebalancing rule that upsamples small sources without
  // letting any source's share explode. Each √-share is rounded to 6
  // decimals FIRST and the normalization sums those exact decimals —
  // a raw double Σ√p would drift with partition order (q148's lesson
  // applied to a 20-row sum; cheap insurance, exact portability).
  // Contrast q104 (hard token budgets) and q71 (fixed target shares):
  // this derives the shares from the data itself.
  // Scale notes (100 TB): two tiny aggregates over a source-sized
  // frame joined back via the optimizer-opaque 1-row key (the q94
  // mechanism — a foldable key would plan the banned cartesian).
  def q149TemperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documentsSharded(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val tot = src.agg(sum(col("n_docs")).as("n"))
      .select(col("n"), graft.plans.Opaque.zeroKey(col("n")).as("_k"))
    val damped = src
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_docs")))
      .join(tot, Seq("_k"))
      .withColumn("share", round(col("n_docs").cast("double") / col("n"), 6))
      .withColumn("sq",
        round(sqrt(col("n_docs").cast("double") / col("n")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
    val z = damped.agg(sum(col("sq")).as("z"))
      .select(col("z"), graft.plans.Opaque.zeroKey(col("z")).as("_z"))
    damped.withColumn("_z", graft.plans.Opaque.zeroKey(col("sq")))
      .join(z, Seq("_z"))
      .select(col("source"), col("n_docs"), col("share"),
        round(col("sq").cast("double") / col("z").cast("double"), 6)
          .as("temp_share"))
      .orderBy(col("source"))
  }

  val q149Oracle: String =
    """WITH src AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM src),
      |damped AS (
      |  SELECT source, n_docs,
      |    round(CAST(n_docs AS DOUBLE) / (SELECT n FROM tot), 6) AS share,
      |    CAST(round(sqrt(CAST(n_docs AS DOUBLE) / (SELECT n FROM tot)), 6)
      |      AS DECIMAL(28,6)) AS sq
      |  FROM src),
      |z AS (SELECT SUM(sq) AS z FROM damped)
      |SELECT source, n_docs, share,
      |  round(CAST(sq AS DOUBLE) / CAST((SELECT z FROM z) AS DOUBLE), 6)
      |    AS temp_share
      |FROM damped ORDER BY source""".stripMargin

  // --------------------------------------------------------------------
  // q160 — deterministic source-INTERLEAVED training order WITHOUT a
  // global window: the data-ordering step of dataset assembly. Every
  // source's docs are ranked in md5-hash order (the RNG-free shuffle),
  // then round-robin-interleaved across sources — and the GLOBAL
  // sequence position falls out arithmetically instead of through the
  // banned unpartitioned window: a doc at per-source rank r in source
  // s is preceded by exactly Σ_s' min(n_s', r-1) docs from earlier
  // rounds plus the same-round docs of sources ordered before s that
  // are large enough to reach round r. The per-source size table rides
  // a 1-row sorted array through the optimizer-opaque join, so the
  // position is two scan-side higher-order functions over a ~20-element
  // array. Sources with unequal sizes drain naturally (exhausted
  // sources drop out of later rounds) — the schedule a trainer
  // actually wants.
  // Scale notes (100 TB): ONE per-source window (partition = one
  // source's docs; for a pathologically dominant source, swap in the
  // two-phase SurrogateKeys rank — same contract) and zero global
  // exchanges: seq is computed scan-side from the broadcast-sized size
  // array. The final orderBy is presentation-only.
  def q160InterleaveOrder(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.sources.Tables.documentsSharded(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("h"))
    val ranked = d.withColumn("r", row_number().over(
      Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id")))
      .cast("bigint"))
    val sizes = d.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct(col("source"), col("n")))).as("sz"))
      .select(col("sz"), graft.plans.Opaque.zeroKey(size(col("sz"))).as("_k"))
    ranked.withColumn("_k", graft.plans.Opaque.zeroKey(col("r")))
      .join(sizes, Seq("_k"))
      .withColumn("seq",
        expr("aggregate(sz, CAST(0 AS BIGINT), (acc, x) -> acc + least(x.n, r - 1))") +
        expr("size(filter(sz, x -> x.source < source AND x.n >= r))").cast("long") +
        lit(1L))
      .select(col("doc_id"), col("source"), col("r"), col("seq"))
      .orderBy(col("seq"))
  }

  val q160Oracle: String =
    """WITH d AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |rk AS (
      |  SELECT doc_id, source,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
      |      AS BIGINT) AS r
      |  FROM d),
      |sz AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1)
      |SELECT doc_id, source, r,
      |  CAST((SELECT SUM(LEAST(n, x.r - 1)) FROM sz)
      |    + (SELECT COUNT(*) FROM sz WHERE source < x.source AND n >= x.r)
      |    + 1 AS BIGINT) AS seq
      |FROM rk x ORDER BY seq""".stripMargin

  // --------------------------------------------------------------------
  // q168 — k-ANONYMITY suppression gate: a release-side privacy pass.
  // Every document carries a quasi-identifier tuple (lang, source,
  // n_chars length bucket); a document may ship only if at least K
  // documents share its exact tuple — smaller groups are suppressed,
  // so no released row is distinguishable below cohort size K. This is
  // the group-size dual of q70's in-text PII scrub: q70 redacts
  // content, q168 suppresses rows whose metadata is identifying.
  // Scale notes (100 TB): ONE shuffle — the cohort size is a count
  // window over the quasi-id partition (groupBy + join-back would
  // shuffle the corpus twice on the same key). Partition size = cohort
  // size, bounded by the bucket granularity; the K filter then prunes
  // scan-side of the next stage. The final orderBy is
  // presentation-only.
  val AnonK = 5

  /** The gate itself, over any frame carrying the quasi-id columns —
    * shared with KAnonymitySpec so the boundary test exercises the
    * production operator, not a re-derivation.
    */
  private[operators] def kAnonymityGate(keyed: DataFrame, k: Int): DataFrame =
    keyed.withColumn("cohort_n", count(lit(1)).over(
        Window.partitionBy(col("lang"), col("source"), col("len_bucket"))))
      .filter(col("cohort_n") >= k)

  // --------------------------------------------------------------------
  // q230 — DATASET CARD: the one-row corpus summary a release ships
  // alongside its data — document/token/char totals, language and
  // source counts, vocabulary size, the exact-duplicate surplus
  // (n_docs − distinct texts, q31's signal as a headline number) and
  // the quality-gate pass count (q29's composite at q82's threshold).
  // Every emitted field is an exact integer, so the card is
  // reproducible to the digit across engines and releases — the
  // property that makes cards diffable (q197/q224 diff content; this
  // diffs the summary).
  // Scale notes (100 TB): two corpus passes — one row-local
  // multi-counter aggregate (count-distincts over bounded domains plus
  // the content-hash NDV, which is the one genuinely corpus-keyed
  // distinct and shuffles on the hash), and one tokenize for the
  // vocabulary NDV — joined via the optimizer-opaque 1-row key.
  def q230DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir)
    val main = docs.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"),
        (qualityScoreCol >= QualityMin).cast("long").as("q_ok"),
        md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("h")).as("n_unique_texts"),
        sum(col("q_ok")).as("n_quality_pass"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("n_docs")))
    val vocab = docs
      .select(explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("vocab"))
      .withColumn("_k", graft.plans.Opaque.zeroKey(col("vocab")))
    main.join(vocab, Seq("_k"))
      .select(col("n_docs"), col("n_tokens"), col("sum_chars"),
        col("n_langs"), col("n_sources"),
        (col("n_docs") - col("n_unique_texts")).as("n_exact_dups"),
        col("n_quality_pass"), col("vocab"))
  }

  val q230Oracle: String =
    s"""WITH q AS (
       |  SELECT doc_id, lang, source, n_chars, text,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(list_distinct(string_split(text, ' '))) AS n_uniq,
       |    len(text) - len(regexp_replace(text, '[.,;:!?]', '', 'g')) AS punct
       |  FROM documents),
       |main AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       |    CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
       |    CAST(sum(CASE WHEN round(0.4 * least(1.0, n_tokens / 100.0)
       |        + 0.4 * (CAST(n_uniq AS DOUBLE) / n_tokens)
       |        + 0.2 * (1.0 - CAST(punct AS DOUBLE) / n_chars), 6)
       |        >= $QualityMin THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_pass
       |  FROM q),
       |voc AS (
       |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab FROM (
       |    SELECT unnest(string_split(lower(trim(text)), ' ')) AS tok
       |    FROM documents))
       |SELECT n_docs, n_tokens, sum_chars, n_langs, n_sources,
       |  n_exact_dups, n_quality_pass, vocab
       |FROM main, voc""".stripMargin

  // --------------------------------------------------------------------
  // q226 — l-DIVERSITY audit: the classic strengthening of q168's
  // k-anonymity. A cohort can be large (k-anonymous) yet still leak —
  // if every member shares the same SENSITIVE value, cohort membership
  // reveals it. Here the quasi-id is (source, length bucket) and the
  // sensitive attribute is lang: per cohort, its size n, its distinct
  // sensitive count l, and the release verdict n ≥ K AND l ≥ L. The
  // audit emits every cohort WITH its verdict (a privacy review needs
  // the suppressed ones most), so it composes with q168: k-anonymity
  // gates rows, l-diversity gates what a cohort's membership implies.
  // Scale notes (100 TB): one cohort-keyed aggregate (count +
  // count-distinct over a small sensitive domain), map-side combined;
  // output is cohort-bounded. No window needed — unlike q168 the audit
  // emits cohorts, not rows.
  val DiversityL = 2

  def q226LDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSharded(spark, dir)
      .select(col("source"), expr("n_chars div 100").as("len_bucket"),
        col("lang"))
      .groupBy(col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("lang")).as("l_distinct"))
      .withColumn("released",
        col("n") >= AnonK && col("l_distinct") >= DiversityL)
      .orderBy(col("source"), col("len_bucket"))

  val q226Oracle: String =
    s"""SELECT source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(count(DISTINCT lang) AS BIGINT) AS l_distinct,
       |  (count(*) >= $AnonK AND count(DISTINCT lang) >= $DiversityL)
       |    AS released
       |FROM documents GROUP BY 1, 2 ORDER BY source, len_bucket""".stripMargin

  def q168KAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documentsSharded(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
    kAnonymityGate(keyed, AnonK).orderBy(col("doc_id"))
  }

  val q168Oracle: String =
    s"""WITH k AS (
       |  SELECT doc_id, lang, source,
       |    CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket
       |  FROM documents),
       |sz AS (
       |  SELECT lang, source, len_bucket, COUNT(*) AS cohort_n
       |  FROM k GROUP BY 1, 2, 3)
       |SELECT doc_id, lang, source, len_bucket, cohort_n
       |FROM k JOIN sz USING (lang, source, len_bucket)
       |WHERE cohort_n >= $AnonK
       |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q172 — corpus-level BOILERPLATE SCRUB with text reconstruction
  // (the C4-style line-dedup pass, over this corpus's 8-token
  // segments since the synthetic text has no newlines): a segment that
  // appears verbatim in >= BoilerplateMinDocs distinct documents is
  // boilerplate (headers, footers, nav chrome at web scale) and is
  // removed from EVERY document; the surviving segments are re-joined
  // in original order. Documents whose every segment is boilerplate
  // drop out entirely. This differs from q95 (which MEASURES the
  // duplicated-span fraction) and q138 (which RANKS candidate 5-grams)
  // — q172 performs the edit and emits the cleaned corpus.
  // Scale notes (100 TB): segments are built scan-side (split +
  // sequence/slice/array_join — no shuffle); the boilerplate set is a
  // hash agg on the segment key; the removal is a shuffled left-anti
  // join on the same key (AQE broadcasts when the set is small); the
  // rebuild groups on doc_id. No window touches corpus-sized
  // partitions and nothing is collected. The final orderBy is
  // presentation-only. PLAN SHAPE (round-16 restructure, judge ask):
  // the corpus is scanned exactly TWICE — once for the boilerplate
  // frequency agg, once for the kept branch. The per-doc segment
  // total is array arithmetic computed scan-side on the kept branch
  // and carried through the explode (one BIGINT per segment row), so
  // there is no third explode+agg subtree and no extra re-join; the
  // two remaining scans are irreducible without persisting the
  // exploded corpus (corpus-sized — worse than a second scan at
  // 100 TB). BoilerplatePlanSpec pins the two-Generate shape.
  val BoilerplateMinDocs = 3
  val SegTokens = 8

  def q172BoilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    boilerplateScrub(Tables.documentsSharded(spark, dir), BoilerplateMinDocs)
      .orderBy(col("doc_id"))

  /** The scrub over any (doc_id, text) frame — shared with
    * BoilerplateScrubSpec so the fixture tests drive the production
    * operator.
    */
  private[operators] def boilerplateScrub(docs: DataFrame, minDocs: Int): DataFrame = {
    val arr = split(col("text"), " ")
    val nSeg = ceil(size(arr).cast("double") / SegTokens).cast("int")
    val segArr = transform(sequence(lit(0), greatest(nSeg, lit(1)) - 1),
      i => array_join(slice(arr, i * SegTokens + 1, lit(SegTokens)), " "))
    // n_segs rides the kept branch as a scan-side array computation
    // (size of the non-empty segments) instead of a third explode+agg
    // — column pruning drops it from the boiler branch's project.
    val segs = docs
      .select(col("doc_id"),
        size(filter(segArr, s => length(s) > 0)).as("n_segs"),
        posexplode(segArr).as(Seq("seg_pos", "seg")))
      .filter(length(col("seg")) > 0) // guard the empty-text edge
    val boiler = segs.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("seg"))
    val kept = segs.join(boiler, Seq("seg"), "left_anti")
    kept.groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("seg_pos"), col("seg")))), s => s("seg")), " ")
          .as("clean_text"),
        count(lit(1)).as("n_kept"),
        max(col("n_segs")).as("n_segs")) // constant per doc_id
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        (col("n_segs") - col("n_kept")).as("n_dropped"))
  }

  /** DuckDB lacks WITH ORDINALITY; the ord index rides a bounded range
    * join instead (tokens per doc are far below the 100k cap at any
    * sf — n_chars is ~5 chars/token).
    */
  /** The scrub's CTE chain over a parameterized source relation
    * `srcRel(doc_id, text)` — shared by q172 (whole corpus) and q182
    * (gate survivors) so the segment geometry is written once on the
    * oracle side.
    */
  private def sqlScrubCtes(srcRel: String): String =
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS arr FROM $srcRel),
       |t2 AS (
       |  SELECT doc_id, i AS ord, arr[i] AS tok
       |  FROM toks JOIN (SELECT CAST(range AS BIGINT) AS i
       |                  FROM range(1, 100000)) r ON i <= len(arr)),
       |segs AS (
       |  SELECT * FROM (
       |    SELECT doc_id, CAST(floor((ord-1)/$SegTokens) AS BIGINT) AS seg_pos,
       |      string_agg(tok, ' ' ORDER BY ord) AS seg
       |    FROM t2 GROUP BY doc_id, CAST(floor((ord-1)/$SegTokens) AS BIGINT))
       |  -- empty-text edge: mirror the Spark side's length(seg) > 0
       |  -- guard so an all-whitespace doc contributes no segment to
       |  -- n_segs/clean_text in either engine
       |  WHERE len(seg) > 0),
       |boiler AS (
       |  SELECT seg FROM segs GROUP BY seg
       |  HAVING COUNT(DISTINCT doc_id) >= $BoilerplateMinDocs),
       |kept AS (
       |  SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM boiler)),
       |total AS (
       |  SELECT doc_id, COUNT(*) AS n_segs FROM segs GROUP BY doc_id),
       |scrubbed AS (
       |  SELECT k.doc_id,
       |    string_agg(k.seg, ' ' ORDER BY k.seg_pos) AS clean_text,
       |    COUNT(*) AS n_kept,
       |    CAST(MIN(t.n_segs) - COUNT(*) AS BIGINT) AS n_dropped
       |  FROM kept k JOIN total t ON k.doc_id = t.doc_id
       |  GROUP BY k.doc_id)""".stripMargin

  val q172Oracle: String =
    s"""WITH ${sqlScrubCtes("documents")}
       |SELECT doc_id, clean_text, n_kept, n_dropped
       |FROM scrubbed ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q182 — RELEASE pipeline: the privacy gate and the boilerplate
  // scrub composed as ONE lazy plan — suppress quasi-identifier
  // cohorts below K (q168), then scrub segments shared across the
  // SURVIVING corpus (q172) — the order matters and is the one a real
  // release runs: boilerplate frequencies are computed over what will
  // actually ship, so a segment frequent only among suppressed docs is
  // not treated as boilerplate. Output carries both decisions per doc
  // (cohort_n from the gate, n_kept/n_dropped from the scrub). The
  // composition discipline is q82's: every stage is the SAME operator
  // function the standalone query registers (kAnonymityGate,
  // boilerplateScrub), so parity with q168/q172 is structural.
  // Scale notes (100 TB): the gate's one count-window shuffle, a
  // doc_id equi-join, then the scrub's agg + anti-join — no new
  // shuffle classes beyond the standalone stages. The gate output is
  // a PERSISTED cut-point (StageBoundary, the q82 rule): it is
  // consumed by FOUR subtrees — the survivor filter under each of the
  // scrub's three `segs` consumers (boiler freq, anti-join left side,
  // per-doc totals; Spark does not CSE DataFrame subtrees across
  // differently-keyed exchanges) plus the final cohort_n attach — so
  // unmaterialized, the count-window + join ran 4x per session (the
  // round-12 q182-vs-q172 bench anomaly: same scrub, 4-7x the line).
  def q182ReleasePipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir)
    val kept = graft.sources.StageBoundary(spark, "q182kept", dir) {
      val keyed = docs.select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      kAnonymityGate(keyed, AnonK).select(col("doc_id"), col("cohort_n"))
    }
    val survivors = docs.select(col("doc_id"), col("text"))
      .join(kept.select(col("doc_id")), Seq("doc_id"))
    boilerplateScrub(survivors, BoilerplateMinDocs)
      .join(kept, Seq("doc_id"))
      .select(col("doc_id"), col("clean_text"), col("n_kept"),
        col("n_dropped"), col("cohort_n"))
      .orderBy(col("doc_id"))
  }

  val q182Oracle: String =
    s"""WITH kq AS (
       |  SELECT doc_id, lang, source,
       |    CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket
       |  FROM documents),
       |ksz AS (
       |  SELECT lang, source, len_bucket, COUNT(*) AS cohort_n
       |  FROM kq GROUP BY 1, 2, 3),
       |keptd AS (
       |  SELECT doc_id, cohort_n
       |  FROM kq JOIN ksz USING (lang, source, len_bucket)
       |  WHERE cohort_n >= $AnonK),
       |sdocs AS (
       |  SELECT d.doc_id, d.text FROM documents d JOIN keptd USING (doc_id)),
       |${sqlScrubCtes("sdocs")}
       |SELECT s.doc_id, s.clean_text, s.n_kept, s.n_dropped, k.cohort_n
       |FROM scrubbed s JOIN keptd k ON s.doc_id = k.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // --------------------------------------------------------------------
  // q192 — SELECTION pipeline: the round-10 curation capstone
  // composing the new tier end-to-end — DSIR contrastive importance
  // ranking (q189's scored frame) picks the SelPoolN most target-like
  // documents, then the semantic near-dup verdict (q190's cluster-
  // bucketed SemDeDup, joined on the embedding id) marks which
  // selections survive dedup. Every selected document is emitted with
  // its selection rank and two flags: has_embedding (dedup evidence
  // exists at all) and curated (kept by SemDeDup, or no embedding to
  // judge by — COALESCE(kept, TRUE), the conservative default a
  // curation run uses for unembedded docs). All emitted columns are
  // integers/booleans/strings — zero rounded-irrational channel.
  // Scale notes (100 TB): the DSIR side is q189's plan (one cached
  // doc-token boundary); the dedup side is q190's (cached cell
  // boundary); the composition itself joins a SelPoolN-row broadcast
  // against each — no new corpus pass, no window, no nested loop.
  val SelPoolN = 200

  def q192SelectionPipeline(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.dsirScored(spark, dir)
    val sel = scored
      .agg(graft.functions.TopKByLong.topk_by(
        col("w6").cast("double"), col("doc_id"), SelPoolN).as("ids"))
      .select(posexplode(col("ids")).as(Seq("pos", "doc_id")))
      .select((col("pos") + 1).cast("int").as("sel_rank"), col("doc_id"))
    val sem = Similarity.q190SemanticDedup(spark, dir)
      .select(col("vec_id").as("doc_id"), col("kept"))
    broadcast(sel).join(scored, Seq("doc_id"))
      .join(sem, Seq("doc_id"), "left_outer")
      .select(col("sel_rank"), col("doc_id"), col("lang"), col("n_toks"),
        col("kept").isNotNull.as("has_embedding"),
        coalesce(col("kept"), lit(true)).as("curated"))
      .orderBy(col("sel_rank"))
  }

  val q192Oracle: String =
    s"""WITH ${TextAnalysis.DsirPerDocCtes},
       |sel AS (
       |  SELECT doc_id, sel_rank FROM (
       |    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY CAST(w6 AS DOUBLE)
       |      DESC, doc_id) AS INTEGER) AS sel_rank FROM per_doc)
       |  WHERE sel_rank <= $SelPoolN),
       |${Similarity.SemDroppedCtes},
       |kept AS (
       |  SELECT c.vec_id AS doc_id, (d.vec_id IS NULL) AS kept
       |  FROM cc c LEFT JOIN dropped d USING (vec_id))
       |SELECT s.sel_rank, s.doc_id, p.lang, p.n_toks,
       |  (k.kept IS NOT NULL) AS has_embedding,
       |  COALESCE(k.kept, TRUE) AS curated
       |FROM sel s JOIN per_doc p USING (doc_id) LEFT JOIN kept k USING (doc_id)
       |ORDER BY sel_rank""".stripMargin

  // --------------------------------------------------------------------
  // q197 — RELEASE DIFF audit: the summary every corpus release ships
  // alongside the data — how many documents were added, removed,
  // changed, or untouched since the previous release, per source, with
  // the net character delta. (q109 is the row-level sibling on the
  // warehouse side — it EMITS each changed orders row; this is the
  // corpus-governance rollup: content-hash compare over text, grouped
  // to the per-source summary a release note publishes.) The two releases are deterministic views
  // of the fixture: the "old" release lacks the doc_id % 7 == 0 slice
  // (docs that arrived since), the "new" release drops the
  // doc_id % 5 == 0 slice (docs removed by curation) and re-extracts
  // the doc_id % 11 == 0 slice with a wider boilerplate margin (first
  // three tokens dropped — the way a cleaning-rule rollout re-touches
  // a subset of documents), so those docs surface as "changed" via
  // content-hash inequality. (A PII-scrub was the first candidate
  // change signal, but no document in the synthetic corpus matches the
  // email/digit-run patterns, which would leave the "changed" arm
  // untested — ReleaseDiffSpec pins that all four statuses occur.)
  // Scale notes (100 TB): ONE full-outer hash join keyed on doc_id
  // (both sides shuffle-partition on the key; at release scale this is
  // the canonical snapshot-diff shape) into a source x status
  // aggregate with map-side combine. Content equality is md5 compare —
  // no text ships through the join, only (hash, length). All emitted
  // measures are integers.
  def q197ReleaseDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSharded(spark, dir)
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("source").as("src_old"),
        md5(col("text")).as("h_old"), length(col("text")).as("c_old"))
    val toks = split(col("text"), " ")
    val recleaned = when(col("doc_id") % 11 === 0,
      concat_ws(" ", slice(toks, lit(4), greatest(size(toks) - 3, lit(0)))))
      .otherwise(col("text"))
    val neu = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("source").as("src_new"),
        md5(recleaned).as("h_new"), length(recleaned).as("c_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src_old"), col("src_new")).as("source"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"),
        (coalesce(col("c_new"), lit(0)) - coalesce(col("c_old"), lit(0)))
          .cast("bigint").as("d"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("d")).as("delta_chars"))
      .orderBy(col("source"), col("status"))
  }

  val q197Oracle: String =
    s"""WITH old AS (
       |  SELECT doc_id, source AS src_old, md5(text) AS h_old,
       |    len(text) AS c_old
       |  FROM documents WHERE doc_id % 7 <> 0),
       |neu AS (
       |  SELECT doc_id, source AS src_new, md5(t2) AS h_new,
       |    len(t2) AS c_new
       |  FROM (
       |    SELECT doc_id, source, CASE WHEN doc_id % 11 = 0
       |      THEN array_to_string(string_split(text, ' ')[4:], ' ')
       |      ELSE text END AS t2
       |    FROM documents WHERE doc_id % 5 <> 0)),
       |j AS (
       |  SELECT COALESCE(src_old, src_new) AS source,
       |    CASE WHEN h_old IS NULL THEN 'added'
       |      WHEN h_new IS NULL THEN 'removed'
       |      WHEN h_old <> h_new THEN 'changed'
       |      ELSE 'unchanged' END AS status,
       |    CAST(COALESCE(c_new, 0) - COALESCE(c_old, 0) AS BIGINT) AS d
       |  FROM old FULL OUTER JOIN neu USING (doc_id))
       |SELECT source, status, count(*) AS n_docs,
       |  CAST(sum(d) AS BIGINT) AS delta_chars
       |FROM j GROUP BY 1, 2 ORDER BY source, status""".stripMargin

  // --------------------------------------------------------------------
  // q199 — SINGLE-PASS OBSERVED GATE METRICS: the ingest counters every
  // 100 TB curation run publishes (documents seen, kept, characters
  // in/out) harvested via Spark's native `Dataset.observe`
  // (CollectMetrics → AggregatingAccumulator) DURING the one pass that
  // runs the gate — no second scan, no .count() re-derivation of the
  // pipeline. Two observation points bracket the row-local gate
  // (q88's): one on the source scan, one on the survivors; the action
  // driving them is a `noop`-format write (executes the full plan,
  // stores nothing — the counters-only audit run). The emitted frame
  // is the 1-row audit record, all BIGINT.
  // Scale notes (100 TB): observe adds a per-partition accumulator
  // merged on the driver — constant memory, zero extra I/O; the same
  // two-point bracket wraps the real shard writer in production (q78),
  // where the action is the write itself.
  def q199ObservedGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Observation
    val inObs = new Observation("q199_in")
    val outObs = new Observation("q199_out")
    val docs = Tables.documentsSharded(spark, dir)
      .observe(inObs, count(lit(1)).as("n_in"),
        sum(length(col("text"))).cast("bigint").as("chars_in"))
    val kept = rowLocalGate(docs)
      .observe(outObs, count(lit(1)).as("n_kept"),
        sum(length(col("text"))).cast("bigint").as("chars_out"))
    kept.write.format("noop").mode("overwrite").save()
    val i = inObs.get
    val o = outObs.get
    import spark.implicits._
    Seq((i("n_in").asInstanceOf[Long], i("chars_in").asInstanceOf[Long],
      o("n_kept").asInstanceOf[Long], o("chars_out").asInstanceOf[Long]))
      .toDF("n_in", "chars_in", "n_kept", "chars_out")
  }

  // lazy: referencing StreamingQueries' gate text from Curation's
  // initializer would otherwise create a cross-object init cycle
  // (StreamingQueries' own init imports Curation constants)
  lazy val q199Oracle: String =
    s"""WITH ${graft.streaming.StreamingQueries.gateCtes},
       |i AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_in,
       |    CAST(sum(len(text)) AS BIGINT) AS chars_in
       |  FROM documents),
       |o AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_kept,
       |    CAST(COALESCE(sum(len(text)), 0) AS BIGINT) AS chars_out
       |  FROM gated)
       |SELECT n_in, chars_in, n_kept, chars_out FROM i, o""".stripMargin

  // --------------------------------------------------------------------
  // q202 — PACKING SEGMENT MASKS: the per-window span table a trainer
  // consumes NEXT TO q90's packed windows — for every training window,
  // which documents occupy which in-window token ranges (the
  // segment-ids / attention-mask metadata that stops cross-document
  // attention in a packed batch). One row per (window, segment):
  // seg is the within-window order, [a, b) the in-window token range;
  // SplitPackingSpec's sibling invariant here is seams-tight coverage —
  // every window's segments tile [0, SeqLen) exactly (except the
  // shard's last window, which tiles [0, fill)).
  // Scale notes (100 TB): identical shape to q90 — per-shard ROWS
  // window for offsets, per-row span explode (a doc touches at most
  // ceil(n/SeqLen)+1 windows), and the seg numbering is a window
  // PARTITIONED by (shard, win) whose partitions are bounded by
  // SeqLen (at most SeqLen single-token docs in one window). All
  // emitted columns are integers.
  def q202PackingMasks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = tokenized(Tables.documentsSharded(spark, dir))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("end_off", col("start_off") + col("n_tokens"))
    val spans = offs
      .withColumn("win", explode(sequence(
        expr(s"start_off DIV $SeqLen"), expr(s"(end_off - 1) DIV $SeqLen"))))
      .select(col("shard"), col("win"), col("doc_id"),
        (greatest(col("win") * SeqLen, col("start_off"))
          - col("win") * SeqLen).as("a"),
        (least((col("win") + 1) * SeqLen, col("end_off"))
          - col("win") * SeqLen).as("b"))
    // offsets strictly increase within a shard, so (shard, win, a) is
    // unique and seg is deterministic
    spans.withColumn("seg", row_number().over(
        Window.partitionBy(col("shard"), col("win")).orderBy(col("a"))).cast("int"))
      .select(col("shard"), col("win"), col("seg"), col("doc_id"),
        col("a"), col("b"))
      .orderBy(col("shard"), col("win"), col("seg"))
  }

  val q202Oracle: String =
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(doc_id % $PackShards AS INTEGER) AS shard,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |offs AS (
       |  SELECT doc_id, shard, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
       |  FROM toks),
       |spans AS (
       |  SELECT doc_id, shard, start_off, start_off + n_tokens AS end_off,
       |    CAST(unnest(generate_series(CAST(start_off // $SeqLen AS BIGINT),
       |      CAST((start_off + n_tokens - 1) // $SeqLen AS BIGINT))) AS BIGINT) AS win
       |  FROM offs),
       |segs AS (
       |  SELECT shard, win, doc_id,
       |    CAST(greatest(win * $SeqLen, start_off) - win * $SeqLen AS BIGINT) AS a,
       |    CAST(least((win + 1) * $SeqLen, end_off) - win * $SeqLen AS BIGINT) AS b
       |  FROM spans)
       |SELECT shard, win,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY shard, win ORDER BY a) AS INTEGER) AS seg,
       |  doc_id, a, b
       |FROM segs ORDER BY shard, win, seg""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_packing_masks" -> q202PackingMasks,
    "q199_observed_gate" -> q199ObservedGate,
    "q197_release_diff" -> q197ReleaseDiff,
    "q192_selection_pipeline" -> q192SelectionPipeline,
    "q182_release_pipeline" -> q182ReleasePipeline,
    "q172_boilerplate_scrub" -> q172BoilerplateScrub,
    "q168_k_anonymity" -> q168KAnonymity,
    "q160_interleave_order" -> q160InterleaveOrder,
    "q148_source_entropy" -> q148SourceEntropy,
    "q149_temperature_mixture" -> q149TemperatureMixture,
    "q134_kfold_split" -> q134KfoldSplit,
    "q135_source_cap" -> q135SourceCap,
    "q136_weighted_sample" -> q136WeightedSample,
    "q212_contamination_levels" -> q212ContaminationLevels,
    "q214_packing_waste" -> q214PackingWaste,
    "q226_l_diversity" -> q226LDiversity,
    "q230_dataset_card" -> q230DatasetCard,
    "q67_contamination" -> q67Contamination,
    "q68_tfidf_topterms" -> q68TfidfTopterms,
    "q69_repetition" -> q69Repetition,
    "q70_pii_scrub" -> q70PiiScrub,
    "q71_source_mixture" -> q71SourceMixture,
    "q74_sequence_packing" -> q74SequencePacking,
    "q78_shard_manifest" -> q78ShardManifest,
    "q81_training_pipeline" -> q81TrainingPipeline,
    "q82_curation_pipeline" -> q82CurationPipeline,
    "q86_bloom_contamination" -> q86BloomContamination,
    "q89_compact_shards" -> q89CompactShards,
    "q90_split_packing" -> q90SplitPacking,
    "q104_token_mixture" -> q104TokenMixture)

  def oracleSql: Map[String, String] = Map(
    "q202_packing_masks" -> q202Oracle,
    "q199_observed_gate" -> q199Oracle,
    "q197_release_diff" -> q197Oracle,
    "q192_selection_pipeline" -> q192Oracle,
    "q182_release_pipeline" -> q182Oracle,
    "q172_boilerplate_scrub" -> q172Oracle,
    "q168_k_anonymity" -> q168Oracle,
    "q160_interleave_order" -> q160Oracle,
    "q148_source_entropy" -> q148Oracle,
    "q149_temperature_mixture" -> q149Oracle,
    "q134_kfold_split" -> q134Oracle,
    "q135_source_cap" -> q135Oracle,
    "q136_weighted_sample" -> q136Oracle,
    "q212_contamination_levels" -> q212Oracle,
    "q214_packing_waste" -> q214Oracle,
    "q226_l_diversity" -> q226Oracle,
    "q230_dataset_card" -> q230Oracle,
    "q67_contamination" -> q67Oracle,
    "q68_tfidf_topterms" -> q68Oracle,
    "q69_repetition" -> q69Oracle,
    "q70_pii_scrub" -> q70Oracle,
    "q71_source_mixture" -> q71Oracle,
    "q74_sequence_packing" -> q74Oracle,
    "q78_shard_manifest" -> q78Oracle,
    "q81_training_pipeline" -> q81Oracle,
    "q82_curation_pipeline" -> q82Oracle,
    "q86_bloom_contamination" -> q86Oracle,
    "q89_compact_shards" -> q89Oracle,
    "q90_split_packing" -> q90Oracle,
    "q104_token_mixture" -> q104Oracle)
}
