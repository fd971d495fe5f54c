package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Relational.{exprSum, moneySum}

/** Format round-trip queries: write a table through a text format
  * (CSV = the reference's K3 sink, JSON) into a session-scoped temp
  * dir, read it back with an explicit schema, and aggregate. The
  * oracle aggregates the ORIGINAL parquet — so a hash match proves the
  * round-trip is value-lossless, gating the writer, the reader, and
  * the text codecs end-to-end (Spark writes doubles/timestamps in
  * shortest-round-trip / ISO forms, so exact recovery is expected).
  *
  * Scale notes: both writes are plain distributed `df.write` (one file
  * per task, no driver collect); the read-back is a distributed text
  * scan with an explicit schema (no inference pass).
  */
object FormatQueries {

  private[sources] def tmp(spark: SparkSession, tag: String, dir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_rt_${tag}_" +
      s"${spark.sparkContext.applicationId}_${math.abs(dir.hashCode)}"

  // --------------------------------------------------------------------
  // q54 — CSV round-trip (K3's format): orders → header CSV → explicit
  // schema read → aggregate; must equal the same aggregate on parquet.
  def q54CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "csv", dir)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .write.mode("overwrite").option("header", true).csv(path)
    spark.read.option("header", true)
      .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP")
      .csv(path)
      .groupBy(col("o_orderstatus").as("estado"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total"),
        countDistinct(col("o_custkey")).as("n_clientes"))
      .orderBy(col("estado"))
  }

  val q54Oracle: String =
    """SELECT o_orderstatus AS estado, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS n_clientes
      |FROM orders GROUP BY 1 ORDER BY estado""".stripMargin

  // --------------------------------------------------------------------
  // q55 — JSON-lines round-trip: events → json → explicit schema read →
  // aggregate; same lossless-recovery contract as q54.
  def q55JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "json", dir)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").json(path)
    spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(path)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        exprSum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }

  val q55Oracle: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q96 — ORC round-trip: the columnar interchange format warehouses
  // actually exchange besides parquet, through the same lossless
  // contract as q54/q55. Binary columnar (no text codec in the loop),
  // so this gates Spark's ORC writer/reader pair and its type mapping
  // (DECIMAL-summed doubles detect any value drift).
  def q96OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "orc", dir)
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"))
      .write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        exprSum(col("l_quantity")).as("sum_qty"),
        exprSum(col("l_extendedprice")).as("sum_price"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy(col("l_returnflag"))
  }

  val q96Oracle: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_price,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // --------------------------------------------------------------------
  // q59 — corrupt-record tolerance: a JSON dataset where a
  // deterministic subset of lines (event_id % 100 = 0) is mangled into
  // non-JSON; the PERMISSIVE reader must keep every good row, shunt
  // every bad line into _corrupt_record, and the per-type aggregate
  // must equal the oracle's filtered aggregate over the clean parquet.
  // Training corpora always carry a bad-record tail — the pipeline has
  // to count and quarantine it without failing the job.
  def q59CorruptTolerant(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "corrupt", dir)
    Tables.events(spark, dir)
      .select(when(col("event_id") % 100 === 0,
        concat(lit("{corrupt line "), col("event_id").cast("string")))
        .otherwise(to_json(struct(
          col("event_id"), col("user_id"), col("event_type"), col("value"))))
        .as("value"))
      .write.mode("overwrite").text(path)
    val read = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    read
      .groupBy(coalesce(col("event_type"), lit("_CORRUPT_")).as("event_type"))
      .agg(count(lit(1)).as("n"), exprSum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))
  }

  val q59Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
      |FROM events WHERE event_id % 100 <> 0
      |GROUP BY 1
      |UNION ALL
      |SELECT '_CORRUPT_', COUNT(*), NULL
      |FROM events WHERE event_id % 100 = 0
      |ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q63 — partition-pruned layout, end to end: write orders
  // date-partitioned by year, read back ONE partition directory's
  // worth via a partition-column filter (the scan lists only that
  // directory — the layout every 100 TB fact table uses), aggregate.
  // Oracle = the same aggregate from a WHERE year() filter on parquet.
  def q63PartitionPruning(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "part", dir)
    Tables.orders(spark, dir)
      .withColumn("anio", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("anio").parquet(path)
    spark.read.parquet(path)
      .filter(col("anio") === 1995)
      .groupBy(col("o_orderstatus").as("estado"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("estado"))
  }

  val q63Oracle: String =
    """SELECT o_orderstatus AS estado, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders WHERE year(o_orderdate) = 1995
      |GROUP BY 1 ORDER BY estado""".stripMargin

  // --------------------------------------------------------------------
  // q64 — schema evolution: two parquet batches with different schemas
  // (the second adds a column), read with mergeSchema; rows from the
  // old batch surface the new column as null. Schema drift arrives in
  // every long-lived ingestion pipeline; this gates the merged read.
  def q64SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "evo", dir)
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$path/batch=1")
    o.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$path/batch=2")
    spark.read.option("mergeSchema", true).parquet(path)
      .groupBy(col("o_orderstatus").as("estado"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_with_price"),
        moneySum(coalesce(col("o_totalprice"), lit(0.0))).as("total_new_batch"))
      .orderBy(col("estado"))
  }

  val q64Oracle: String =
    """SELECT o_orderstatus AS estado, COUNT(*) AS n_rows,
      |  COUNT(*) FILTER (WHERE o_orderkey % 2 <> 0) AS n_with_price,
      |  CAST(SUM(CAST(CASE WHEN o_orderkey % 2 <> 0 THEN o_totalprice
      |    ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS total_new_batch
      |FROM orders GROUP BY 1 ORDER BY estado""".stripMargin

  // --------------------------------------------------------------------
  // q129 — storage-bucketed co-located join: both join sides are
  // written as bucketed parquet tables (8 buckets on the join key,
  // sorted within buckets), so the subsequent fact↔dim join is
  // bucket-to-bucket — NO shuffle exchange on either side (locked by
  // BucketedJoinSpec). This is the pre-partitioning the brief calls
  // out for repeatedly-joined warehouse tables: pay the shuffle once
  // at write time, never again at read time. The merge hint forces the
  // sort-merge path at fixture scale (otherwise Spark broadcasts the
  // small side and the bucket co-location is never exercised).
  // Scale notes (100 TB): bucketed layout is THE amortization for
  // join-heavy warehouses — every downstream join/aggregate on the
  // bucket key skips its exchange; bucket count is chosen at write
  // time to bound per-bucket file size (8 here for the fixture; a
  // 100 TB orders table would use thousands). The final groupBy is the
  // only shuffle in this plan.
  def q129BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = tmp(spark, "bucketed", dir)
    def writeBucketed(df: DataFrame, table: String, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      df.write.mode("overwrite").format("parquet")
        .bucketBy(8, key).sortBy(key)
        .option("path", s"$base/$table")
        .saveAsTable(table)
    }
    writeBucketed(Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "graft_q129_orders", "o_custkey")
    writeBucketed(Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment")),
      "graft_q129_customer", "c_custkey")
    spark.table("graft_q129_orders").hint("merge")
      .join(spark.table("graft_q129_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segmento"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total"),
        countDistinct(col("o_custkey")).as("n_clientes"))
      .orderBy(col("segmento"))
  }

  val q129Oracle: String =
    """SELECT c_mktsegment AS segmento, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  COUNT(DISTINCT o_custkey) AS n_clientes
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY segmento""".stripMargin

  // --------------------------------------------------------------------
  // q145 — DYNAMIC partition pruning: q63's static prune needs the
  // literal in the query; here the selective filter sits on a DIM
  // table attribute, and only the join reveals which fact partitions
  // matter. Catalyst turns the broadcast dim into a runtime partition
  // filter on the fact scan (`dynamicpruningexpression` — locked by
  // DppSpec), so the partitioned fact reads ONLY the era's year
  // directories. The era attribute is carried through a crc-based
  // tag so the dim filter cannot constant-fold into a static year
  // predicate (that would silently degrade the test to q63).
  // Scale notes (100 TB): DPP is THE mechanism that makes star joins
  // on a date-partitioned 100 TB fact feasible — without it a
  // "current quarter" dim filter still scans every year. Requires the
  // dim to broadcast (it does: one row per year) and the join key to
  // be the partition column.
  def q145DynamicPruning(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "dpp", dir)
    Tables.orders(spark, dir)
      .withColumn("anio", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("anio").parquet(path)
    val fact = spark.read.parquet(path)
    // era = crc32(year-string) parity — opaque to constant folding,
    // deterministic in both engines
    val dim = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("anio")).distinct()
      .withColumn("era", crc32(col("anio").cast("string")) % 2)
    fact.join(broadcast(dim.filter(col("era") === 0)), Seq("anio"))
      .groupBy(col("anio"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total"))
      .orderBy(col("anio"))
  }

  // DuckDB has no crc32 — dump the matching years arithmetically is
  // impossible portably, so the oracle recomputes the SAME parity via
  // a tiny lookup computed with Java's CRC32 at oracle-build time
  // (the year range is data-independent only in span, so enumerate
  // 1970-2100 — any year outside is absent from both sides anyway).
  val q145Oracle: String = {
    val keep = (1970 to 2100).filter { y =>
      val c = new java.util.zip.CRC32()
      c.update(y.toString.getBytes("UTF-8"))
      c.getValue % 2 == 0
    }
    s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS anio,
       |  COUNT(*) AS n_orders,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       |FROM orders
       |WHERE CAST(year(o_orderdate) AS INTEGER) IN (${keep.mkString(", ")})
       |GROUP BY 1 ORDER BY anio""".stripMargin
  }

  // --------------------------------------------------------------------
  // q164 — DYNAMIC partition overwrite: the storage semantic behind
  // "recompute one day": overwrite mode with partitionOverwriteMode=
  // dynamic (set per-write, never on the shared session) replaces ONLY
  // the partition directories present in the incoming frame — a static
  // overwrite would wipe the whole table and a recompute job that
  // touches one day must not destroy the other 29. Day 19740's rows
  // are re-derived with corrected values (value·2 — exact in IEEE, so
  // the oracle's CASE replays it bit-identically) and written dynamic;
  // the read-back per-day aggregate proves every other day survived
  // byte-identical and only the recomputed day changed. DynOverSpec
  // additionally pins the FILES of an untouched partition as unchanged
  // (the aggregate alone can't distinguish rewrite-same-bytes from
  // untouched).
  // Scale notes (100 TB): this is the nightly-backfill primitive for a
  // date-partitioned fact — the write manifest scales with the days
  // touched, not the table; combined with q63/q145 pruning the whole
  // recompute reads and writes one partition.
  val OverwriteDay = 19740L

  def q164DynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "dynover", dir)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"),
        expr("CAST(ts AS LONG) DIV 86400").as("day"), col("value"))
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    ev.filter(col("day") === OverwriteDay)
      .withColumn("value", col("value") * 2)
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("day").parquet(path)
    spark.read.parquet(path)
      .groupBy(col("day").cast("bigint").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(24, 6)))
          .cast("double").as("sum_value"))
      .orderBy(col("day"))
  }

  val q164Oracle: String =
    s"""SELECT CAST(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
       |    AS BIGINT) AS day,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CAST(CASE
       |    WHEN CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 86400
       |      = $OverwriteDay THEN value * 2 ELSE value END
       |    AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  // --------------------------------------------------------------------
  // q235 — NESTED schema pruning, end to end: every flat-table query
  // in the registry exercises top-level column pruning; production
  // multimodal corpora are not flat — a media/document table carries a
  // typed metadata STRUCT and a per-chunk ARRAY OF STRUCTS next to a
  // payload column that dwarfs both. The write materializes that
  // layout (doc payload + meta struct + chunk structs); the read-back
  // touches ONLY meta.lang and chunks[].n_toks, and Catalyst's nested
  // schema pruning must narrow the parquet ReadSchema to exactly those
  // leaves — the payload and every sibling subfield stay unread
  // (NestedPruningSpec pins the scan's ReadSchema string: no `text`,
  // no sibling leaves). Chunk sums are row-local folds over the pruned
  // int array; the only shuffle is the final per-lang aggregate.
  // Scale notes (100 TB): nested pruning is what keeps a media table
  // queryable — catalog queries over a binary-payload corpus read KBs
  // of metadata leaves per row group instead of the payload column;
  // without it every "count chunks by lang" scans the petabyte. Same
  // mechanism as top-level pruning, but it must survive the
  // struct/array extraction path, which is why it gets its own gate.
  val NestedChunk = 64

  private[sources] def q235ReadBack(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "nested", dir)
    Tables.documents(spark, dir)
      .withColumn("nt", size(split(lower(trim(col("text"))), " ")))
      .select(col("doc_id"), col("text"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"),
        // chunk structs: (idx, n_toks) per NestedChunk-token slice —
        // the last chunk carries the remainder ((nt-1)/chunk is double
        // division; the int cast truncates, correct for nt >= 1)
        transform(sequence(lit(0),
            ((col("nt") - 1) / NestedChunk).cast("int")),
          i => struct(i.as("idx"),
            least(col("nt") - i * NestedChunk, lit(NestedChunk))
              .as("n_toks"))).as("chunks"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .select(col("meta.lang").as("lang"),
        col("chunks.n_toks").as("chunk_toks"))
  }

  def q235NestedPruning(spark: SparkSession, dir: String): DataFrame =
    q235ReadBack(spark, dir)
      .select(col("lang"), size(col("chunk_toks")).as("n_chunks"),
        aggregate(col("chunk_toks"), lit(0L), (a, x) => a + x).as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chunks")).cast("bigint").as("n_chunks"),
        sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("lang"))

  val q235Oracle: String =
    s"""WITH d AS (
       |  SELECT lang, len(string_split(lower(trim(text)), ' ')) AS n
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM((n - 1) // $NestedChunk + 1) AS BIGINT) AS n_chunks,
       |  CAST(SUM(n) AS BIGINT) AS n_tokens
       |FROM d GROUP BY 1 ORDER BY lang""".stripMargin

  // --------------------------------------------------------------------
  // q236 — semi-structured ingestion through VARIANT: two producer
  // generations emit DIVERGENT event JSON (gen A: extra is an object
  // {flag}, one-element vals; gen B: extra is a bare number,
  // two-element vals) and the warehouse lands both in ONE variant
  // column — no schema migration, no lossy string re-parsing
  // downstream. The variant is written to parquet and read back (the
  // storage path: Spark 4 encodes variant as a binary
  // metadata+value pair, so typed extraction later never re-parses
  // text), then typed-path extraction drives the report:
  // variant_get for paths present in every generation,
  // try_variant_get where generations diverge (path into a scalar,
  // object-to-int cast) — the NULLs are the contract, counted per
  // type. This is the plan shape flat from_json can't express: one
  // column, per-row schema, codegen'd binary path access.
  // Scale notes (100 TB): event streams always carry generational
  // schema drift; the variant encoding makes extraction
  // O(path-depth) binary navigation instead of a JSON text parse per
  // row per field, and parquet stores the value bytes columnar. The
  // aggregate is the only shuffle.
  def q236VariantJson(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "variant", dir)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    val genA = ev.filter(col("event_id") % 3 === 0)
      .select(to_json(struct(
        col("event_id").as("id"),
        struct(col("event_type").as("type"), col("k")).as("meta"),
        array(col("value")).as("vals"),
        struct(lit(true).as("flag")).as("extra"))).as("js"))
    val genB = ev.filter(col("event_id") % 3 =!= 0)
      .select(to_json(struct(
        col("event_id").as("id"),
        struct(col("event_type").as("type"), col("k")).as("meta"),
        array(col("value"), col("value") * 2).as("vals"),
        col("k").as("extra"))).as("js"))
    genA.unionByName(genB)
      .select(parse_json(col("js")).as("v"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .select(
        expr("variant_get(v, '$.meta.type', 'string')").as("event_type"),
        expr("variant_get(v, '$.meta.k', 'int')").as("k"),
        expr("variant_get(v, '$.vals[0]', 'double')").as("v0"),
        // generation-divergent paths: NULL where the shape differs
        expr("try_variant_get(v, '$.vals[1]', 'double')").as("v1"),
        expr("try_variant_get(v, '$.extra.flag', 'boolean')").as("flag"),
        expr("try_variant_get(v, '$.extra', 'int')").as("ex_num"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).cast("bigint").as("sum_k"),
        exprSum(col("v0")).as("sum_v0"),
        count(col("v1")).as("n_gen_b"),
        count(col("flag")).as("n_gen_a"),
        sum(col("ex_num")).cast("bigint").as("sum_extra"))
      .orderBy(col("event_type"))
  }

  val q236Oracle: String =
    """WITH e AS (
      |  SELECT event_type, value,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |    event_id % 3 = 0 AS gen_a
      |  FROM events)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_v0,
      |  COUNT(*) FILTER (WHERE NOT gen_a) AS n_gen_b,
      |  COUNT(*) FILTER (WHERE gen_a) AS n_gen_a,
      |  CAST(SUM(CASE WHEN gen_a THEN NULL ELSE k END) AS BIGINT) AS sum_extra
      |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin

  // --------------------------------------------------------------------
  // q239 — XML round-trip: the remaining interchange format Spark 4
  // ships natively (the spark-xml package folded into core), under
  // the same lossless contract as q54/q55/q96 — and, like q235, with
  // a NESTED element in the loop: the order's status/total ride a
  // child element, so the writer's nested-element emission and the
  // reader's struct recovery are both gated, plus the timestamp
  // text codec. Explicit read schema (no inference pass — an
  // inference scan doubles the read at scale).
  // Scale notes (100 TB): XML is the B2B/legacy-feed ingestion
  // format; the write is distributed (one file per task) and the
  // read a distributed text scan — same shape as the CSV/JSON pair.
  def q239XmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "xml", dir)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("total")).as("info"),
        col("o_orderdate"))
      .write.mode("overwrite").option("rowTag", "order").format("xml")
      .save(path)
    spark.read.option("rowTag", "order")
      .schema("o_orderkey BIGINT, " +
        "info STRUCT<status: STRING, total: DOUBLE>, " +
        "o_orderdate TIMESTAMP")
      .format("xml").load(path)
      .groupBy(col("info.status").as("estado"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("info.total")).as("total"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("primera"))
      .orderBy(col("estado"))
  }

  val q239Oracle: String =
    """SELECT o_orderstatus AS estado, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  strftime(MIN(o_orderdate), '%Y-%m-%d') AS primera
      |FROM orders GROUP BY 1 ORDER BY estado""".stripMargin

  // --------------------------------------------------------------------
  // q252 — PARQUET AGGREGATE PUSHDOWN: ungrouped COUNT/MIN/MAX
  // answered from row-group FOOTER statistics — the scan's ReadSchema
  // IS the aggregate results and zero data pages are decoded
  // (`PushedAggregation: [COUNT(*), MIN(..), MAX(..)]` on the
  // BatchScan; AggPushdownSpec pins it per table and value-equality
  // with the pushdown disabled). The release-audit shape: row counts
  // and key ranges for every table of a corpus drop, the first thing
  // a 100 TB ingest validates. Needs the V2 read path
  // (`useV1SourceList=""`) and no data filters — a residual filter
  // forces real row reads, which is why the audit is whole-table by
  // design. MIN/MAX pushdown is only sound where footer stats are
  // trustworthy for the type (integral keys here; Spark itself
  // refuses pushdown for floating/timestamp edge cases).
  // Scale notes (100 TB): this is O(files) metadata I/O instead of
  // O(rows) decode — the difference between auditing a drop in
  // seconds from footers and a full-corpus scan; the same footers
  // feed row-group skipping (q63) and z-order pruning (q102).
  def q252AggPushdown(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    s.conf.set("spark.sql.sources.useV1SourceList", "")
    footerAudit(s, dir)
  }

  /** The three-table footer audit on the caller's session. Exposed for
    * AggPushdownSpec's plan + pushdown-off equality checks. */
  private[sources] def footerAudit(s: SparkSession, dir: String): DataFrame = {
    def audit(table: String, key: String): DataFrame =
      Tables.load(s, dir, table).agg(
        count(lit(1)).as("n_rows"),
        min(col(key)).as("min_key"), max(col(key)).as("max_key"))
        .select(lit(table).as("tbl"), col("n_rows"),
          col("min_key"), col("max_key"))
    audit("documents", "doc_id")
      .unionByName(audit("orders", "o_orderkey"))
      .unionByName(audit("lineitem", "l_orderkey"))
      .orderBy(col("tbl"))
  }

  val q252Oracle: String =
    """SELECT 'documents' AS tbl, COUNT(*) AS n_rows,
      |  MIN(doc_id) AS min_key, MAX(doc_id) AS max_key FROM documents
      |UNION ALL
      |SELECT 'lineitem', COUNT(*), MIN(l_orderkey), MAX(l_orderkey)
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders', COUNT(*), MIN(o_orderkey), MAX(o_orderkey)
      |FROM orders
      |ORDER BY tbl""".stripMargin

  // --------------------------------------------------------------------
  // q258 — FILE-METADATA provenance columns: `_metadata.file_path` /
  // `_metadata.row_index` are hidden columns the parquet scan
  // materializes from the SPLIT, not from the data — zero bytes in the
  // files, available on any table, no schema change. Every earlier
  // provenance answer in the registry carries lineage as DATA (q159's
  // provenance columns, q78's manifest keys); this is the engine's
  // free alternative: which physical file does each row live in, and
  // at which position. The query writes documents into 8 hash-named
  // shard directories (repartition on the shard key → exactly one
  // file per shard), reads them back, and rebuilds the per-shard
  // inventory FROM THE FILE PATHS ALONE — the group key is a regexp
  // over _metadata.file_path and the position check is
  // max(_metadata.row_index), neither touching a data column. The
  // oracle recomputes the same inventory from doc_id arithmetic, so a
  // hash match proves path-derived provenance ≡ data-derived truth
  // (and max_ri = n_rows - 1 proves the one-file-per-shard layout).
  // MetadataColumnsSpec pins that the scan's ReadSchema stays
  // data-free (only doc_id's shard feed is read) — the metadata
  // columns must not widen the projection.
  // Scale notes (100 TB): file-level lineage (which input shard fed a
  // bad row, which file to quarantine/recompact) must not require
  // baking a path column into petabytes of data; the metadata column
  // is computed per-split at scan time and prunes like any other
  // column. row_index is per-file, so (file_path, row_index) is the
  // stable global row id a dedup/audit pipeline can cite.
  def q258FileProvenance(spark: SparkSession, dir: String): DataFrame = {
    val path = tmp(spark, "meta", dir)
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 8).cast("int").as("s"))
      .repartition(8, col("s"))
      .write.mode("overwrite").partitionBy("s").parquet(path)
    spark.read.parquet(path)
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
      .groupBy(regexp_extract(col("fp"), "/s=(\\d+)/", 1).cast("int")
        .as("shard"))
      .agg(count(lit(1)).as("n_rows"), max(col("ri")).as("max_ri"))
      .orderBy(col("shard"))
  }

  val q258Oracle: String =
    """SELECT CAST(doc_id % 8 AS INTEGER) AS shard,
      |  COUNT(*) AS n_rows, COUNT(*) - 1 AS max_ri
      |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin

  // --------------------------------------------------------------------
  // q260 — V2 WRITE commit protocol: the full task-stage / driver-
  // publish contract under a lakehouse sink ([[SinkSource]]). Every
  // earlier write in the registry rides an engine-managed committer
  // (parquet/ORC/CSV, q164's dynamic overwrite, q256's foreachBatch);
  // here the CONNECTOR owns the protocol: tasks stage attempt files
  // and report commit messages, the driver's single BatchWrite.commit
  // moves winners into data/ and swaps a manifest atomically, readers
  // plan from the manifest alone — so failed attempts, zombie
  // retries, and aborted queries are invisible by construction
  // (SinkProtocolSpec pins staging invisibility, abort cleanup, and
  // overwrite-as-truncate-at-commit). The query pushes the whole
  // events table through the sink keyed by event_id % 101 and
  // aggregates the read-back; the oracle aggregates the source — a
  // hash match gates the writer, the commit, the manifest, and the
  // reader end-to-end.
  // Scale notes (100 TB): this is the object-store sink discipline —
  // no rename-based directory commit (S3 renames are copies), one
  // driver-side manifest swap as the only atomic point, task retries
  // resolved by attempt-unique staged names + message-listed winners.
  def q260V2CommitWrite(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q260", dir)
    val keyed = Tables.events(spark, dir)
      .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, root, overwrite = true)
    SinkSource.load(spark, root)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .orderBy(col("k"))
  }

  val q260Oracle: String =
    """SELECT event_id % 101 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q261 — V2 METADATA delete: `DELETE FROM` resolved through a
  // TableCatalog onto [[SinkTable.deleteWhere]] — the delete drops
  // whole manifest entries (the layout key is the partition grain), no
  // data file is opened or rewritten, and `canDeleteWhere` REJECTS any
  // predicate finer than the key so a delete can never silently
  // approximate (SinkDeleteSpec pins the rejection and the
  // files-untouched property). The query stages the events frame,
  // deletes the k >= 64 tail plus the k = 3 partition, and aggregates
  // the survivors; the oracle applies the same predicate to the
  // source.
  // Scale notes (100 TB): GDPR-style deletes and retention sweeps on
  // a petabyte table must be manifest operations when the predicate
  // aligns with the partition grain — a rewrite-based delete of one
  // expired day in a date-partitioned corpus would copy the other
  // 9 999 days. The reject-don't-approximate contract is what makes
  // that safe to automate.
  def q261V2MetadataDelete(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q261", dir)
    val keyed = Tables.events(s, dir)
      .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_sink",
      classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql("DELETE FROM graft_sink.t WHERE k >= 64 OR k = 3")
    SinkSource.load(s, s"$root/t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .orderBy(col("k"))
  }

  val q261Oracle: String =
    """SELECT event_id % 101 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events
      |WHERE NOT (event_id % 101 >= 64 OR event_id % 101 = 3)
      |GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q263 — TIME TRAVEL (`VERSION AS OF`): the read-side dividend of
  // q260's versioned-manifest publish — every commit is an immutable,
  // addressable snapshot, and the catalog's versioned loadTable
  // returns a table whose scan plans from THAT manifest, concurrent
  // appends notwithstanding. The query builds a two-version history
  // (v1 = the base load, v2 = base + the late-arriving delta), then
  // joins the CURRENT per-key inventory against the v1 SNAPSHOT's —
  // the report a reproducibility audit runs ("what did training job X
  // actually read?"). The oracle derives both snapshots from the
  // source's own arithmetic (the delta is event_id % 3 = 0), so the
  // hash gate proves the pinned read returns exactly the v1 rows and
  // none of v2's. TimeTravelSpec additionally pins snapshot STABILITY
  // — the v1 relation answers identically before and after the append
  // — and that a GC'd/never-written version fails loudly rather than
  // reading empty.
  // Scale notes (100 TB): snapshot-pinned reads are how training runs
  // stay reproducible against a continuously-ingesting corpus — the
  // alternative (copying the corpus per run) is a petabyte copy. The
  // manifest IS the snapshot; no data movement, retention is the only
  // cost.
  def q263TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q263", dir)
    // deterministic two-version history per invocation
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def keyed(pred: org.apache.spark.sql.Column) =
      Tables.events(s, dir).filter(pred)
        .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
        .repartition(8, col("k"))
    SinkSource.write(keyed(col("event_id") % 3 =!= 0), s"$root/t",
      overwrite = true)                                     // manifest v1
    SinkSource.write(keyed(col("event_id") % 3 === 0), s"$root/t",
      overwrite = false)                                    // manifest v2
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql(
      """SELECT cur.k, snap.n_v1, cur.n_cur FROM
        |  (SELECT k, COUNT(*) AS n_cur FROM graft_sink.t GROUP BY k) cur
        |  LEFT JOIN
        |  (SELECT k, COUNT(*) AS n_v1 FROM graft_sink.t VERSION AS OF 1
        |   GROUP BY k) snap
        |  ON cur.k = snap.k
        |ORDER BY cur.k""".stripMargin)
  }

  val q263Oracle: String =
    """WITH cur AS (
      |  SELECT event_id % 101 AS k, COUNT(*) AS n_cur
      |  FROM events GROUP BY 1),
      |snap AS (
      |  SELECT event_id % 101 AS k, COUNT(*) AS n_v1
      |  FROM events WHERE event_id % 3 <> 0 GROUP BY 1)
      |SELECT cur.k, snap.n_v1, cur.n_cur
      |FROM cur LEFT JOIN snap ON cur.k = snap.k
      |ORDER BY cur.k""".stripMargin

  // --------------------------------------------------------------------
  // q265 — MANIFEST-stats aggregate pushdown: the V2 complement of
  // q252 (there the parquet FOOTERS answer min/max/count; here the
  // TABLE'S OWN commit metadata does). The sink's manifest carries
  // exact per-(key, file) row counts from the write path's commit
  // stats, so `COUNT(*) GROUP BY k` is answered by manifest arithmetic
  // with ZERO data files opened — `supportCompletePushDown` means
  // Spark plans no aggregate node at all, the scan IS the answer
  // (ManifestAggSpec proves it by answering correctly with the data
  // directory physically removed, and pins the fallback: any
  // aggregate beyond COUNT(*)-on-the-key-grain refuses the push and
  // row-scans). The query counts the staged events inventory per key;
  // the oracle counts the source.
  // Scale notes (100 TB): "how many rows/documents per partition" is
  // the most-run query against any corpus table — answering it from
  // manifests is the difference between a metadata read and a
  // petabyte scan, and it only works because the commit protocol
  // (q260) makes the stats exact, not estimates.
  def q265ManifestAgg(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q265", dir)
    val keyed = Tables.events(spark, dir)
      .select((col("event_id") % 29).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    SinkSource.load(spark, s"$root/t")
      .createOrReplaceTempView("graft_q265_t")
    spark.sql(
      """SELECT k, COUNT(*) AS n_rows FROM graft_q265_t
        |GROUP BY k ORDER BY k""".stripMargin)
  }

  val q265Oracle: String =
    """SELECT event_id % 29 AS k, COUNT(*) AS n_rows
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q269 — sink-DEMANDED clustering and ordering
  // ([[RequiresDistributionAndOrdering]]): the write declares
  // `clustered by k, sorted by (k, v)` and the ENGINE inserts the
  // exchange + sort in front of the writer — the caller does NOT
  // repartition. Every earlier keyed write in the registry
  // (q260/q261/q263/q265) pre-shuffles at the call site; here the
  // layout contract moves into the connector, which is how production
  // table formats (Iceberg write.distribution-mode, Delta optimized
  // writes) keep file counts bounded without trusting every writer.
  // The contract is IN the hash-gated result: `n_files` per key comes
  // from the manifest and the oracle asserts it is exactly 1 — if
  // Spark ignored the required distribution, a key would span tasks
  // and n_files would exceed 1. SinkClusterSpec additionally pins the
  // within-file (k, v) sort order and the >1-file contrast without
  // the clustered option.
  // Scale notes (100 TB): the small-files problem is a
  // write-distribution problem — files per partition must be bounded
  // by the partition grain, not partitions × writing tasks (10 000
  // tasks × 10 000 keys is 100 M files). Declaring the layout on the
  // sink makes that bound hold for every writer, and the
  // within-partition sort is what makes downstream range/merge scans
  // and run-length encodings effective.
  def q269ClusteredWrite(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q269", dir)
    val keyed = Tables.events(spark, dir)
      .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
    // no caller-side repartition: the sink's required distribution
    // inserts the cluster-by-k exchange and the (k, v) sort
    SinkSource.write(keyed, s"$root/t", overwrite = true, clustered = true)
    val files = SinkSource.manifest(s"$root/t")
      .groupBy(_._1).toSeq
      .map { case (k, es) => (k, es.map(_._2).distinct.size.toLong) }
    val filesDf = spark.createDataFrame(files).toDF("k", "n_files")
    SinkSource.load(spark, s"$root/t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .join(broadcast(filesDf), Seq("k"))
      .select(col("k"), col("n_files"), col("n_rows"), col("sum_v"))
      .orderBy(col("k"))
  }

  val q269Oracle: String =
    """SELECT event_id % 101 AS k, CAST(1 AS BIGINT) AS n_files,
      |  COUNT(*) AS n_rows, CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q270 — TOP-N / LIMIT pushdown into the connector
  // ([[org.apache.spark.sql.connector.read.SupportsPushDownTopN]] /
  // `SupportsPushDownLimit`): `ORDER BY v DESC LIMIT 10` reaches the
  // scan, and each partition reader answers it with a bounded 10-row
  // HEAP over its file instead of draining the partition — the
  // engine's TakeOrderedAndProject merges the per-partition
  // candidates (partial pushdown: the connector guarantees its
  // candidates contain the partition's true top-n; the global cut
  // stays with Spark). An expression sort key refuses the push and
  // falls back to the full scan + engine sort — pushdown may reduce
  // I/O, never change semantics. SinkTopNSpec drives the reader
  // directly (100-row file → exactly 5 candidate rows out), pins the
  // pushedTopN/pushedLimit plan markers, the plain-LIMIT early-stop,
  // and the expression-sort fallback.
  // Scale notes (100 TB): "show me the newest/largest n" is a
  // constant of corpus triage; without pushdown it drains the table
  // through a sort. With it, I/O is n rows per partition and the
  // network carries n × partitions candidates. The plain-LIMIT path
  // matters for `LIMIT 100` peeks: readers stop mid-file.
  def q270TopNPushdown(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q270", dir)
    val keyed = Tables.events(spark, dir)
      .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    SinkSource.load(spark, s"$root/t")
      .orderBy(col("v").desc)
      .limit(10)
  }

  val q270Oracle: String =
    """SELECT event_id % 101 AS k, CAST(event_id AS BIGINT) AS v
      |FROM events ORDER BY v DESC LIMIT 10""".stripMargin

  // --------------------------------------------------------------------
  // q271 — CONNECTOR-reported statistics ([[SupportsReportStatistics]],
  // SinkSource `stats=true`): the commit protocol's manifest already
  // carries exact row counts, so the scan reports the table's true
  // size to the optimizer and the dim-side of the join goes BROADCAST
  // with no ANALYZE pass and no hint — stats-blind V2 reads cost the
  // unknowable default size and plan a sort-merge join (the contrast
  // SinkStatsSpec pins on the INITIAL plans, before AQE can rescue
  // either). The query builds a per-key dim through the sink, joins
  // the events feed against it, and aggregates; the oracle derives
  // the dim from the source.
  // Scale notes (100 TB): a fact-dim join where the engine cannot see
  // the dim's size shuffles the FACT — the 100 TB side — on a
  // guess. AQE can demote to broadcast only AFTER the fact's map
  // stage ran; connector stats make the right plan the FIRST plan,
  // which is the entire point of keeping exact counts in commit
  // metadata.
  def q271ReportedStats(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q271", dir)
    val ev = Tables.events(spark, dir)
      .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
    SinkSource.write(
      ev.groupBy(col("k")).agg(count(lit(1)).as("v")).repartition(4, col("k")),
      s"$root/dim", overwrite = true)
    val dim = SinkSource.load(spark, s"$root/dim", stats = true)
      .withColumnRenamed("v", "dim_n")
    ev.join(dim, Seq("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), max(col("dim_n")).as("dim_n"),
        sum(col("v")).as("sum_v"))
      .orderBy(col("k"))
  }

  val q271Oracle: String =
    """WITH dim AS (
      |  SELECT event_id % 101 AS k, COUNT(*) AS dim_n
      |  FROM events GROUP BY 1)
      |SELECT e.k, COUNT(*) AS n_rows, MAX(dim.dim_n) AS dim_n,
      |  CAST(SUM(e.v) AS BIGINT) AS sum_v
      |FROM (SELECT event_id % 101 AS k, event_id AS v FROM events) e
      |JOIN dim ON e.k = dim.k
      |GROUP BY e.k ORDER BY e.k""".stripMargin

  // --------------------------------------------------------------------
  // q274 — row-level UPDATE (copy-on-write,
  // [[org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations]]):
  // `UPDATE graft_sink.t SET ... WHERE k % 10 = 3 AND v % 2 = 0` — a
  // predicate FINER than the layout key, which q261's metadata arm
  // rejects by design. The engine rewrites the DML into scan-affected-
  // groups → recompute every row → replace those groups; the
  // connector's contract is GROUP identity: its row-level scan
  // records the file set it finally planned (after the engine's
  // runtime group filter derived the affected keys and pruned the
  // rest via a dynamic-pruning subquery), and commit publishes a
  // manifest where exactly those files are swapped — untouched
  // groups' entries carried verbatim (SinkRowLevelSpec pins the
  // blast radius, the fine-delete rewrite, metadata-delete
  // coexistence, and MERGE below). The oracle recomputes the updated
  // table from the source.
  // Scale notes (100 TB): copy-on-write UPDATE cost must be
  // proportional to the AFFECTED partitions, not the table — the
  // runtime group filter is what turns "rewrite 10 of 101 keys" from
  // a full-table rewrite into a 10% one. The swap is atomic at the
  // manifest publish, so readers never see a half-updated table.
  def q274RowLevelUpdate(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q274", dir)
    // UPDATE is not idempotent: rebuild the table every invocation
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val keyed = Tables.events(s, dir)
      .select((col("event_id") % 101).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql("UPDATE graft_sink.t SET v = v + 1000000 " +
      "WHERE k % 10 = 3 AND v % 2 = 0")
    SinkSource.load(s, s"$root/t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .orderBy(col("k"))
  }

  val q274Oracle: String =
    """SELECT event_id % 101 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN (event_id % 101) % 10 = 3 AND event_id % 2 = 0
      |    THEN event_id + 1000000 ELSE event_id END) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q275 — MERGE INTO (upsert) through the same copy-on-write group
  // rewrite: matched rows update in place, unmatched source rows
  // insert — the canonical continuous-ingest primitive (dedup-on-load,
  // dimension upkeep, late-correction backfill). The engine plans the
  // join of target groups against the source, the connector replaces
  // exactly the scanned groups and appends the insert rows in the
  // same atomic manifest publish — one commit, never an
  // update-then-insert window. The oracle derives the post-merge
  // state from the source tables alone.
  // Scale notes (100 TB): MERGE is THE operation continuous corpora
  // live on; what keeps it affordable is the same group contract as
  // q274 (touch only groups the ON clause can reach) plus atomic
  // publish so a failed merge is a no-op, not a half-upsert.
  def q275MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q275", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def keyed(pred: org.apache.spark.sql.Column) =
      Tables.events(s, dir).filter(pred)
        .select((col("event_id") % 61).as("k"), col("event_id").as("v"))
    SinkSource.write(keyed(col("event_id") % 3 =!= 0).repartition(8, col("k")),
      s"$root/t", overwrite = true)
    keyed(col("event_id") % 3 === 0 || col("event_id") % 6 === 1)
      .createOrReplaceTempView("graft_q275_changes")
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql(
      """MERGE INTO graft_sink.t
        |USING graft_q275_changes c ON t.k = c.k AND t.v = c.v
        |WHEN MATCHED THEN UPDATE SET v = t.v + 1000000000
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (c.k, c.v)
        |""".stripMargin)
    SinkSource.load(s, s"$root/t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .orderBy(col("k"))
  }

  val q275Oracle: String =
    """SELECT event_id % 61 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN event_id % 6 = 1
      |    THEN event_id + 1000000000 ELSE event_id END) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q276 — catalog PROCEDURE (`CALL graft_sink.compact('t')`,
  // [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]): table
  // maintenance as a catalog verb with typed parameters and a result
  // set — the surface Iceberg ships rewrite_data_files /
  // expire_snapshots on. The compact procedure merges every key group
  // that spans multiple files into one file per key: the rewrite is
  // DISTRIBUTED (multi-file keys' rows staged through a keyed
  // repartition write into a scratch table), the swap is a driver-side
  // manifest publish, and the CALL returns (keys_compacted,
  // files_before, files_after). The query scatters events across two
  // appends (4 writing tasks each → up to 8 files per key), compacts,
  // and proves the result both ways: per-key n_files from the manifest
  // is IN the hash-gated result (oracle says 1), and the row contents
  // survived the rewrite byte-for-byte. SinkCompactSpec additionally
  // pins the summary row, idempotence (second CALL compacts 0 keys),
  // and read-identity across the swap.
  // Scale notes (100 TB): frequent commits grow file counts linearly
  // with commit rate (q264's per-epoch files); scan planning and open()
  // overheads drown long before data volume matters. Compaction must
  // be proportional to the multi-file GROUPS, not the table — and the
  // publish must stay a metadata swap so readers never block.
  def q276CompactProcedure(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q276", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def keyed(pred: org.apache.spark.sql.Column) =
      Tables.events(s, dir).filter(pred)
        .select((col("event_id") % 47).as("k"), col("event_id").as("v"))
        .repartition(4) // round-robin: every task sees every key
    SinkSource.write(keyed(col("event_id") % 2 === 0), s"$root/t",
      overwrite = true)
    SinkSource.write(keyed(col("event_id") % 2 =!= 0), s"$root/t",
      overwrite = false)
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql("CALL graft_sink.compact('t')").collect()
    val files = SinkSource.manifest(s"$root/t")
      .groupBy(_._1).toSeq
      .map { case (k, es) => (k, es.map(_._2).distinct.size.toLong) }
    val filesDf = s.createDataFrame(files).toDF("k", "n_files")
    SinkSource.load(s, s"$root/t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .join(broadcast(filesDf), Seq("k"))
      .select(col("k"), col("n_files"), col("n_rows"), col("sum_v"))
      .orderBy(col("k"))
  }

  val q276Oracle: String =
    """SELECT event_id % 47 AS k, CAST(1 AS BIGINT) AS n_files,
      |  COUNT(*) AS n_rows, CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q277 — MERGE-ON-READ delete with positional DELETION VECTORS
  // ([[org.apache.spark.sql.connector.write.SupportsDelta]], catalog
  // option `mor=true`): the dual of q274's copy-on-write arm and the
  // fundamental table-format trade. The engine's WriteDelta plan hands
  // each matched row's physical identity — the (_file, _pos) metadata
  // columns, declared as the operation's rowId — to the delta writer,
  // which emits one positional deletion vector per data file; commit
  // publishes the vectors in the version's delete sidecar and carries
  // data entries VERBATIM (no data file opened for writing —
  // SinkMorSpec pins byte-identical data files across two deletes,
  // vector accumulation, sidecar carry-forward on append, per-version
  // vectors under time travel, and pushdown refusal). Readers merge:
  // each split opens only ITS file's vectors and skips those
  // positions. The query stages events, deletes two overlapping
  // fine-grained slices, and aggregates the survivors; the oracle
  // applies the same predicates.
  // Scale notes (100 TB): GDPR erasure and spam takedowns are
  // frequent, small, and row-level — copy-on-write rewrites whole
  // groups for a 0.1% tombstone rate, merge-on-read makes the delete
  // O(matched rows) and defers the rewrite to compaction (q276). The
  // refused pushdowns are the honest price: manifest counts ignore
  // tombstones, so MoR reads must go through the merging scan.
  def q277MorDelete(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q277", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val keyed = Tables.events(s, dir)
      .select((col("event_id") % 73).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")
    s.sql("DELETE FROM graft_mor.t WHERE v % 5 = 2")
    s.sql("DELETE FROM graft_mor.t WHERE v % 7 = 3 AND k < 40")
    s.sql(
      """SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM graft_mor.t GROUP BY k ORDER BY k""".stripMargin)
  }

  val q277Oracle: String =
    """SELECT event_id % 73 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events
      |WHERE NOT (event_id % 5 = 2)
      |  AND NOT (event_id % 7 = 3 AND event_id % 73 < 40)
      |GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q279 — MERGE-ON-READ update (vector + append in one commit): the
  // delta writer's UPDATE arm ([[SinkDvWriter.update]]) tombstones the
  // matched row's (_file, _pos) AND stages the new row like any keyed
  // write; commit publishes the deletion vectors in the sidecar and
  // the appended files in the manifest atomically — one version,
  // never a delete-then-insert window, and no existing data file is
  // opened (SinkMorSpec pins untouched originals + new appended
  // files, and that a later DELETE addresses appended positions too).
  // Unlike q277's pure-metadata delete, UPDATE exercises the engine's
  // WriteDelta row dispatch: matched rows arrive through
  // update(meta, id, newRow) with the row projected to the table
  // schema — the projection machinery ReplaceData (q274) lacks. The
  // query updates a fine-grained slice twice (the second update hits
  // rows the first APPENDED, proving appended positions are
  // first-class row identities); the oracle replays both updates.
  // Scale notes (100 TB): label fixes and quality-score refreshes are
  // UPDATE-shaped and frequent; merge-on-read makes each one
  // O(matched rows) instead of O(touched groups), at the price of
  // read-side merge — the same trade as q277, now for the write path
  // production pipelines use most.
  def q279MorUpdate(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q279", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val keyed = Tables.events(s, dir)
      .select((col("event_id") % 67).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")
    s.sql("UPDATE graft_mor.t SET v = v + 10000000 WHERE v % 11 = 6")
    // second pass hits some rows the first APPENDED (their new v
    // keeps v % 11 = 6 + 10000000 ≡ ...), plus fresh originals
    s.sql("UPDATE graft_mor.t SET v = v + 100000000 WHERE v % 13 = 2")
    s.sql(
      """SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM graft_mor.t GROUP BY k ORDER BY k""".stripMargin)
  }

  val q279Oracle: String =
    """WITH pass1 AS (
      |  SELECT event_id % 67 AS k,
      |    CASE WHEN event_id % 11 = 6 THEN event_id + 10000000
      |         ELSE event_id END AS v
      |  FROM events)
      |SELECT k, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN v % 13 = 2 THEN v + 100000000 ELSE v END)
      |    AS BIGINT) AS sum_v
      |FROM pass1 GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q280 — VACUUM: deletion-vector purge via the compaction procedure
  // on a merge-on-read table. q277/q279 defer their rewrite cost to
  // maintenance; this is the bill coming due: `CALL
  // graft_mor.compact('t')` targets every key whose files are split
  // OR carry vectors, rewrites those keys through a VECTOR-MERGING
  // read (tombstoned rows fall out of the rewrite — they are
  // materialized, not copied), swaps the manifest, and retires the
  // now-fully-applied vectors from the sidecar. After the call the
  // table is pure data again: one file per key, empty sidecar,
  // pushdown-eligible once more. The hash-gated result carries
  // per-key n_files (oracle: 1) over the post-delete/update state;
  // SinkVacuumSpec pins the sidecar emptying, vector-file GC, and
  // read-identity across the purge.
  // Scale notes (100 TB): MoR's read-side merge cost and DV metadata
  // grow with every delete — vacuum is what keeps the trade honest.
  // The rewrite is proportional to VECTORED groups (clean keys'
  // files are untouched), distributed like any scan, and atomic at
  // the manifest swap, so readers never see a half-vacuumed table.
  def q280MorVacuum(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q280", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val keyed = Tables.events(s, dir)
      .select((col("event_id") % 59).as("k"), col("event_id").as("v"))
      .repartition(8, col("k"))
    SinkSource.write(keyed, s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")
    s.sql("DELETE FROM graft_mor.t WHERE v % 6 = 5")
    s.sql("UPDATE graft_mor.t SET v = v + 20000000 WHERE v % 17 = 4")
    s.sql("CALL graft_mor.compact('t')").collect()
    val files = SinkSource.manifest(s"$root/t")
      .groupBy(_._1).toSeq
      .map { case (k, es) => (k, es.map(_._2).distinct.size.toLong) }
    val filesDf = s.createDataFrame(files).toDF("k", "n_files")
    SinkSource.load(s, s"$root/t", mor = true)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .join(broadcast(filesDf), Seq("k"))
      .select(col("k"), col("n_files"), col("n_rows"), col("sum_v"))
      .orderBy(col("k"))
  }

  val q280Oracle: String =
    """WITH alive AS (
      |  SELECT event_id % 59 AS k,
      |    CASE WHEN event_id % 17 = 4 THEN event_id + 20000000
      |         ELSE event_id END AS v
      |  FROM events WHERE event_id % 6 <> 5)
      |SELECT k, CAST(1 AS BIGINT) AS n_files, COUNT(*) AS n_rows,
      |  CAST(SUM(v) AS BIGINT) AS sum_v
      |FROM alive GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q283 — WRITE-AUDIT-PUBLISH via snapshot TAGS (`CALL
  // graft_sink.tag('t', v, 'published')` + `VERSION AS OF
  // 'published'`): appends create CANDIDATE versions, an audit reads
  // the candidate by NUMBER, and only moving the named tag makes it
  // visible to consumers subscribed by NAME — promotion is a
  // metadata pointer swap, independent of table size, and an
  // unaudited later append (v3 here) stays invisible until someone
  // moves the tag. The query stages v1 (tag it), appends an audited
  // v2 (audit passes → move the tag), appends an UNAUDITED v3, and
  // answers from `VERSION AS OF 'published'` — the oracle reproduces
  // exactly v2's cumulative state, so a hash match proves the tag
  // gates v3 out. TagSpec pins tag moves, unknown-tag loud failure,
  // and out-of-history rejection.
  // Scale notes (100 TB): corpus releases are WAP — ingest runs
  // continuously, consumers gate on 'published', QA promotes with a
  // pointer. The audit step reading BY NUMBER is what makes the gate
  // real: the candidate is immutable while under review.
  def q283WriteAuditPublish(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q283", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def keyed(i: Int) =
      Tables.events(s, dir).filter(col("event_id") % 3 === i)
        .select((col("event_id") % 19).as("k"), col("event_id").as("v"))
        .repartition(8, col("k"))
    SinkSource.write(keyed(0), s"$root/t", overwrite = true)  // v1
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql("CALL graft_sink.tag('t', 1, 'published')").collect()
    SinkSource.write(keyed(1), s"$root/t", overwrite = false) // v2 candidate
    // the audit reads the CANDIDATE by number; here it checks row
    // sanity (no negative keys) before promoting
    val bad = s.sql(
      "SELECT COUNT(*) FROM graft_sink.t VERSION AS OF 2 WHERE k < 0")
      .collect()(0).getLong(0)
    if (bad == 0)
      s.sql("CALL graft_sink.tag('t', 2, 'published')").collect()
    SinkSource.write(keyed(2), s"$root/t", overwrite = false) // v3 UNAUDITED
    s.sql(
      """SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM graft_sink.t VERSION AS OF 'published'
        |GROUP BY k ORDER BY k""".stripMargin)
  }

  val q283Oracle: String =
    """SELECT event_id % 19 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events WHERE event_id % 3 <> 2
      |GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q284 — row-level LINEAGE through connector metadata columns: MoR
  // tables expose each row's physical identity — the same (_file,
  // _pos) pair the deletion vectors address — as queryable columns
  // through the NORMAL read path, which requires the scan to honor
  // the engine's projection (SupportsPushDownRequiredColumns on the
  // MoR scan builder; a plain `SELECT k` now prunes to one column
  // too). This is the V2-table complement of q258's parquet
  // `_metadata`: there the FORMAT serves file provenance, here the
  // TABLE's own row identity does — and because the table was
  // written CLUSTERED (q269), the lineage is deterministic: one file
  // per key, positions 0..n-1, and the file NAME encodes the key,
  // which the query cross-checks row-by-row (name_matches = n_rows
  // is in the hash-gated result). MorLineageSpec pins the pruned
  // ReadSchema marker and identity-vs-vector agreement (the _pos a
  // lineage query reports is the _pos a DELETE tombstones).
  // Scale notes (100 TB): quarantine-and-recompact workflows need
  // "which physical slot did this bad row come from" WITHOUT baking
  // provenance into petabytes of data — row identity is computed at
  // scan time from the split, prunes like any column, and is exactly
  // what a targeted deletion vector then addresses.
  def q284MorLineage(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q284", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val keyed = Tables.events(s, dir)
      .select((col("event_id") % 53).as("k"), col("event_id").as("v"))
    SinkSource.write(keyed, s"$root/t", overwrite = true, clustered = true)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")
    s.sql(
      """SELECT k,
        |  COUNT(DISTINCT _file) AS n_files,
        |  COUNT(*) AS n_rows,
        |  CAST(MAX(_pos) AS BIGINT) AS max_pos,
        |  SUM(CASE WHEN CAST(regexp_extract(_file, '_k(\\d+)\\.psv$', 1)
        |             AS BIGINT) = k THEN 1 ELSE 0 END) AS name_matches
        |FROM graft_mor.t GROUP BY k ORDER BY k""".stripMargin)
  }

  val q284Oracle: String =
    """SELECT event_id % 53 AS k, CAST(1 AS BIGINT) AS n_files,
      |  COUNT(*) AS n_rows, COUNT(*) - 1 AS max_pos,
      |  COUNT(*) AS name_matches
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q285 — SNAPSHOT EXPIRY (`CALL graft_sink.expire('t', keep_last)`):
  // the lifecycle verb that closes the versioned-manifest design. The
  // publish path keeps every snapshot (q263's time travel, q267's
  // changelog), so at production commit rates history — and any data
  // files pinned ONLY by old snapshots — grows without bound; expiry
  // prunes to the newest keep_last versions, always keeps TAG-PINNED
  // versions (a tag is a promise to name-subscribed readers), and GCs
  // exactly the files referenced only by expired snapshots (files any
  // survivor cites are untouched; unreferenced crash orphans are out
  // of scope — Iceberg's expire_snapshots / remove_orphan_files
  // split). The query builds a 4-commit history, tags v2 'release',
  // expires to keep_last=2 (v1 goes; v2 survives BY TAG past the
  // horizon), and answers from the current and tag-pinned reads plus
  // the procedure's summary and an in-query proof that the expired v1
  // pin now fails loudly — all hash-gated. SinkExpireSpec pins
  // survivor read-identity, shared-file GC safety, exclusive-file GC,
  // and idempotence.
  // Scale notes (100 TB): snapshot expiry is driver-side metadata
  // work plus deletes proportional to what EXPIRED — never a data
  // scan. It is the knob that turns keep-everything reproducibility
  // into a bounded retention window with named releases kept forever.
  def q285ExpireSnapshots(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q285", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def keyed(i: Int) =
      Tables.events(s, dir).filter(col("event_id") % 4 === i)
        .select((col("event_id") % 23).as("k"), col("event_id").as("v"))
        .repartition(4, col("k"))
    SinkSource.write(keyed(0), s"$root/t", overwrite = true)  // v1
    SinkSource.write(keyed(1), s"$root/t", overwrite = false) // v2
    SinkSource.write(keyed(2), s"$root/t", overwrite = false) // v3
    SinkSource.write(keyed(3), s"$root/t", overwrite = false) // v4
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql("CALL graft_sink.tag('t', 2, 'release')").collect()
    val sum = s.sql("CALL graft_sink.expire('t', 2)").collect()(0)
    // the expired v1 pin must now fail loudly, never serve stale data
    val expiredPinFails =
      try { s.sql("SELECT * FROM graft_sink.t VERSION AS OF 1").collect(); 0L }
      catch { case _: Exception => 1L }
    val reads = s.sql(
      """SELECT 'current' AS src, COUNT(*) AS n_rows,
        |  CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM graft_sink.t
        |UNION ALL
        |SELECT 'release' AS src, COUNT(*) AS n_rows,
        |  CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM graft_sink.t VERSION AS OF 'release'""".stripMargin)
    reads
      .withColumn("versions_expired", lit(sum.getLong(0)))
      .withColumn("versions_kept", lit(sum.getLong(1)))
      .withColumn("expired_pin_fails", lit(expiredPinFails))
      .orderBy(col("src"))
  }

  val q285Oracle: String =
    """SELECT 'current' AS src, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS versions_expired,
      |  CAST(3 AS BIGINT) AS versions_kept,
      |  CAST(1 AS BIGINT) AS expired_pin_fails
      |FROM events
      |UNION ALL
      |SELECT 'release' AS src, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT)
      |FROM events WHERE event_id % 4 <= 1
      |ORDER BY src""".stripMargin

  // --------------------------------------------------------------------
  // q286 — queryable METADATA TABLES (`SELECT ... FROM
  // graft_sink.t.history / t.files`): the table's own snapshot and
  // file inventory exposed as V2 relations — Iceberg's metadata-table
  // surface, Delta's DESCRIBE HISTORY — resolved through a multipart
  // identifier one level below the table and served by a LocalScan
  // (the rows ARE manifest/sidecar/tag arithmetic; zero data files
  // opened, zero tasks — a NEW plan shape: first V2 TABLE whose scan
  // is driver-local metadata, the table-read dual of the procedures'
  // LocalScan result sets). The query builds a 3-commit clustered
  // history with key-disjoint slices (commit i writes keys ≡ i mod 3,
  // 7 keys each → exactly 7 new files per commit), tags v2, and
  // answers from the history table — version, cumulative file and row
  // counts, the tag — cross-checked against a files-table aggregate
  // (21 one-per-key files, total rows = events), all hash-gated
  // against an oracle that derives every number from the source.
  // SinkMetaSpec pins the files table's per-entry rows, vector
  // accounting after a MoR delete, and expiry showing up in history.
  // Scale notes (100 TB): operators triage table health (file-count
  // skew, snapshot growth, tombstone debt) from these relations —
  // which must cost METADATA, not a scan; t.files is thousands of
  // rows where the data is billions.
  def q286MetadataTables(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q286", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def keyed(i: Int) =
      Tables.events(s, dir).filter(col("event_id") % 3 === i)
        .select(((col("event_id") % 7) * 3 + i).as("k"),
          col("event_id").as("v"))
    // clustered: one file per key per commit; key spaces are disjoint
    // across commits, so history's n_files is exactly 7 * version
    SinkSource.write(keyed(0), s"$root/t", overwrite = true,
      clustered = true)                                          // v1
    SinkSource.write(keyed(1), s"$root/t", overwrite = false,
      clustered = true)                                          // v2
    SinkSource.write(keyed(2), s"$root/t", overwrite = false,
      clustered = true)                                          // v3
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    s.sql("CALL graft_sink.tag('t', 2, 'audited')").collect()
    // files-table cross-check: bounded 1-row metadata aggregate
    val fa = s.sql(
      """SELECT COUNT(*) AS c, CAST(SUM(n_rows) AS BIGINT) AS s
        |FROM graft_sink.t.files""".stripMargin).collect()(0)
    s.sql(
      """SELECT version, n_files, n_rows, tags
        |FROM graft_sink.t.history ORDER BY version""".stripMargin)
      .withColumn("files_rows", lit(fa.getLong(0)))
      .withColumn("files_total", lit(fa.getLong(1)))
  }

  val q286Oracle: String =
    """SELECT CAST(1 AS BIGINT) AS version, CAST(7 AS BIGINT) AS n_files,
      |  COUNT(*) FILTER (WHERE event_id % 3 = 0) AS n_rows, '' AS tags,
      |  CAST(21 AS BIGINT) AS files_rows, COUNT(*) AS files_total
      |FROM events
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), CAST(14 AS BIGINT),
      |  COUNT(*) FILTER (WHERE event_id % 3 <= 1), 'audited',
      |  CAST(21 AS BIGINT), COUNT(*)
      |FROM events
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), CAST(21 AS BIGINT), COUNT(*), '',
      |  CAST(21 AS BIGINT), COUNT(*)
      |FROM events
      |ORDER BY version""".stripMargin

  // --------------------------------------------------------------------
  // q287 — WRITE-SIDE PARTITION TRANSFORM (`bucket(8, k)` demanded by
  // the sink): the table reports transform partitioning
  // (Table.partitioning) and its write requires
  // `clustered(bucket(8, k))` — a FUNCTION of the key, resolved and
  // bound through the table's own V2 FunctionCatalog (SinkCatalog
  // serves `bucket`; the Iceberg mechanism), so the engine's exchange
  // hashes rows by the transform's RESULT. This is the write dual of
  // q251's read-side storage-partitioned join and a distribution
  // shape no other query plans: q269 clusters by the raw COLUMN
  // (co-bucketed keys scatter across tasks); here a BUCKET never
  // spans writer tasks — at most 8 writing tasks per commit however
  // many keys — which the query proves in the hash-gated result
  // (n_writer_tasks per bucket = 1, from the manifest's task-id file
  // names). Read-back aggregates per bucket against the source
  // oracle. Also the registry's first V2 CREATE surface
  // (writeTo(...).create() through TableCatalog.createTable).
  // SinkBucketWriteSpec pins the reported partitioning, bucket-whole
  // task placement, and foreign-schema rejection.
  // Scale notes (100 TB): declared write transforms pin the layout
  // invariant AT THE TABLE — ingest, compaction, and backfill all
  // inherit the same bucketing instead of each job re-implementing
  // repartition discipline; bounded file counts (buckets, not
  // keys × tasks) and trustworthy read-side SPJ follow.
  def q287BucketTransformWrite(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q287", dir)
    SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    s.conf.set("spark.sql.catalog.graft_bt", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_bt.root", root)
    s.conf.set("spark.sql.catalog.graft_bt.bucketWrite", "true")
    Tables.events(s, dir)
      .select((col("event_id") % 40).as("k"), col("event_id").as("v"))
      .writeTo("graft_bt.t").create()
    // bucket-wholeness from the commit metadata: distinct writer task
    // ids per bucket (file names carry p<pid>_) — the transform
    // contract says exactly one
    val pid = "p(\\d+)_".r
    val tasks = SinkSource.manifest(s"$root/t")
      .groupBy { case (k, _, _) => ((k % 8) + 8) % 8 }
      .toSeq.map { case (b, es) =>
        (b, es.map(e => pid.findFirstMatchIn(e._2).get.group(1))
          .distinct.size.toLong) }
    val tasksDf = s.createDataFrame(tasks).toDF("bucket", "n_writer_tasks")
    s.table("graft_bt.t")
      .groupBy((col("k") % 8).as("bucket"))
      .agg(countDistinct(col("k")).as("n_keys"),
        count(lit(1)).as("n_rows"),
        sum(col("v")).as("sum_v"))
      .join(broadcast(tasksDf), Seq("bucket"))
      .select(col("bucket"), col("n_keys"), col("n_rows"), col("sum_v"),
        col("n_writer_tasks"))
      .orderBy(col("bucket"))
  }

  val q287Oracle: String =
    """SELECT (event_id % 40) % 8 AS bucket,
      |  COUNT(DISTINCT event_id % 40) AS n_keys, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS n_writer_tasks
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------------
  // q288 — MERGE-ON-READ MERGE (WriteDelta + MergeRows): the upsert
  // dual of q275's copy-on-write MERGE and the third arm of the MoR
  // delta family (q277 DELETE, q279 UPDATE). The engine's
  // RewriteMergeIntoTable plans MergeRows over the delta scan (table
  // columns + (_file,_pos) identity, existing vectors applied) and a
  // WriteDelta whose writer receives each output row WITH its
  // operation: matched UPDATEs tombstone the old position and stage
  // the new row, not-matched INSERTs stage like any append — ONE
  // commit publishes vectors + appended files atomically, and no
  // existing data file is opened for writing. A plan shape no other
  // query exercises: q275's MERGE is ReplaceData (group rewrite),
  // q277/q279 are single-command deltas; this is the delta MERGE.
  // The query upserts a source that UPDATES every 5th event (shifts
  // its key space by 31) and INSERTS a disjoint tail (k=77), then
  // aggregates the post-merge table; the oracle recomputes the final
  // state arithmetically from the source. SinkMorMergeSpec pins
  // byte-identical base data files across the MERGE, the one-commit
  // vector+append publish, and tombstone accounting.
  // Scale notes (100 TB): continuous upsert feeds (dedup'd ingest,
  // label fixes, CDC apply) cannot afford q275's group rewrites at
  // high frequency — MoR MERGE costs O(changed rows) per batch and
  // defers rewriting to compaction, exactly Iceberg-v2/Delta-DV
  // upsert economics.
  def q288MorMerge(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q288", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val base = Tables.events(s, dir)
      .select((col("event_id") % 31).as("k"), col("event_id").as("v"))
    SinkSource.write(base, s"$root/t", overwrite = true, clustered = true)
    s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mor.root", root)
    s.conf.set("spark.sql.catalog.graft_mor.mor", "true")
    val updates = Tables.events(s, dir)
      .filter(col("event_id") % 5 === 0)
      .select((col("event_id") % 31).as("k"), col("event_id").as("v"))
    val inserts = Tables.events(s, dir)
      .filter(col("event_id") % 7 === 0)
      .select(lit(77L).as("k"),
        (col("event_id") + lit(1000000000L)).as("v"))
    updates.unionByName(inserts).createOrReplaceTempView("q288_src")
    s.sql(
      """MERGE INTO graft_mor.t t USING q288_src s ON t.v = s.v
        |WHEN MATCHED THEN UPDATE SET k = s.k + 31, v = t.v
        |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
        |""".stripMargin)
    s.sql(
      """SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
        |FROM graft_mor.t GROUP BY k ORDER BY k""".stripMargin)
  }

  val q288Oracle: String =
    """SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
      |FROM (
      |  SELECT CASE WHEN event_id % 5 = 0 THEN event_id % 31 + 31
      |              ELSE event_id % 31 END AS k,
      |         event_id AS v
      |  FROM events
      |  UNION ALL
      |  SELECT 77 AS k, event_id + 1000000000 AS v
      |  FROM events WHERE event_id % 7 = 0
      |) GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q289 — OVERWRITE BY FILTER (SupportsOverwrite →
  // OverwriteByExpression): `writeTo(t).overwrite(k IN (3,4))` hands
  // the condition to the CONNECTOR, which executes it at commit as one
  // atomic version — matched keys' manifest entries swap for the
  // staged files, every other entry carries verbatim, replaced files
  // GC only after the manifest stops citing them. A write-plan shape
  // no other query exercises: q260 appends, q263's truncate replaces
  // everything, q164's dynamic overwrite is engine-managed parquet and
  // discovers partitions from the DATA — here the overwrite scope is
  // DECLARED, checked against the layout (a non-key-aligned condition
  // fails the statement loudly rather than approximating — the
  // deleteWhere exactness bar on the write side), and costs metadata
  // plus the new rows, never a read of kept groups. The query
  // backfills two keys with corrected values over a 13-key table; the
  // oracle recomputes the final state from the source.
  // SinkOverwriteSpec pins single-version publish, verbatim kept
  // entries, replaced-file GC, and the unaligned-condition rejection.
  // Scale notes (100 TB): partition backfills (a bad day's re-ingest,
  // a corrected region) are THE bulk-correction primitive; declared-
  // scope overwrite is how they stay metadata swaps instead of table
  // rewrites, and how a typo'd condition fails instead of silently
  // truncating more than intended.
  def q289OverwriteByFilter(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q289", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val base = Tables.events(s, dir)
      .select((col("event_id") % 13).as("k"), col("event_id").as("v"))
    SinkSource.write(base, s"$root/t", overwrite = true)          // v1
    s.conf.set("spark.sql.catalog.graft_sink", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_sink.root", root)
    // the backfill: corrected rows for keys 3 and 4 only, scope DECLARED
    Tables.events(s, dir)
      .filter((col("event_id") % 13).isin(3L, 4L))
      .select((col("event_id") % 13).as("k"),
        (col("event_id") + lit(1000000000L)).as("v"))
      .writeTo("graft_sink.t")
      .overwrite(col("k") === 3L || col("k") === 4L)              // v2
    val nVersions = SinkSource.currentVersion(s"$root/t").toLong
    s.table("graft_sink.t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("n_versions", lit(nVersions))
      .orderBy(col("k"))
  }

  val q289Oracle: String =
    """SELECT event_id % 13 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN event_id % 13 IN (3, 4)
      |    THEN event_id + 1000000000 ELSE event_id END) AS BIGINT) AS sum_v,
      |  CAST(2 AS BIGINT) AS n_versions
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q290 — partition management DDL (SupportsPartitionManagement,
  // catalog option `partman=true`): the sink's one-group-per-key
  // layout surfaced as identity partitioning to the SQL partition
  // verbs — SHOW PARTITIONS lists the manifest's distinct keys
  // (metadata-only; SinkPartitionMgmtSpec's kill-shot answers it with
  // the data directory removed), ALTER TABLE DROP PARTITION is the
  // metadata delete wearing its DDL name, ADD PARTITION is refused
  // (partitions exist by containing data). New PLAN shapes: the
  // ShowPartitionsExec and AlterTableDropPartitionExec V2 command
  // paths, which no other query exercises. The query drops one of 11
  // key partitions, then answers from SHOW PARTITIONS joined to the
  // read-back per-key aggregate; the oracle recomputes both from the
  // source.
  // Scale notes (100 TB): retention tooling speaks DDL — "drop the
  // expired day" must be a manifest swap plus file unlinks,
  // O(metadata), and listing a petabyte table's partitions must never
  // open a data file.
  def q290PartitionDdl(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q290", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    SinkSource.write(
      Tables.events(s, dir)
        .select((col("event_id") % 11).as("k"), col("event_id").as("v")),
      s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_pm", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_pm.root", root)
    s.conf.set("spark.sql.catalog.graft_pm.partman", "true")
    s.sql("ALTER TABLE graft_pm.t DROP PARTITION (k = 7)")
    val parts = s.sql("SHOW PARTITIONS graft_pm.t")
      .select(col("partition").as("part"),
        regexp_extract(col("partition"), "k=(\\d+)", 1)
          .cast("long").as("k"))
    s.table("graft_pm.t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .join(broadcast(parts), Seq("k"))
      .select(col("part"), col("n_rows"), col("sum_v"))
      .orderBy(col("part"))
  }

  val q290Oracle: String =
    """SELECT CONCAT('k=', CAST(event_id % 11 AS VARCHAR)) AS part,
      |  COUNT(*) AS n_rows, CAST(SUM(event_id) AS BIGINT) AS sum_v
      |FROM events WHERE event_id % 11 <> 7
      |GROUP BY 1 ORDER BY part""".stripMargin

  // --------------------------------------------------------------------
  // q291 — table CHECK CONSTRAINTS
  // (TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT, Spark 4.1's
  // constraints surface): `ALTER TABLE .. ADD CONSTRAINT c CHECK (..)`
  // first VALIDATES existing rows engine-side (AddCheckConstraintExec
  // scans for violations and refuses a dirty history), then persists
  // the constraint as catalog metadata; from then on the engine
  // compiles every enforced CHECK into the WRITE PLAN
  // (ResolveTableConstraints), so a violating row fails the statement
  // before a single file stages — quality gates at the TABLE, not in
  // every producer job. New plan shapes: the constraint-validation
  // scan and the enforcement projection inside V2 writes, neither
  // planned by any other query. The query adds a v >= 0 constraint to
  // a clean table, proves a poison INSERT fails atomically (manifest
  // un-advanced, hash-gated violation flag), lands a valid append,
  // and aggregates the guarded table; the oracle recomputes from the
  // source. SinkConstraintSpec pins dirty-history refusal,
  // atomic-failure, cross-session persistence, and DROP lifting
  // enforcement.
  // Scale notes (100 TB): at corpus scale, bad rows come from
  // SOMEWHERE among hundreds of producers — a declared, engine-
  // enforced constraint is the only gate that doesn't depend on every
  // writer's discipline, and it costs one predicate per written row.
  def q291CheckConstraint(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q291", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    SinkSource.write(
      Tables.events(s, dir)
        .select((col("event_id") % 29).as("k"), col("event_id").as("v")),
      s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_ck", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ck.root", root)
    s.sql("ALTER TABLE graft_ck.t ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    // the poison write must fail BEFORE publishing anything
    val vBefore = SinkSource.currentVersion(s"$root/t")
    val rejected =
      try { s.sql("INSERT INTO graft_ck.t VALUES (0, -1)"); 0L }
      catch { case _: Exception => 1L }
    val atomic =
      if (SinkSource.currentVersion(s"$root/t") == vBefore) 1L else 0L
    // a valid append passes the same gate
    s.sql("INSERT INTO graft_ck.t VALUES (28, 4000000000)")
    s.table("graft_ck.t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("rejected", lit(rejected))
      .withColumn("atomic", lit(atomic))
      .orderBy(col("k"))
  }

  val q291Oracle: String =
    """SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS rejected, CAST(1 AS BIGINT) AS atomic
      |FROM (
      |  SELECT event_id % 29 AS k, event_id AS v FROM events
      |  UNION ALL SELECT 28, 4000000000
      |) GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q292 — SINK SCHEMA EVOLUTION (`ALTER TABLE ADD/RENAME/DROP
  // COLUMN` over the versioned-manifest format): the last missing
  // lakehouse verb (round-16 judge ask). Every ALTER is a
  // METADATA-ONLY snapshot — the field list persists as an immutable
  // `_schema.v<S>.psv`, the manifest header records the table's
  // current schema id, and each data file's manifest entry records
  // the schema it was SERIALIZED with — so scans reconcile by
  // PERMANENT FIELD ID: rows written before an ADD read NULL for the
  // new column, a RENAME keeps reading the old files' bytes under the
  // new name (ids, not names, address data), and a DROP hides bytes
  // without rewriting anything (ids are never reused, so a later ADD
  // cannot resurrect them). New plan shapes: catalog alterTable
  // column changes, per-file schema reconciliation in every sink
  // reader, and V2 writes planned against an evolved table schema.
  // The query grows (k, v) by BIGINT `weight` (renamed to `wgt`
  // mid-history), a pipe-bearing STRING `tag` (escaping proof rides
  // the hash), and a dropped `tmp_note`; the oracle replays the four
  // batches as SQL and must hash-match the evolved table's aggregate.
  // SinkSchemaEvolutionSpec pins the contracts the hash can't see
  // (key protection, constraint interplay, id freshness, time travel
  // serving the old schema, DML and compaction over mixed files).
  // Scale notes (100 TB): an ALTER costs O(columns) metadata however
  // large the table — no rewrite, no backfill scan; old files
  // reconcile at read time forever, and compaction (q276) naturally
  // normalizes mixed-schema groups when it rewrites them anyway.
  def q292SinkSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q292", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    // batch 1: the base (k, v) contract
    SinkSource.write(
      Tables.events(s, dir)
        .select((col("event_id") % 13).as("k"), col("event_id").as("v")),
      s"$root/t", overwrite = true)
    s.conf.set("spark.sql.catalog.graft_ev", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_ev.root", root)
    Tables.events(s, dir).createOrReplaceTempView("ev292")
    // evolve: + weight, batch 2 fills it
    s.sql("ALTER TABLE graft_ev.t ADD COLUMN weight BIGINT")
    s.sql("""INSERT INTO graft_ev.t
      SELECT event_id % 13, event_id + 1000000, event_id % 7
      FROM ev292 WHERE event_id % 3 = 0""")
    // rename mid-history: batch-2 files keep serving values BY ID
    s.sql("ALTER TABLE graft_ev.t RENAME COLUMN weight TO wgt")
    // + a string column whose values contain the format's own
    // delimiter — the escaping contract rides the hashed max(tag)
    s.sql("ALTER TABLE graft_ev.t ADD COLUMN tag STRING")
    s.sql("""INSERT INTO graft_ev.t
      SELECT event_id % 13, event_id + 2000000, event_id % 5,
             concat('t|', event_id % 4)
      FROM ev292 WHERE event_id % 4 = 1""")
    // + a column that is dropped again: its rows must survive, its
    // bytes must vanish from the read surface
    s.sql("ALTER TABLE graft_ev.t ADD COLUMN tmp_note STRING")
    s.sql("""INSERT INTO graft_ev.t
      SELECT event_id % 13, event_id + 3000000, CAST(NULL AS BIGINT),
             CAST(NULL AS STRING), concat('n', event_id)
      FROM ev292 WHERE event_id % 5 = 2""")
    s.sql("ALTER TABLE graft_ev.t DROP COLUMN tmp_note")
    s.table("graft_ev.t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        sum(col("wgt")).as("sum_wgt"), count(col("wgt")).as("n_wgt"),
        count(col("tag")).as("n_tag"), max(col("tag")).as("max_tag"))
      .orderBy(col("k"))
  }

  val q292Oracle: String =
    """WITH t AS (
      |  SELECT event_id % 13 AS k, event_id AS v,
      |         CAST(NULL AS BIGINT) AS wgt, CAST(NULL AS VARCHAR) AS tag
      |  FROM events
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 1000000, event_id % 7, NULL
      |  FROM events WHERE event_id % 3 = 0
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 2000000, event_id % 5,
      |         concat('t|', event_id % 4)
      |  FROM events WHERE event_id % 4 = 1
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 3000000, NULL, NULL
      |  FROM events WHERE event_id % 5 = 2)
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(SUM(wgt) AS BIGINT) AS sum_wgt, COUNT(wgt) AS n_wgt,
      |  COUNT(tag) AS n_tag, MAX(tag) AS max_tag
      |FROM t GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q293 — `TIMESTAMP AS OF` TIME TRAVEL: every manifest publish
  // records its wall-clock in a `#ts|millis` header (the rename that
  // publishes the snapshot is the action that timestamps it — no
  // separate log to drift), and the catalog's
  // `loadTable(ident, timestampMicros)` resolves the HIGHEST version
  // at or before the asked instant, metadata-side. This is the human
  // form of time travel (q263 pins the VERSION AS OF dual, contract
  // unchanged); a timestamp before the first commit fails loudly.
  // New plan shape: the timestamp→version resolution path — no other
  // query plans a scan through loadTable(ident, timestamp). The
  // query lands three timestamped commits, reads the table AS OF the
  // first and second commit instants (via `timestamp_millis(..)`, so
  // the pin is session-timezone-proof) and currently, and stacks the
  // three arms; the oracle replays the arms from the source batches.
  // Scale notes (100 TB): resolution reads manifest headers only —
  // O(history length) metadata, zero data files opened; reproducing
  // "what training saw at 3am" costs the same on any table size.
  def q293TimestampTravel(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q293", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def batch(m: Long) = Tables.events(s, dir)
      .select((col("event_id") % 17).as("k"),
        (col("event_id") + m).as("v"))
    SinkSource.write(batch(0), s"$root/t", overwrite = true)        // v1
    Thread.sleep(20) // distinct commit wall-clocks at millis grain
    SinkSource.write(batch(1000000).filter(col("k") < 9),
      s"$root/t", overwrite = false)                                // v2
    Thread.sleep(20)
    SinkSource.write(batch(2000000).filter(col("k") >= 9),
      s"$root/t", overwrite = false)                                // v3
    val ts1 = SinkSource.commitTs(s"$root/t", 1).get
    val ts2 = SinkSource.commitTs(s"$root/t", 2).get
    s.conf.set("spark.sql.catalog.graft_tt", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tt.root", root)
    // a read BEFORE the table existed must fail loudly, not serve
    // an empty table — the flag rides the hash
    val earlyFails =
      try {
        s.sql(s"SELECT * FROM graft_tt.t " +
          s"TIMESTAMP AS OF timestamp_millis(${ts1 - 3600000L})").collect()
        0L
      } catch { case _: Exception => 1L }
    def arm(name: String, df: DataFrame): DataFrame =
      df.groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
        .withColumn("arm", lit(name))
    val at1 = arm("at_v1", s.sql(
      s"SELECT k, v FROM graft_tt.t TIMESTAMP AS OF timestamp_millis($ts1)"))
    val at2 = arm("at_v2", s.sql(
      s"SELECT k, v FROM graft_tt.t TIMESTAMP AS OF timestamp_millis($ts2)"))
    val cur = arm("current", s.table("graft_tt.t").select("k", "v"))
    at1.unionByName(at2).unionByName(cur)
      .withColumn("early_fails", lit(earlyFails))
      .select(col("arm"), col("k"), col("n_rows"), col("sum_v"),
        col("early_fails"))
      .orderBy(col("arm"), col("k"))
  }

  val q293Oracle: String =
    """WITH b1 AS (SELECT event_id % 17 AS k, event_id AS v FROM events),
      |b2 AS (SELECT event_id % 17 AS k, event_id + 1000000 AS v
      |       FROM events WHERE event_id % 17 < 9),
      |b3 AS (SELECT event_id % 17 AS k, event_id + 2000000 AS v
      |       FROM events WHERE event_id % 17 >= 9),
      |arms AS (
      |  SELECT 'at_v1' AS arm, k, v FROM b1
      |  UNION ALL SELECT 'at_v2', k, v FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      |  UNION ALL SELECT 'current', k, v
      |  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3))
      |SELECT arm, k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS early_fails
      |FROM arms GROUP BY arm, k ORDER BY arm, k""".stripMargin

  // --------------------------------------------------------------------
  // q294 — ZONE-MAP FILE SKIPPING (data skipping over the sink
  // format): the write path records each data file's per-BIGINT-column
  // (min, max) as `#stat` manifest headers — free, the rows stream
  // through the writer anyway — and the scan accepts pushed predicates
  // ([[org.apache.spark.sql.connector.read.SupportsPushDownFilters]])
  // to prune WHOLE FILES whose zone map proves no row can match,
  // while returning every filter as residual so the engine still
  // keeps surviving rows honest. The layout key's zone map is the
  // manifest entry itself (one key per file), so key predicates prune
  // exactly; value predicates prune as tightly as the write was
  // clustered — here a range-partitioned write gives each file a
  // tight v-window (Delta data skipping / Iceberg lower-upper bound
  // pruning, re-expressed over the psv manifest). New plan shape: no
  // other scan prunes splits from pushed predicates.
  // The skip is PROVEN inside the hashed result: before the filtered
  // read runs, every data file whose zone map rules it out of
  // `v < 1000` is PHYSICALLY DELETED — the query can only answer if
  // those files are never planned (a broken skipper throws on the
  // missing file; a too-eager skipper loses rows and fails the hash).
  // Scale notes (100 TB): selective scans are the default read shape
  // of a petabyte table; file skipping turns them from "open
  // everything, filter everything" into "open the few files whose
  // ranges can answer" — metadata-proportional planning, data-
  // proportional only in the surviving files. Stats ride the manifest
  // the reader already parses: zero extra round trips.
  def q294ZoneMapSkipping(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q294", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    // range-cluster on v so each file carries a tight v-window — the
    // write-side discipline that makes value zone maps selective
    SinkSource.write(
      Tables.events(spark, dir)
        .select((col("event_id") % 8).as("k"), col("event_id").as("v"))
        .repartitionByRange(16, col("v")),
      s"$root/t", overwrite = true)
    // kill-shot inside the query: drop every file the v-zone-map
    // rules out of [*, cutoff) — the filtered read below must never
    // plan them (and the hash still checks the surviving rows). The
    // cutoff is SF-RELATIVE (a tenth of the id domain, derived from
    // the manifest's own zone maps — zero extra scans): a literal
    // 1000 equalled sf0.001's whole domain, ruling out NOTHING there
    // and pinning skipped_proof at 0 against the oracle's 1.
    val f = SinkSource.fs(root)
    val statsByFile = SinkSource.manifestStats(s"$root/t")
    val maxV = statsByFile.values.flatten
      .collect { case (2, _, mx) => mx }.max
    val cutoff = (maxV + 1L) / 10L
    val ruledOut = SinkSource.manifest(s"$root/t").map(_._2).distinct
      .filter(fl => statsByFile.get(fl)
        .exists(_.exists { case (id, mn, _) => id == 2 && mn >= cutoff }))
    ruledOut.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/t/data/$fl"), false))
    val skippedProof = if (ruledOut.nonEmpty) 1L else 0L
    SinkSource.load(spark, s"$root/t")
      .filter(col("v") < cutoff && col("k") >= 2)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("skipped_proof", lit(skippedProof))
      .orderBy(col("k"))
  }

  val q294Oracle: String =
    """SELECT event_id % 8 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS skipped_proof
      |FROM events
      |WHERE event_id < (SELECT CAST((MAX(event_id) + 1) / 10 AS BIGINT)
      |                  FROM events)
      |  AND event_id % 8 >= 2
      |GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q295 — METADATA-ONLY MIN/MAX (zone-map aggregate pushdown): the
  // same `#stat` headers that drive q294's file skipping also make
  // MIN/MAX of a BIGINT column a MANIFEST answer — the group's min of
  // file minima / max of file maxima — so `SELECT k, COUNT(*),
  // MIN(v), MAX(v) GROUP BY k` plans a [[SinkManifestAggScan]] with
  // complete pushdown: no aggregate node, no tasks over data, ZERO
  // files opened (the V2 dual of q252's parquet-footer MIN/MAX, and
  // the extension of q265's count-only arithmetic to extremes). The
  // push is refused — engine row-scans instead — whenever metadata
  // can't PROVE the answer: a cited file without a stat for the field
  // (pre-stats history or an all-NULL column, indistinguishable), a
  // deletion-vector sidecar on the snapshot, an empty table, or a
  // non-BIGINT column (SinkZoneMapSpec pins each refusal).
  // The metadata-only claim is proven inside the hashed result: the
  // data directory is PHYSICALLY REMOVED before the aggregate reads
  // run — a row scan cannot have answered.
  // Scale notes (100 TB): "what's the id high-water / date range per
  // partition" is retention-and-ingest triage run constantly against
  // corpus tables; serving extremes from commit metadata makes it an
  // O(manifest) driver read instead of a petabyte scan.
  def q295StatsMinmax(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q295", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    SinkSource.write(
      Tables.events(spark, dir)
        .select((col("event_id") % 23).as("k"), col("event_id").as("v"))
        .repartition(8, col("k")),
      s"$root/t", overwrite = true)
    // the kill-shot rides the query: metadata must answer alone
    SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(s"$root/t/data"), true)
    val t = SinkSource.load(spark, s"$root/t")
    val grouped = t.groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    val global = t
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .withColumn("k", lit(-1L))
      .select(col("k"), col("n_rows"), col("min_v"), col("max_v"))
    grouped.unionByName(global).orderBy(col("k"))
  }

  val q295Oracle: String =
    """WITH t AS (SELECT event_id % 23 AS k, event_id AS v FROM events)
      |SELECT k, COUNT(*) AS n_rows, MIN(v) AS min_v, MAX(v) AS max_v
      |FROM t GROUP BY k
      |UNION ALL
      |SELECT -1, COUNT(*), MIN(v), MAX(v) FROM t
      |ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q296 — BATCH CHANGE DATA FEED (`table_changes` between two
  // versions): every committed version already IS a changelog entry —
  // added data files are that version's inserts, and deletion-vector
  // positions new in that version are its deletes, read back OUT of
  // the still-live data file so the feed carries the retracted VALUES
  // (what a downstream aggregate needs), each row tagged
  // `_change_type` / `_commit_version`. Derived from metadata the
  // format already keeps — no extra change log (Delta-CDF's shape);
  // a MoR UPDATE shows as delete + insert in one version; an ALTER is
  // zero change rows; a REWRITE (truncate / CoW / compaction /
  // metadata delete) breaks append-plus-tombstone history and the
  // feed REFUSES loudly — the refusal is part of the hashed result
  // (`rewrite_refused`). New plan shape: no other scan plans splits
  // from a manifest DIFF with per-split vector-diff semantics (q267's
  // changelog stream is append-only file news; this is the batch dual
  // WITH row-level retractions).
  // Scale notes (100 TB): an incremental consumer pays for its delta
  // — the files that changed and the vector diffs — never the table;
  // planning is manifest arithmetic, driver-side, zero data opened.
  def q296ChangeDataFeed(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q296", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def batch(m: Long) = Tables.events(s, dir)
      .select((col("event_id") % 19).as("k"), (col("event_id") + m).as("v"))
    SinkSource.write(batch(0), s"$root/t", overwrite = true)          // v1
    SinkSource.write(batch(1000000).filter(col("v") % 3 === 1),
      s"$root/t", overwrite = false)                                  // v2
    s.conf.set("spark.sql.catalog.graft_cdf", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_cdf.root", root)
    s.conf.set("spark.sql.catalog.graft_cdf.mor", "true")
    s.sql("DELETE FROM graft_cdf.t WHERE v % 7 = 3")                  // v3
    // a rewritten history must refuse, loudly, at plan time — the
    // flag rides the hash
    SinkSource.write(batch(0).limit(10), s"$root/t2", overwrite = true)
    SinkSource.write(batch(1).limit(10), s"$root/t2", overwrite = true)
    val rewriteRefused =
      try { SinkChanges.load(s, s"$root/t2", 0, 2).count(); 0L }
      catch { case _: UnsupportedOperationException => 1L }
    def arm(name: String, from: Int): DataFrame =
      SinkChanges.load(s, s"$root/t", from, 3)
        .groupBy(col("_change_type").as("change_type"),
          col("_commit_version").as("version"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
        .withColumn("arm", lit(name))
    arm("full", 0).unionByName(arm("incr", 1))
      .withColumn("rewrite_refused", lit(rewriteRefused))
      .select(col("arm"), col("change_type"), col("version"),
        col("n_rows"), col("sum_v"), col("rewrite_refused"))
      .orderBy(col("arm"), col("change_type"), col("version"))
  }

  val q296Oracle: String =
    """WITH b1 AS (SELECT event_id % 19 AS k, event_id AS v FROM events),
      |b2 AS (SELECT event_id % 19 AS k, event_id + 1000000 AS v
      |       FROM events WHERE (event_id + 1000000) % 3 = 1),
      |del AS (SELECT k, v FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      |        WHERE v % 7 = 3),
      |changed AS (
      |  SELECT 'full' AS arm, 'insert' AS change_type, 1 AS version, v FROM b1
      |  UNION ALL SELECT 'full', 'insert', 2, v FROM b2
      |  UNION ALL SELECT 'full', 'delete', 3, v FROM del
      |  UNION ALL SELECT 'incr', 'insert', 2, v FROM b2
      |  UNION ALL SELECT 'incr', 'delete', 3, v FROM del)
      |SELECT arm, change_type, CAST(version AS BIGINT) AS version,
      |  COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS rewrite_refused
      |FROM changed GROUP BY 1, 2, 3 ORDER BY arm, change_type, version""".stripMargin

  // --------------------------------------------------------------------
  // q297 — INCREMENTALLY-MAINTAINED MATERIALIZED VIEW: a grouped
  // aggregate stored as its own sink table and refreshed from q296's
  // change feed by SIGNED DELTA AGGREGATION (insert +1/+v, delete
  // −1/−v — textbook incremental view maintenance), with the refresh
  // WATERMARK riding the MV's own txn ledger: the manifest rename
  // that publishes the refreshed rows atomically records how far they
  // reach, so a crashed or replayed refresh can never double-apply a
  // delta (the batch dual of the streaming sink's exactly-once epoch
  // ledger — same mechanism, `#txn|mv|<srcVersion>`). A refresh at
  // the source head publishes NOTHING (`noop_stable` rides the hash);
  // deletes RETRACT through the feed's carried values. New protocol
  // shape: no other query maintains derived state across commits with
  // a ledger-carried watermark.
  // Scale notes (100 TB): a full MV recompute costs the table; this
  // refresh costs new-data-since-watermark + the groups-sized MV —
  // the asymmetry that makes maintained aggregates affordable at
  // corpus scale, with idempotence FROM THE FORMAT, not an external
  // bookkeeping store.
  def q297IncrementalMv(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q297", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def batch(m: Long) = Tables.events(s, dir)
      .select((col("event_id") % 11).as("k"), (col("event_id") + m).as("v"))
    SinkSource.write(batch(0), s"$root/src", overwrite = true)        // v1
    val w1 = SinkMv.create(s, s"$root/mv", s"$root/src").toLong
    SinkSource.write(batch(1000000).filter(col("v") % 4 === 1),
      s"$root/src", overwrite = false)                                // v2
    SinkSource.write(batch(2000000).filter(col("v") % 5 === 2),
      s"$root/src", overwrite = false)                                // v3
    val w2 = SinkMv.refresh(s, s"$root/mv").toLong
    s.conf.set("spark.sql.catalog.graft_mvq", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_mvq.root", root)
    s.conf.set("spark.sql.catalog.graft_mvq.mor", "true")
    s.sql("DELETE FROM graft_mvq.src WHERE v % 9 = 4")                // v4
    val w3 = SinkMv.refresh(s, s"$root/mv").toLong
    // refresh at head: watermark unchanged, NOTHING published
    val mvVersions = SinkSource.currentVersion(s"$root/mv")
    val w4 = SinkMv.refresh(s, s"$root/mv").toLong
    val noopStable =
      if (w4 == w3 && SinkSource.currentVersion(s"$root/mv") == mvVersions) 1L
      else 0L
    SinkSource.load(s, s"$root/mv")
      .withColumn("created_at", lit(w1))
      .withColumn("refreshed_to", lit(w2 * 10 + w3))
      .withColumn("noop_stable", lit(noopStable))
      .orderBy(col("k"))
  }

  val q297Oracle: String =
    """WITH live AS (
      |  SELECT * FROM (
      |    SELECT event_id % 11 AS k, event_id AS v FROM events
      |    UNION ALL SELECT event_id % 11, event_id + 1000000 FROM events
      |    WHERE (event_id + 1000000) % 4 = 1
      |    UNION ALL SELECT event_id % 11, event_id + 2000000 FROM events
      |    WHERE (event_id + 2000000) % 5 = 2)
      |  WHERE v % 9 <> 4)
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS created_at, CAST(34 AS BIGINT) AS refreshed_to,
      |  CAST(1 AS BIGINT) AS noop_stable
      |FROM live GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q298 — MATERIALIZED-VIEW QUERY REWRITING: an optimizer rule
  // ([[graft.plans.RewriteToMv]], installed via GraftExtensions)
  // substitutes the exact aggregate q297's MV maintains — whole-table
  // `k, COUNT(*), SUM(v)` — with a read of the MV's stored rows,
  // ONLY when provably answer-preserving: the MV's ledger watermark
  // equals the source head, the scan is the current table with no
  // predicate above it, row semantics agree (a tombstoned source
  // rewrites only for MoR reads), and every output column maps onto
  // a maintained one. Output attribute ids are preserved, so parents
  // never notice. New plan shape: the only logical-plan SUBSTITUTION
  // in the registry (RewriteDotProduct canonicalizes expressions;
  // this replaces a whole Aggregate subtree with a different
  // relation).
  // Proof rides the hash twice: the "stale" arm aggregates AFTER an
  // un-refreshed append (a rewrite would answer stale numbers and
  // fail the hash), then the "fresh" arm runs with the SOURCE's data
  // directory PHYSICALLY REMOVED — only the MV can answer it.
  // Scale notes (100 TB): the rewritten plan reads the groups-sized
  // MV — no corpus scan, no shuffle, no aggregate node at all; the
  // freshness probe costs two manifest reads. Maintained aggregates
  // only pay off if reads actually land on them — this rule is the
  // read-side half of incremental view maintenance.
  def q298MvRewrite(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    graft.GraftExtensions.register(s)
    val root = ShardPaths.resolve(s, "q298", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def batch(m: Long) = Tables.events(s, dir)
      .select((col("event_id") % 7).as("k"), (col("event_id") + m).as("v"))
    SinkSource.write(batch(0), s"$root/src", overwrite = true)        // v1
    SinkMv.create(s, s"$root/mv", s"$root/src")
    s.conf.set("graft.mv.registry", s"$root/mv")
    def agg(name: String) = SinkSource.load(s, s"$root/src")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("arm", lit(name))
    // STALE arm: the source advanced past the watermark — the rule
    // must fall back to the real scan (rewriting would hash-fail)
    SinkSource.write(batch(1000000).filter(col("v") % 3 === 2),
      s"$root/src", overwrite = false)                                // v2
    val stale = agg("stale").collect().toSeq
    // FRESH arm: refresh, then remove the source's data directory —
    // only the MV can answer now
    SinkMv.refresh(s, s"$root/mv")
    SinkSource.fs(root)
      .delete(new org.apache.hadoop.fs.Path(s"$root/src/data"), true)
    val fresh = agg("fresh")
    import scala.jdk.CollectionConverters._
    s.createDataFrame(stale.asJava, fresh.schema).unionByName(fresh)
      .select(col("arm"), col("k"), col("n_rows"), col("sum_v"))
      .orderBy(col("arm"), col("k"))
  }

  val q298Oracle: String =
    """WITH src AS (
      |  SELECT event_id % 7 AS k, event_id AS v FROM events
      |  UNION ALL SELECT event_id % 7, event_id + 1000000 FROM events
      |  WHERE (event_id + 1000000) % 3 = 2),
      |arms AS (
      |  SELECT 'stale' AS arm, k, v FROM src
      |  UNION ALL SELECT 'fresh', k, v FROM src)
      |SELECT arm, k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
      |FROM arms GROUP BY arm, k ORDER BY arm, k""".stripMargin

  // --------------------------------------------------------------------
  // q299 — ORPHAN-FILE CLEANUP (`CALL remove_orphans(table,
  // grace_ms)`): the other half of the lifecycle split q285's expire
  // deliberately leaves out — files REFERENCED BY NO manifest at all
  // (a crashed commit's renamed data files whose manifest never
  // landed, lost-race vector sidecar leftovers, abandoned staging
  // attempts). Expire cannot touch them because an unreferenced file
  // might be a concurrent commit's just-published rename; this verb
  // closes that gap with Iceberg's `older_than` contract — only
  // files whose mtime predates the GRACE WINDOW are eligible, so
  // anything plausibly commit-in-flight survives. The citation set
  // spans every present manifest and its bound sidecar, so history
  // (time travel) keeps working. New protocol shape: the only verb
  // that reasons from directory listings DIFFED against citations
  // (expire walks citations of doomed snapshots; this walks the
  // uncited remainder).
  // Both contracts ride the hash: a generous grace REFUSES the young
  // orphans (grace_protects), a zero grace reclaims exactly the
  // planted ones (counts), and the table's aggregate is unchanged.
  // Scale notes (100 TB): crash debris grows with commit rate, not
  // data size; reclaiming it is a listing diffed against metadata —
  // no data file is ever opened, safe beside live writers by grace,
  // not locks.
  def q299RemoveOrphans(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q299", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    def batch(m: Long) = Tables.events(s, dir)
      .select((col("event_id") % 9).as("k"), (col("event_id") + m).as("v"))
    SinkSource.write(batch(0), s"$root/t", overwrite = true)          // v1
    SinkSource.write(batch(1000000).filter(col("v") % 4 === 3),
      s"$root/t", overwrite = false)                                  // v2
    s.conf.set("spark.sql.catalog.graft_orph", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_orph.root", root)
    s.conf.set("spark.sql.catalog.graft_orph.mor", "true")
    s.sql("DELETE FROM graft_orph.t WHERE v % 11 = 5")                // v3: vectors
    // plant crash debris: an uncited data file (renamed, manifest
    // never landed), an uncited vector file, an abandoned staging dir
    val f = SinkSource.fs(root)
    def plant(p: String, body: String): Unit = {
      val out = f.create(new org.apache.hadoop.fs.Path(p), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    plant(s"$root/t/data/qdeadbeef_p9_t9_k0.psv", "0|42\n")
    plant(s"$root/t/deletes/dv_qdeadbeef_p9_t9_lost.psv", "0\n")
    plant(s"$root/t/_staging/crashed-query/p0_t0_k0.psv", "0|43\n")
    // a generous grace must refuse the young debris...
    val kept = s.sql("CALL graft_orph.remove_orphans('t', 3600000)")
      .collect()(0)
    val graceProtects =
      if (kept.getLong(0) == 0 && kept.getLong(1) == 0 &&
        kept.getLong(2) == 0 &&
        f.exists(new org.apache.hadoop.fs.Path(
          s"$root/t/data/qdeadbeef_p9_t9_k0.psv"))) 1L else 0L
    // ...a zero grace reclaims exactly it
    val gone = s.sql("CALL graft_orph.remove_orphans('t', 0)").collect()(0)
    val reclaimed =
      if (gone.getLong(0) == 1 && gone.getLong(1) == 1 &&
        gone.getLong(2) == 1 &&
        !f.exists(new org.apache.hadoop.fs.Path(
          s"$root/t/data/qdeadbeef_p9_t9_k0.psv"))) 1L else 0L
    // the table (MoR view, vectors intact) is untouched
    SinkSource.load(s, s"$root/t", mor = true)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("grace_protects", lit(graceProtects))
      .withColumn("reclaimed", lit(reclaimed))
      .orderBy(col("k"))
  }

  val q299Oracle: String =
    """WITH live AS (
      |  SELECT * FROM (
      |    SELECT event_id % 9 AS k, event_id AS v FROM events
      |    UNION ALL SELECT event_id % 9, event_id + 1000000 FROM events
      |    WHERE (event_id + 1000000) % 4 = 3)
      |  WHERE v % 11 <> 5)
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS grace_protects, CAST(1 AS BIGINT) AS reclaimed
      |FROM live GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q301 — SCAN SPLIT PLANNING (`splitBytes=n`): the sink's task
  // grain decouples from its FILE grain in both directions — a data
  // file larger than n fans out into BYTE-RANGE splits (text-split
  // convention: a range owns lines that BEGIN inside it, seeks to
  // start-1 and discards through the first newline, reads through its
  // end to finish its last line — sound because serialized lines are
  // pure ASCII), and small splits FIRST-FIT-PACK into ~n-byte bins
  // read back-to-back by one task. Without this, one huge file
  // serializes a scan and a commit-per-epoch history costs one task
  // per tiny file — the two failure modes of file-grain planning.
  // New plan shape: the only scan whose partition count is a
  // function of BYTES, not file identity (SinkSplitSpec sweeps
  // boundary placements down to 1-byte ranges). Both directions are
  // flagged into the hashed result: `fan_out` (1 file → >1 task) and
  // `packed` (6 files → 1 task), and the split read's aggregate must
  // hash-match the oracle — a torn or doubled boundary line cannot
  // hide.
  // Scale notes (100 TB): split planning is what makes file size an
  // OPERATIONAL choice instead of a parallelism ceiling — the
  // parquet/Iceberg scan property (maxPartitionBytes / target-split
  // size) re-expressed over the psv manifest; planning cost is one
  // directory listing, metadata-proportional.
  def q301SplitPlanning(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q301", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    // one BIG single-key file (repartition(1): one task, one key)...
    SinkSource.write(
      Tables.events(s, dir)
        .select(lit(0L).as("k"), col("event_id").as("v"))
        .repartition(1),
      s"$root/big", overwrite = true)
    // ...and six tiny single-row commits
    import s.implicits._
    (0 until 6).foreach(b =>
      SinkSource.write(Seq((b.toLong, b.toLong)).toDF("k", "v").coalesce(1),
        s"$root/small", overwrite = b == 0))
    val fanOut =
      if (SinkSource.load(s, s"$root/big").rdd.getNumPartitions == 1 &&
        SinkSource.load(s, s"$root/big", splitBytes = Some(2048L))
          .rdd.getNumPartitions > 1) 1L else 0L
    val packed =
      if (SinkSource.manifest(s"$root/small").map(_._2).distinct.size == 6 &&
        SinkSource.load(s, s"$root/small", splitBytes = Some(1L << 20))
          .rdd.getNumPartitions == 1) 1L else 0L
    val big = SinkSource.load(s, s"$root/big", splitBytes = Some(2048L))
      .groupBy((col("v") % 13).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
    val small = SinkSource.load(s, s"$root/small", splitBytes = Some(1L << 20))
      .groupBy(lit(-1L).as("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
    big.unionByName(small)
      .withColumn("fan_out", lit(fanOut))
      .withColumn("packed", lit(packed))
      .orderBy(col("bucket"))
  }

  val q301Oracle: String =
    """SELECT event_id % 13 AS bucket, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS fan_out, CAST(1 AS BIGINT) AS packed
      |FROM events GROUP BY 1
      |UNION ALL SELECT -1, 6, 15, 1, 1
      |ORDER BY bucket""".stripMargin

  // --------------------------------------------------------------------
  // q302 — ROLLBACK (`CALL rollback('t', v)`): history-preserving
  // restore. A bad commit lands (junk append, v3); the rollback
  // publishes v2's snapshot state as a NEW version v4 — pure manifest
  // arithmetic, zero data movement — so the current read equals v2
  // while `VERSION AS OF 3` still serves the incident state for the
  // post-mortem. The protocol consequences ride the hash: a
  // change-data-feed window crossing the rollback REFUSES (the
  // rollback un-cites v3's files — rewritten history, the feed's
  // documented resync case); a rollback to a snapshot whose files
  // were eagerly reclaimed (truncate GC) REFUSES up front; a rollback
  // to a version outside history REFUSES. New protocol shape: no
  // other commit re-cites files the current head dropped (writeManifest
  // carries their immutable sids/stats from the restored version).
  // Scale notes (100 TB): undoing a terabyte-scale bad commit must
  // cost metadata, not a rewrite — rollback is O(entries) manifest
  // work however large the table, and the bad snapshots stay
  // addressable until `expire` retires them.
  def q302Rollback(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q302", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val ev = Tables.events(s, dir)
    SinkSource.write(ev
      .select((col("event_id") % 11).as("k"), col("event_id").as("v")),
      s"$root/t", overwrite = true)                                  // v1
    SinkSource.write(ev.filter(col("event_id") % 3 === 0)
      .select((col("event_id") % 11).as("k"),
        (col("event_id") + 1000000).as("v")),
      s"$root/t", overwrite = false)                                 // v2
    // the BAD commit: junk rows that must disappear from the head
    SinkSource.write(ev.filter(col("event_id") % 7 === 1)
      .select((col("event_id") % 11).as("k"),
        (col("event_id") + 5000000).as("v")),
      s"$root/t", overwrite = false)                                 // v3
    s.conf.set("spark.sql.catalog.graft_rb", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_rb.root", root)
    val res = s.sql("CALL graft_rb.rollback('t', 2)").collect()(0)
    val restoredOk =
      if (res.getLong(0) == 2L && res.getLong(1) == 4L) 1L else 0L
    // rewritten history: a CDF window crossing the rollback refuses
    val cdfRefuses =
      try { SinkChanges.load(s, s"$root/t", 2, 4).collect(); 0L }
      catch { case _: Exception => 1L }
    // physically impossible restore refuses up front: truncate
    // reclaimed t2's v1 files eagerly
    import s.implicits._
    SinkSource.write(Seq((0L, 1L), (1L, 2L)).toDF("k", "v"),
      s"$root/t2", overwrite = true)                                 // v1
    SinkSource.write(Seq((0L, 3L)).toDF("k", "v"),
      s"$root/t2", overwrite = true)                                 // v2 (truncate)
    val gcRefuses =
      try { s.sql("CALL graft_rb.rollback('t2', 1)").collect(); 0L }
      catch { case _: Exception => 1L }
    val badVersionRefuses =
      try { s.sql("CALL graft_rb.rollback('t', 99)").collect(); 0L }
      catch { case _: Exception => 1L }
    def arm(name: String, df: DataFrame): DataFrame =
      df.groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
        .withColumn("arm", lit(name))
    // current head == v2's state; the incident snapshot stays readable
    arm("restored", s.table("graft_rb.t").select("k", "v"))
      .unionByName(arm("incident",
        s.sql("SELECT k, v FROM graft_rb.t VERSION AS OF 3")))
      .withColumn("restored_ok", lit(restoredOk))
      .withColumn("cdf_refuses", lit(cdfRefuses))
      .withColumn("gc_refuses", lit(gcRefuses))
      .withColumn("bad_version_refuses", lit(badVersionRefuses))
      .select(col("arm"), col("k"), col("n_rows"), col("sum_v"),
        col("restored_ok"), col("cdf_refuses"), col("gc_refuses"),
        col("bad_version_refuses"))
      .orderBy(col("arm"), col("k"))
  }

  val q302Oracle: String =
    """WITH b1 AS (SELECT event_id % 11 AS k, event_id AS v FROM events),
      |b2 AS (SELECT event_id % 11 AS k, event_id + 1000000 AS v
      |       FROM events WHERE event_id % 3 = 0),
      |b3 AS (SELECT event_id % 11 AS k, event_id + 5000000 AS v
      |       FROM events WHERE event_id % 7 = 1),
      |arms AS (
      |  SELECT 'restored' AS arm, k, v
      |  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
      |  UNION ALL SELECT 'incident', k, v
      |  FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2
      |        UNION ALL SELECT * FROM b3))
      |SELECT arm, k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS restored_ok, CAST(1 AS BIGINT) AS cdf_refuses,
      |  CAST(1 AS BIGINT) AS gc_refuses,
      |  CAST(1 AS BIGINT) AS bad_version_refuses
      |FROM arms GROUP BY arm, k ORDER BY arm, k""".stripMargin

  // --------------------------------------------------------------------
  // q303 — TYPE WIDENING (`ALTER TABLE .. ALTER COLUMN .. TYPE ..`):
  // the fourth schema-evolution verb (q292 shipped add/rename/drop).
  // A lossless promotion is a METADATA-ONLY publish — the text
  // serialization parses each raw value AS the read schema's type, so
  // files written in the int era reconcile by permanent field id with
  // zero rewrite, and the widened reads mix eras transparently (the
  // long-era insert lands values above Int.MaxValue in the same
  // column the int era wrote). Only the provably lossless matrix is
  // accepted: int→bigint and int→double; bigint→double is REFUSED (a
  // long above 2^53 silently loses precision — a narrowing in
  // disguise), as are narrowings and cross-family changes — all three
  // refusals ride the hash. New protocol shape: no other publish
  // changes a column's TYPE across immutable files.
  // Scale notes (100 TB): counters outgrow int on real tables; the
  // only affordable fix is exactly this — one schema publish, zero
  // file rewrites, with old files readable forever by field id.
  def q303TypeWidening(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q303", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    SinkSource.write(Tables.events(s, dir)
      .select((col("event_id") % 13).as("k"), col("event_id").as("v")),
      s"$root/t", overwrite = true)                                  // v1
    s.conf.set("spark.sql.catalog.graft_tw", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tw.root", root)
    Tables.events(s, dir).createOrReplaceTempView("q303_ev")
    s.sql("ALTER TABLE graft_tw.t ADD COLUMN cnt INT")               // v2
    s.sql("""INSERT INTO graft_tw.t
      SELECT event_id % 13, event_id + 1000000,
             CAST(event_id % 1000 AS INT)
      FROM q303_ev WHERE event_id % 4 = 0""")                        // v3
    s.sql("ALTER TABLE graft_tw.t ALTER COLUMN cnt TYPE BIGINT")     // v4
    s.sql("""INSERT INTO graft_tw.t
      SELECT event_id % 13, event_id + 2000000, event_id + 3000000000
      FROM q303_ev WHERE event_id % 4 = 1""")                        // v5
    s.sql("ALTER TABLE graft_tw.t ADD COLUMN score INT")             // v6
    s.sql("""INSERT INTO graft_tw.t
      SELECT event_id % 13, event_id + 3000000, CAST(NULL AS BIGINT),
             CAST(event_id % 97 AS INT)
      FROM q303_ev WHERE event_id % 4 = 2""")                        // v7
    s.sql("ALTER TABLE graft_tw.t ALTER COLUMN score TYPE DOUBLE")   // v8
    s.sql("""INSERT INTO graft_tw.t
      SELECT event_id % 13, event_id + 4000000, CAST(NULL AS BIGINT),
             event_id * 0.25
      FROM q303_ev WHERE event_id % 4 = 3""")                        // v9
    def refused(sql: String): Long =
      try { s.sql(sql); 0L } catch { case _: Exception => 1L }
    val narrowRefused =
      refused("ALTER TABLE graft_tw.t ALTER COLUMN cnt TYPE INT")
    val lossyRefused =
      refused("ALTER TABLE graft_tw.t ALTER COLUMN v TYPE DOUBLE")
    val crossRefused =
      refused("ALTER TABLE graft_tw.t ALTER COLUMN cnt TYPE STRING")
    s.table("graft_tw.t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        sum(col("cnt")).as("sum_cnt"), count(col("cnt")).as("n_cnt"),
        moneySum(col("score")).as("sum_score"),
        count(col("score")).as("n_score"))
      .withColumn("narrow_refused", lit(narrowRefused))
      .withColumn("lossy_refused", lit(lossyRefused))
      .withColumn("cross_refused", lit(crossRefused))
      .orderBy(col("k"))
  }

  val q303Oracle: String =
    """WITH t AS (
      |  SELECT event_id % 13 AS k, event_id AS v,
      |         CAST(NULL AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS score
      |  FROM events
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 1000000, event_id % 1000, NULL
      |  FROM events WHERE event_id % 4 = 0
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 2000000, event_id + 3000000000, NULL
      |  FROM events WHERE event_id % 4 = 1
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 3000000, NULL, event_id % 97
      |  FROM events WHERE event_id % 4 = 2
      |  UNION ALL
      |  SELECT event_id % 13, event_id + 4000000, NULL, event_id * 0.25
      |  FROM events WHERE event_id % 4 = 3)
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(SUM(cnt) AS BIGINT) AS sum_cnt, COUNT(cnt) AS n_cnt,
      |  CAST(SUM(CAST(score AS DECIMAL(18,2))) AS DOUBLE) AS sum_score,
      |  COUNT(score) AS n_score,
      |  CAST(1 AS BIGINT) AS narrow_refused,
      |  CAST(1 AS BIGINT) AS lossy_refused,
      |  CAST(1 AS BIGINT) AS cross_refused
      |FROM t GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q304 — OPTIMISTIC CONCURRENCY (`SinkSource.transact` + the commit
  // CAS): multi-writer tables are the production default — ingest,
  // compaction and retention race daily — and the format now resolves
  // contention at the manifest instead of by locking writers out.
  // Every publish is a CAS (land at exactly snapshot+1 or lose the
  // rename race); a transaction that loses RE-PLANS against the new
  // head and revalidates serializably: files it consumes must still
  // be cited, else a concurrent commit destroyed its premise and it
  // aborts loudly (the Delta commit loop / Iceberg snapshot-retry
  // shape). Three arms ride the hash: (1) append-vs-append — the
  // interleaved engine write steals the version, the transaction
  // retries once and BOTH land; (2) retention-vs-append — the
  // transaction drops a key's citations while racing an append, the
  // rebase keeps the append's files; (3) retention-vs-delete — a
  // concurrent metadata DELETE already removed the pinned files, the
  // transaction aborts with the conflict exception instead of
  // resurrecting or double-dropping. The interleaves are REAL commits
  // landed between a transaction's snapshot read and its publish
  // (fired inside the first body attempt — deterministic, no sleeps).
  // New protocol shape: no other query exercises the CAS-retry path
  // or the serializable validation.
  // Scale notes (100 TB): validate-and-retry costs O(entries)
  // metadata per attempt and zero data movement; removal is citation
  // arithmetic (orphans swept by remove_orphans), so a conflicting
  // loser aborts without having destroyed anything.
  def q304OccTransact(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q304", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    SinkSource.write(ev
      .select((col("event_id") % 9).as("k"), col("event_id").as("v")),
      t, overwrite = true)                                           // v1
    val f = SinkSource.fs(t)
    // arm 1: append-vs-append. The transaction's own file is staged
    // up front (uncited = invisible); the racing engine append lands
    // INSIDE the first body attempt, stealing the version the
    // transaction read.
    val synName = "occ_a1.psv"
    val out = f.create(
      new org.apache.hadoop.fs.Path(t, s"data/$synName"), true)
    out.write("100|1\n100|2\n100|3\n".getBytes("UTF-8")); out.close()
    var fired1 = false
    val (_, attempts1) = SinkSource.transact(t) { _ =>
      if (!fired1) {
        fired1 = true
        SinkSource.write(ev.filter(col("event_id") % 5 === 0)
          .select((col("event_id") % 4 + 20).as("k"),
            (col("event_id") + 1000000).as("v")),
          t, overwrite = false)
      }
      (Seq((100L, synName, 3L)), Set.empty[String])
    }
    // arm 2: retention (drop k=3's citations) vs a racing append —
    // the re-planned body sees the append's files and the rebase
    // keeps them
    var fired2 = false
    val (_, attempts2) = SinkSource.transact(t) { snap =>
      if (!fired2) {
        fired2 = true
        SinkSource.write(ev.filter(col("event_id") % 7 === 2)
          .select((col("event_id") % 3 + 50).as("k"),
            (col("event_id") + 2000000).as("v")),
          t, overwrite = false)
      }
      (Seq.empty, snap.filter(_._1 == 3L).map(_._2).toSet)
    }
    // arm 3: the premise is destroyed BEFORE the transaction commits —
    // a metadata DELETE drops (and eagerly GCs) the pinned files
    val pinned = SinkSource.manifest(t).filter(_._1 == 2L).map(_._2).toSet
    s.conf.set("spark.sql.catalog.graft_occ", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_occ.root", root)
    s.sql("DELETE FROM graft_occ.t WHERE k = 2")
    val conflict =
      try { SinkSource.transact(t)(_ => (Seq.empty, pinned)); 0L }
      catch { case _: SinkConflictException => 1L }
    SinkSource.load(s, t)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("a1_retried", lit(if (attempts1 == 2) 1L else 0L))
      .withColumn("a2_retried", lit(if (attempts2 == 2) 1L else 0L))
      .withColumn("conflict_aborts", lit(conflict))
      .orderBy(col("k"))
  }

  val q304Oracle: String =
    """WITH t AS (
      |  SELECT event_id % 9 AS k, event_id AS v FROM events
      |  WHERE event_id % 9 NOT IN (2, 3)
      |  UNION ALL SELECT 100, c FROM (VALUES (1), (2), (3)) AS s(c)
      |  UNION ALL SELECT 20 + event_id % 4, event_id + 1000000
      |  FROM events WHERE event_id % 5 = 0
      |  UNION ALL SELECT 50 + event_id % 3, event_id + 2000000
      |  FROM events WHERE event_id % 7 = 2)
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS a1_retried, CAST(1 AS BIGINT) AS a2_retried,
      |  CAST(1 AS BIGINT) AS conflict_aborts
      |FROM t GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q305 — EQUALITY DELETES (`SinkSource.equalityDelete`): value-keyed
  // tombstones, the Iceberg-v2 delete shape complementary to
  // positional vectors — a takedown job holds VALUES (spam doc ids,
  // revoked users), not (file, position) pairs, and must not pay a
  // scan to find them. The delete is one metadata commit recording a
  // tiny value file with a SEQUENCE NUMBER; it applies to a data file
  // iff the file is OLDER — so the re-insert arm survives the delete
  // (the semantic that distinguishes sequence-aware deletes from a
  // mere value filter), and it composes with a positional row-level
  // DELETE on the same table. The lifecycle rides the hash: a CDF
  // window crossing the eq commit REFUSES (value tombstones have no
  // metadata-derivable change rows), a raw (non-MoR) compact REFUSES
  // (it would resurrect rows), and a MoR compact MATERIALIZES the
  // deletes — after it the header is self-pruned and the re-read
  // matches the pre-compact answer exactly.
  // Scale notes (100 TB): the delete costs O(values) metadata and
  // zero scans; reads pay a hash-set probe per row only on files
  // older than the delete, and compaction retires even that.
  def q305EqualityDeletes(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q305", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    SinkSource.write(ev
      .select((col("event_id") % 7).as("k"), col("event_id").as("v")),
      t, overwrite = true)                                           // v1
    // the takedown list: driver-held values (takedown lists are
    // driver-sized by nature; ~1% of events here)
    val spam = ev.filter(col("event_id") % 101 === 0)
      .select(col("event_id")).collect().map(_.getLong(0)).toSeq
    SinkSource.equalityDelete(t, "v", spam)                          // v2
    // re-insert HALF the deleted values: newer sequence → they survive
    SinkSource.write(ev
      .filter(col("event_id") % 101 === 0 && col("event_id") % 2 === 0)
      .select((col("event_id") % 7).as("k"), col("event_id").as("v")),
      t, overwrite = false)                                          // v3
    // a positional row-level DELETE composes on the same table
    s.conf.set("spark.sql.catalog.graft_eq", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_eq.root", root)
    s.conf.set("spark.sql.catalog.graft_eq.mor", "true")
    s.sql("DELETE FROM graft_eq.t WHERE k = 3 AND v % 5 = 1")        // v4
    val cdfRefuses =
      try { SinkChanges.load(s, t, 1, 2).collect(); 0L }
      catch { case _: Exception => 1L }
    // raw compaction would resurrect rows — refused; MoR compaction
    // materializes the deletes and self-prunes the header
    s.conf.set("spark.sql.catalog.graft_eqr", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_eqr.root", root)
    val rawCompactRefuses =
      try { s.sql("CALL graft_eqr.compact('t')").collect(); 0L }
      catch { case _: Exception => 1L }
    def arm(name: String): DataFrame =
      SinkSource.load(s, t, mor = true)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
        .withColumn("arm", lit(name))
    val before = arm("merged")
    s.sql("CALL graft_eq.compact('t')").collect()
    val eqPruned = if (SinkSource.eqDeletes(t).isEmpty) 1L else 0L
    before.unionByName(arm("compacted"))
      .withColumn("cdf_refuses", lit(cdfRefuses))
      .withColumn("raw_compact_refuses", lit(rawCompactRefuses))
      .withColumn("eq_pruned", lit(eqPruned))
      .select(col("arm"), col("k"), col("n_rows"), col("sum_v"),
        col("cdf_refuses"), col("raw_compact_refuses"), col("eq_pruned"))
      .orderBy(col("arm"), col("k"))
  }

  val q305Oracle: String =
    """WITH base AS (SELECT event_id % 7 AS k, event_id AS v FROM events),
      |kept AS (SELECT * FROM base WHERE v % 101 <> 0),
      |rein AS (SELECT event_id % 7 AS k, event_id AS v FROM events
      |         WHERE event_id % 101 = 0 AND event_id % 2 = 0),
      |vis AS (SELECT * FROM kept UNION ALL SELECT * FROM rein),
      |fin AS (SELECT * FROM vis WHERE NOT (k = 3 AND v % 5 = 1)),
      |g AS (SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v
      |      FROM fin GROUP BY k)
      |SELECT arm, k, n_rows, sum_v, CAST(1 AS BIGINT) AS cdf_refuses,
      |  CAST(1 AS BIGINT) AS raw_compact_refuses,
      |  CAST(1 AS BIGINT) AS eq_pruned
      |FROM (SELECT 'merged' AS arm, * FROM g
      |      UNION ALL SELECT 'compacted', * FROM g)
      |ORDER BY arm, k""".stripMargin

  // --------------------------------------------------------------------
  // q306 — CLUSTERED REWRITE (`CALL rewrite_clustered('t', 'v')`):
  // the data-layout half of q294's skipping story. A table grown by
  // four interleaved appends has every file spanning the full value
  // range — zone maps present but USELESS (the query proves it: zero
  // files are skippable for the selective predicate before the
  // rewrite). The verb rewrites the table range-clustered by
  // (key, v) — a one-off distributed sort through the engine's
  // repartitionByRange, atomic manifest swap, fresh tight stats — and
  // the SAME predicate now rules out files wholesale. The kill-shot
  // from q294 pins it inside the hash: every ruled-out file is
  // physically deleted before the filtered read runs, so the answer
  // can only be right if the scan never plans them.
  // New protocol shape: the only verb that changes the PHYSICAL
  // layout to change later plans (compact changes file counts, not
  // value clustering).
  // Scale notes (100 TB): clustering is the difference between
  // "selective scan reads the table" and "selective scan reads its
  // answer" — one rewrite buys metadata-pruned scans for every later
  // query; the alternative (no layout verb) leaves zone maps
  // permanently useless on append-grown tables.
  def q306ClusteredRewrite(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q306", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    // four interleaved appends: each slice covers the FULL v range,
    // so every file's zone map spans everything — unskippable layout
    (0 until 4).foreach(i =>
      SinkSource.write(ev.filter(col("event_id") % 4 === i)
        .select((col("event_id") % 5).as("k"), col("event_id").as("v"))
        .repartition(4, col("k")),
        t, overwrite = i == 0))
    val cut = ev.agg(max(col("event_id"))).head.getLong(0) / 2
    def ruledOut(): Seq[String] = {
      val stats = SinkSource.manifestStats(t)
      SinkSource.manifest(t).map(_._2).distinct.filter(fl =>
        stats.get(fl).exists(_.exists { case (id, mn, _) =>
          id == 2 && mn >= cut }))
    }
    val beforeUnskippable = if (ruledOut().isEmpty) 1L else 0L
    s.conf.set("spark.sql.catalog.graft_zr", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_zr.root", root)
    s.sql("CALL graft_zr.rewrite_clustered('t', 'v', 32)").collect()
    // kill-shot: the rewrite made files skippable — drop them from
    // disk; the filtered read below must never plan them
    val ruled = ruledOut()
    val afterSkippable = if (ruled.nonEmpty) 1L else 0L
    val f = SinkSource.fs(root)
    ruled.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$t/data/$fl"), false))
    SinkSource.load(s, t)
      .filter(col("v") < cut)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("before_unskippable", lit(beforeUnskippable))
      .withColumn("after_skippable", lit(afterSkippable))
      .orderBy(col("k"))
  }

  val q306Oracle: String =
    """SELECT event_id % 5 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS before_unskippable,
      |  CAST(1 AS BIGINT) AS after_skippable
      |FROM events
      |WHERE event_id < CAST((SELECT MAX(event_id) FROM events) // 2 AS BIGINT)
      |GROUP BY 1 ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q307 — SNAPSHOT BRANCHES + FAST-FORWARD (`CALL branch` /
  // `fast_forward` / `drop_branch`): the write side of WAP, one step
  // past q283's tags — a tag pins an immutable snapshot, a branch is
  // a MOVABLE head you can commit to. Creation is O(entries)
  // metadata: the branch manifest cites the parent's files by
  // borrowed refs, zero bytes copied; the branch is then a full sink
  // table (`<cat>.t.branch_dev`) — the candidate batch lands there
  // through a normal engine INSERT while main's history never moves
  // (the isolation flag rides the hash). Promotion is Iceberg's
  // fast-forward contract: allowed only when main has not advanced
  // since the branch synchronized — the diverged arm REFUSES loudly
  // (no silent merge) — and publishes by translating refs and moving
  // branch-local files, one CAS commit. Every arm is pinned by
  // `VERSION AS OF`, so the hash proves main-before (isolated),
  // main-after (promoted), and main-current (subsequent append)
  // simultaneously.
  // Scale notes (100 TB): staging a candidate corpus for audit must
  // not copy the corpus; branch + fast-forward is the metadata-only
  // fork-and-promote that makes write-audit-publish work at petabyte
  // size, with parent-side GC pinning shared bytes while any branch
  // lives.
  def q307Branches(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q307", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    SinkSource.write(ev
      .select((col("event_id") % 6).as("k"), col("event_id").as("v")),
      t, overwrite = true)                                           // main v1
    s.conf.set("spark.sql.catalog.graft_br", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_br.root", root)
    ev.createOrReplaceTempView("q307_ev")
    s.sql("CALL graft_br.branch('t', 'dev')").collect()
    s.sql("""INSERT INTO graft_br.t.branch_dev
      SELECT event_id % 6, event_id + 1000000
      FROM q307_ev WHERE event_id % 3 = 0""")
    // isolation: the branch commit did not move main
    val isolated = if (SinkSource.currentVersion(t) == 1) 1L else 0L
    s.sql("CALL graft_br.fast_forward('t', 'dev')").collect()        // main v2
    // divergence: a second branch goes stale when main advances
    s.sql("CALL graft_br.branch('t', 'dev2')").collect()
    s.sql("""INSERT INTO graft_br.t.branch_dev2
      SELECT event_id % 6, event_id + 2000000
      FROM q307_ev WHERE event_id % 7 = 3""")
    SinkSource.write(ev.filter(col("event_id") % 11 === 5)
      .select((col("event_id") % 6).as("k"),
        (col("event_id") + 3000000).as("v")),
      t, overwrite = false)                                          // main v3
    val divergedRefuses =
      try { s.sql("CALL graft_br.fast_forward('t', 'dev2')").collect(); 0L }
      catch { case _: Exception => 1L }
    s.sql("CALL graft_br.drop_branch('t', 'dev2')").collect()
    def arm(name: String, df: DataFrame): DataFrame =
      df.groupBy(col("k"))
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
        .withColumn("arm", lit(name))
    arm("main_before", s.sql("SELECT k, v FROM graft_br.t VERSION AS OF 1"))
      .unionByName(arm("main_after",
        s.sql("SELECT k, v FROM graft_br.t VERSION AS OF 2")))
      .unionByName(arm("main_current",
        s.sql("SELECT k, v FROM graft_br.t VERSION AS OF 3")))
      .unionByName(arm("branch",
        s.sql("SELECT k, v FROM graft_br.t.branch_dev")))
      .withColumn("isolated", lit(isolated))
      .withColumn("diverged_refuses", lit(divergedRefuses))
      .select(col("arm"), col("k"), col("n_rows"), col("sum_v"),
        col("isolated"), col("diverged_refuses"))
      .orderBy(col("arm"), col("k"))
  }

  val q307Oracle: String =
    """WITH base AS (SELECT event_id % 6 AS k, event_id AS v FROM events),
      |cand AS (SELECT event_id % 6 AS k, event_id + 1000000 AS v
      |         FROM events WHERE event_id % 3 = 0),
      |app AS (SELECT event_id % 6 AS k, event_id + 3000000 AS v
      |        FROM events WHERE event_id % 11 = 5),
      |arms AS (
      |  SELECT 'main_before' AS arm, k, v FROM base
      |  UNION ALL SELECT 'main_after', k, v
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM cand)
      |  UNION ALL SELECT 'main_current', k, v
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM cand
      |        UNION ALL SELECT * FROM app)
      |  UNION ALL SELECT 'branch', k, v
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM cand))
      |SELECT arm, k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS isolated, CAST(1 AS BIGINT) AS diverged_refuses
      |FROM arms GROUP BY arm, k ORDER BY arm, k""".stripMargin

  // --------------------------------------------------------------------
  // q308 — NULL-COUNT STATISTICS (`#null` manifest headers): the
  // write path records each file's EXACT per-field null count (free —
  // the rows stream through the writer anyway), and two new
  // metadata-only behaviors fall out. (1) `COUNT(col)` pushdown:
  // rows − nulls, both exact commit metadata, so a grouped
  // COUNT(*)/COUNT(w) opens ZERO data files — proven the ManifestAgg
  // way, by physically REMOVING the table's data directory before the
  // counting read runs. (2) `IS NULL` / `IS NOT NULL` file skipping:
  // a zero null count PROVES `w IS NULL` can't match (and
  // nulls == rows proves the complement) — pinned with the q294
  // kill-shot, ruled-out files deleted before the filtered reads.
  // Unlike the min/max zone maps (over-approximations), a null count
  // is a positive claim, which is why the zero entries are emitted
  // rather than omitted. The refusal discipline carries over:
  // tombstoned snapshots and files without records refuse the push.
  // Scale notes (100 TB): completeness audits (COUNT of non-null per
  // column) are the first query every dataset card runs — serving
  // them from commit metadata turns a full scan into a manifest read,
  // and null-skipping prunes the sparse-column access pattern
  // (`WHERE label IS NOT NULL`) that dominates curation reads.
  def q308NullStats(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q308", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val fields3 = Seq(SinkSchemas.SinkField(1, "k",
        org.apache.spark.sql.types.LongType),
      SinkSchemas.SinkField(2, "v", org.apache.spark.sql.types.LongType),
      SinkSchemas.SinkField(3, "w", org.apache.spark.sql.types.LongType))
    val ev = Tables.events(s, dir)
    // t1: the counting table — every file carries null records
    SinkSource.write(ev.select((col("event_id") % 9).as("k"),
      col("event_id").as("v"),
      when(col("event_id") % 3 === 0, lit(null).cast("bigint"))
        .otherwise(col("event_id") % 1000).as("w")),
      s"$root/t1", overwrite = true, fields = Some(fields3))
    // kill-shot 1: counts must come from the manifest alone
    val f = SinkSource.fs(root)
    f.delete(new org.apache.hadoop.fs.Path(s"$root/t1/data"), true)
    val counts = SinkSource.load(s, s"$root/t1")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), count(col("w")).as("n_w"))
      .withColumn("arm", lit("meta_counts"))
    // t2/t3: the skipping tables — never-null and always-null eras in
    // separate files
    def skipTable(t: String): Unit = {
      SinkSource.write(ev.filter(col("event_id") % 2 === 0)
        .select((col("event_id") % 9).as("k"), col("event_id").as("v"),
          col("event_id").as("w")),
        s"$root/$t", overwrite = true, fields = Some(fields3))
      SinkSource.write(ev.filter(col("event_id") % 2 === 1)
        .select((col("event_id") % 9).as("k"), col("event_id").as("v"),
          lit(null).cast("bigint").as("w")),
        s"$root/$t", overwrite = false, fields = Some(fields3))
    }
    skipTable("t2"); skipTable("t3")
    def ruled(t: String, forNull: Boolean): Seq[String] = {
      val nulls = SinkSource.manifestNulls(s"$root/$t")
      val rows = SinkSource.manifest(s"$root/$t").groupBy(_._2)
        .view.mapValues(_.map(_._3).sum).toMap
      rows.keys.toSeq.filter(fl => nulls.get(fl)
        .exists(_.exists { case (id, n) =>
          id == 3 && (if (forNull) n == 0 else n == rows(fl)) }))
    }
    // kill-shot 2: the ruled-out files are gone; the reads can only
    // be right if skipping never plans them
    val ruledNull = ruled("t2", forNull = true)
    val ruledNotNull = ruled("t3", forNull = false)
    ruledNull.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/t2/data/$fl"), false))
    ruledNotNull.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$root/t3/data/$fl"), false))
    val isNull = SinkSource.load(s, s"$root/t2")
      .filter(col("w").isNull)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), count(col("w")).as("n_w"))
      .withColumn("arm", lit("is_null"))
    val isNotNull = SinkSource.load(s, s"$root/t3")
      .filter(col("w").isNotNull)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), count(col("w")).as("n_w"))
      .withColumn("arm", lit("is_not_null"))
    counts.unionByName(isNull).unionByName(isNotNull)
      .withColumn("null_skip", lit(if (ruledNull.nonEmpty) 1L else 0L))
      .withColumn("notnull_skip",
        lit(if (ruledNotNull.nonEmpty) 1L else 0L))
      .select(col("arm"), col("k"), col("n_rows"), col("n_w"),
        col("null_skip"), col("notnull_skip"))
      .orderBy(col("arm"), col("k"))
  }

  val q308Oracle: String =
    """WITH t1 AS (
      |  SELECT event_id % 9 AS k,
      |    CASE WHEN event_id % 3 = 0 THEN NULL
      |         ELSE event_id % 1000 END AS w
      |  FROM events),
      |t2 AS (SELECT event_id % 9 AS k,
      |    CASE WHEN event_id % 2 = 0 THEN event_id ELSE NULL END AS w
      |  FROM events),
      |arms AS (
      |  SELECT 'meta_counts' AS arm, k, COUNT(*) AS n_rows,
      |    COUNT(w) AS n_w FROM t1 GROUP BY k
      |  UNION ALL SELECT 'is_null', k, COUNT(*), COUNT(w)
      |  FROM t2 WHERE w IS NULL GROUP BY k
      |  UNION ALL SELECT 'is_not_null', k, COUNT(*), COUNT(w)
      |  FROM t2 WHERE w IS NOT NULL GROUP BY k)
      |SELECT arm, k, n_rows, n_w, CAST(1 AS BIGINT) AS null_skip,
      |  CAST(1 AS BIGINT) AS notnull_skip
      |FROM arms ORDER BY arm, k""".stripMargin

  // --------------------------------------------------------------------
  // q309 — COLUMN DEFAULT VALUES (`ADD COLUMN .. DEFAULT ..`): the
  // Iceberg initial-default model completing the evolution verb set.
  // The default is frozen at ADD time with the field: rows in files
  // that PREDATE the column read the default instead of NULL (the
  // reader's id-reconciliation serves it — no rewrite), and the
  // ENGINE fills omitted INSERT columns from the same literal
  // (CURRENT_DEFAULT metadata on the table schema drives analysis-
  // time resolution of column-list inserts and the DEFAULT keyword).
  // Explicit NULLs stay NULL — a default is a fill-in, not a
  // constraint. `SET DEFAULT` after the fact is refused loudly
  // (initial defaults are immutable; a mutable current-default would
  // silently change what pre-ADD rows read). The string default
  // pins quote handling; the flag rides the hash.
  // Scale notes (100 TB): backfilling a new column's default over a
  // petabyte table is exactly the rewrite nobody can afford — the
  // initial-default read is the only shape where ADD COLUMN DEFAULT
  // costs one metadata publish and zero data movement.
  def q309ColumnDefaults(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q309", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val ev = Tables.events(s, dir)
    SinkSource.write(ev
      .select((col("event_id") % 7).as("k"), col("event_id").as("v")),
      s"$root/t", overwrite = true)                                  // v1
    s.conf.set("spark.sql.catalog.graft_dv", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dv.root", root)
    ev.createOrReplaceTempView("q309_ev")
    s.sql("ALTER TABLE graft_dv.t ADD COLUMN status BIGINT DEFAULT 7")
    s.sql("ALTER TABLE graft_dv.t ADD COLUMN tag STRING DEFAULT 'none'")
    // full-width insert: explicit values, explicit NULLs stay NULL
    s.sql("""INSERT INTO graft_dv.t
      SELECT event_id % 7, event_id + 1000000,
        CASE WHEN event_id % 8 = 1 THEN NULL ELSE event_id % 100 END,
        concat('t', event_id % 3)
      FROM q309_ev WHERE event_id % 4 = 1""")
    // column-list insert: the engine fills the omitted columns from
    // the CURRENT_DEFAULT metadata this table declares
    s.sql("""INSERT INTO graft_dv.t (k, v)
      SELECT event_id % 7, event_id + 2000000
      FROM q309_ev WHERE event_id % 4 = 2""")
    // the DEFAULT keyword resolves the same way
    s.sql("INSERT INTO graft_dv.t VALUES (0, 999999, DEFAULT, DEFAULT)")
    val setDefaultRefused =
      try { s.sql(
        "ALTER TABLE graft_dv.t ALTER COLUMN status SET DEFAULT 9"); 0L }
      catch { case _: Exception => 1L }
    s.table("graft_dv.t")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        sum(col("status")).as("sum_status"),
        count(col("status")).as("n_status"),
        sum(when(col("tag") === "none", 1L).otherwise(0L)).as("n_none"),
        max(col("tag")).as("max_tag"))
      .withColumn("set_default_refused", lit(setDefaultRefused))
      .orderBy(col("k"))
  }

  val q309Oracle: String =
    """WITH t AS (
      |  SELECT event_id % 7 AS k, event_id AS v, 7 AS status,
      |         'none' AS tag FROM events
      |  UNION ALL
      |  SELECT event_id % 7, event_id + 1000000,
      |    CASE WHEN event_id % 8 = 1 THEN NULL ELSE event_id % 100 END,
      |    concat('t', event_id % 3)
      |  FROM events WHERE event_id % 4 = 1
      |  UNION ALL
      |  SELECT event_id % 7, event_id + 2000000, 7, 'none'
      |  FROM events WHERE event_id % 4 = 2
      |  UNION ALL SELECT 0, 999999, 7, 'none')
      |SELECT k, COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
      |  CAST(SUM(status) AS BIGINT) AS sum_status,
      |  COUNT(status) AS n_status,
      |  CAST(SUM(CASE WHEN tag = 'none' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_none,
      |  MAX(tag) AS max_tag,
      |  CAST(1 AS BIGINT) AS set_default_refused
      |FROM t GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------------------------
  // q310 — BLOOM FILTER INDEXES (`CALL build_bloom('t', 'v', bits)`):
  // the skipping mechanism for POINT lookups clustering can't help —
  // q306's rewrite makes RANGE predicates prunable, but a `v IN (...)`
  // needle hunt on an append-grown table still opens every file
  // (each spans the domain, zone maps prove nothing: the flag rides
  // the hash). The build is one distributed pass — a task per file
  // hashes the column into a bitset sized from the manifest's exact
  // row count, written as a sidecar under blooms/ (the Iceberg-puffin
  // shape) — and the publish is one CAS commit of `#bloom` headers.
  // The scan then probes candidate files' bitsets at PLAN time: a
  // bloom can prove absence (no false negatives), so files whose
  // bitsets reject every asked value are never planned — pinned with
  // the physical-delete kill-shot. The three needles are chosen by a
  // deterministic rule the oracle replays (smallest ids ≡ 5 mod 97).
  // Scale notes (100 TB): needle-in-haystack reads (doc-id lookups,
  // revocation checks) are the access pattern zone maps structurally
  // miss on unclustered tables; per-file blooms turn them from
  // full-table opens into a handful of files at ~10 bits/row of
  // sidecar metadata, probed with candidate-proportional small reads.
  def q310BloomIndex(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q310", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    // append-grown, unclustered: every file spans the v domain
    (0 until 4).foreach(i =>
      SinkSource.write(ev.filter(col("event_id") % 4 === i)
        .select((col("event_id") % 5).as("k"), col("event_id").as("v"))
        .repartition(4, col("k")),
        t, overwrite = i == 0))
    // the needles: a deterministic, oracle-replayable choice
    val targets = ev.filter(col("event_id") % 97 === 5)
      .select(col("event_id")).orderBy(col("event_id"))
      .limit(3).collect().map(_.getLong(0)).toSeq
    // zone maps prove nothing for the needles (every file's v-range
    // covers them)
    val stats = SinkSource.manifestStats(t)
    val zoneRuled = SinkSource.manifest(t).map(_._2).distinct.filter(fl =>
      stats.get(fl).exists(_.exists { case (id, mn, mx) =>
        id == 2 && targets.forall(x => x < mn || x > mx) }))
    val zoneUseless = if (zoneRuled.isEmpty) 1L else 0L
    s.conf.set("spark.sql.catalog.graft_bl", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_bl.root", root)
    s.sql("CALL graft_bl.build_bloom('t', 'v', 10)").collect()
    // files whose blooms reject every needle — then the kill-shot
    val blooms = SinkSource.manifestBlooms(t)
    val cache = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val ruled = SinkSource.manifest(t).map(_._2).distinct.filter { fl =>
      blooms.get(fl).exists(_.exists { case (fid, m, k, bf) =>
        fid == 2 && targets.forall { x =>
          val bits = cache.getOrElseUpdate(bf, SinkSource.readBloom(t, bf))
          !SinkSource.SinkBloom.mightContain(bits, m, k, x)
        }
      })
    }
    val bloomSkips = if (ruled.nonEmpty) 1L else 0L
    val f = SinkSource.fs(root)
    ruled.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$t/data/$fl"), false))
    SinkSource.load(s, t)
      .filter(col("v").isInCollection(targets))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("zone_useless", lit(zoneUseless))
      .withColumn("bloom_skips", lit(bloomSkips))
      .orderBy(col("k"))
  }

  val q310Oracle: String =
    """WITH needles AS (
      |  SELECT event_id FROM events WHERE event_id % 97 = 5
      |  ORDER BY event_id LIMIT 3)
      |SELECT event_id % 5 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS zone_useless,
      |  CAST(1 AS BIGINT) AS bloom_skips
      |FROM events WHERE event_id IN (SELECT event_id FROM needles)
      |GROUP BY 1 ORDER BY k""".stripMargin

  // q311 — PARTITION SPEC EVOLUTION (`CALL evolve_spec('t',
  // 'bucket(8)')`): change what layout NEW writes group files under
  // without rewriting a byte — the verb a growing table hits first at
  // the 100 TB design point (identity(k) is right until the key
  // domain explodes; bucket(m) caps the group count at m forever).
  // The commit is metadata-only (`#curspec` pointer + append-only
  // `#pspec` definition); each file keeps its own era (`#fspec`), and
  // PRUNING CONSULTS THE FILE'S OWN ERA: identity-era keys prune a
  // `k = X` exactly, bucket-era files prune by bucket arithmetic
  // (key == pmod(X, m)) plus the per-file k-range stats bucket-era
  // writers record. Pinned with the physical-delete kill-shot: every
  // file per-era pruning must skip for `k = 12` (identity keys != 12,
  // bucket ids != pmod(12, 8) = 4) is REMOVED from disk before the
  // filtered read — a wrong or missing skip throws, a wrong residual
  // loses rows, so the hash-match proves both sides.
  // Scale notes (100 TB): spec evolution is why the layout decision
  // is not forever — the 1 TB-era identity spec stops scaling when
  // keys×files outgrow manifest planning, and the fix must be a
  // metadata commit, not a petabyte rewrite. Exactness is preserved
  // by refusal: key-filtered metadata deletes, partition DDL, and
  // group-by-key agg pushdown all fall back to row-level paths while
  // non-identity eras are present (SpecEvolutionSpec pins the
  // matrix).
  def q311SpecEvolution(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q311", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
      .select((col("event_id") % 50).as("k"), col("event_id").as("v"))
    // v1: the identity era — one file group per k
    SinkSource.write(ev.filter(col("v") % 3 === 0).repartition(8, col("k")),
      t, overwrite = true)
    s.conf.set("spark.sql.catalog.graft_pse", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_pse.root", root)
    // v2: evolve — metadata-only, no file moves
    s.sql("CALL graft_pse.evolve_spec('t', 'bucket(8)')").collect()
    // v3: the bucket era — the same appends now land in 8 groups
    SinkSource.write(ev.filter(col("v") % 3 =!= 0).repartition(4, col("k")),
      t, overwrite = false)
    val m = SinkSource.manifest(t)
    val fsp = SinkSource.fileSpecs(t)
    val (bucketFiles, identityFiles) = m.map(_._2).distinct
      .partition(fl => fsp.getOrElse(fl, 0) != 0)
    val erasMixed =
      if (identityFiles.nonEmpty && bucketFiles.nonEmpty) 1L else 0L
    // KILL-SHOT: remove every file per-era pruning must skip for
    // k = 12 — identity-era groups keyed != 12, bucket-era groups
    // keyed != pmod(12, 8) = 4
    val keep = m.filter { case (key, fl, _) =>
      if (fsp.getOrElse(fl, 0) == 0) key == 12L else key == 4L
    }.map(_._2).toSet
    val doomed = m.map(_._2).distinct.filterNot(keep)
    val f = SinkSource.fs(root)
    doomed.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$t/data/$fl"), false))
    val killShot = if (doomed.nonEmpty) 1L else 0L
    SinkSource.load(s, t)
      .filter(col("k") === 12)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .withColumn("eras_mixed", lit(erasMixed))
      .withColumn("kill_shot", lit(killShot))
  }

  val q311Oracle: String =
    """SELECT event_id % 50 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS eras_mixed,
      |  CAST(1 AS BIGINT) AS kill_shot
      |FROM events WHERE event_id % 50 = 12
      |GROUP BY 1""".stripMargin

  // q312 — SCHEMA EVOLUTION ON WRITE (`mergeSchema`, Delta's option):
  // an append whose frame carries a column the destination lacks
  // auto-evolves the table INSIDE the commit's CAS — the q292 ALTER's
  // field-id machinery issued atomically with the data publish, and
  // reconciled per attempt against the head the commit actually
  // replaces: here an ALTER ADD COLUMN (flag) lands between the
  // table's birth and the evolving append (score), and the published
  // schema is the UNION (k, v, flag, score) — neither evolution is
  // lost. Strict by default: without the option a schema-moved
  // destination refuses (no last-writer-wins on schemas). Old rows
  // read NULL for both added columns by per-file field-id
  // reconciliation; the evolving commit's rows read NULL for `flag`
  // (their files never carried it) — both pinned via COUNT(col).
  // Scale notes (100 TB): ingestion pipelines grow columns; without
  // this verb every upstream schema bump is a coordinated ALTER +
  // redeploy with a refusal window in between. The evolution costs
  // O(columns) metadata riding the commit's own CAS; concurrent
  // ALTERs union by permanent field id or abort loudly
  // (MergeSchemaSpec pins the race matrix).
  def q312MergeSchemaWrite(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q312", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    SinkSource.write(ev.filter(col("event_id") % 3 === 0)
      .select((col("event_id") % 7).as("k"), col("event_id").as("v")),
      t, overwrite = true)                                           // v1
    s.conf.set("spark.sql.catalog.graft_msw", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_msw.root", root)
    s.sql("ALTER TABLE graft_msw.t ADD COLUMN flag BIGINT")          // v2
    // the evolving append: carries `score` (new) and not `flag` —
    // the commit unions both evolutions
    SinkSource.writeEvolved(ev.filter(col("event_id") % 3 =!= 0)
      .select((col("event_id") % 7).as("k"), col("event_id").as("v"),
        (col("event_id") * 2).as("score")), t)                       // v3
    SinkSource.load(s, t)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        count(col("score")).as("n_score"),
        sum(col("score")).as("sum_score"),
        count(col("flag")).as("n_flag"))
  }

  val q312Oracle: String =
    """SELECT event_id % 7 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  COUNT(CASE WHEN event_id % 3 <> 0 THEN 1 END) AS n_score,
      |  CAST(SUM(CASE WHEN event_id % 3 <> 0 THEN event_id * 2 END)
      |    AS BIGINT) AS sum_score,
      |  CAST(0 AS BIGINT) AS n_flag
      |FROM events GROUP BY 1""".stripMargin

  // q313 — STORAGE-PARTITIONED JOIN on bucket-era sink tables: the
  // read-side payoff of q311's spec evolution. Two tables evolved
  // onto the same bucket(8) spec report
  // KeyGroupedPartitioning(bucket(8, k)) (the transform resolved
  // through the catalog's own FunctionCatalog, the Iceberg
  // mechanism), so their equi-join on k plans with ZERO shuffle
  // exchanges — each bucket's splits align pairwise and the join is
  // per-task. The in-query flag pins the plan shape (shuffle-family
  // join present, no Exchange anywhere in the join subtree); the
  // oracle pins the values.
  // Scale notes (100 TB): the shuffle in a fact-fact join IS the
  // dominant cost at scale — both sides rewrite over the network
  // however selective the query. A shared bucket layout makes it
  // pure waste: evolve both tables once (metadata-only), and every
  // later join on the key is exchange-free while all the skipping
  // tiers (zone maps, blooms, bucket arithmetic) still compose
  // upstream. This is Iceberg/Delta's SPJ story re-expressed over
  // the psv manifest.
  def q313BucketSpj(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val root = ShardPaths.resolve(s, "q313", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    s.conf.set("spark.sql.catalog.graft_spj3", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_spj3.root", root)
    val ev = Tables.events(s, dir)
    val facts = ev.select((col("event_id") % 40).as("k"),
      col("event_id").as("v"))
    val dims = ev.groupBy((col("event_id") % 40).as("k"))
      .agg(sum(col("event_id") % 100).as("v"))
    def stageBucketed(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // seed → evolve → truncate-overwrite: the overwrite's files all
      // land in the bucket era, so the table is uniformly bucket(8)
      SinkSource.write(df.limit(1), s"$root/$name", overwrite = true)
      s.sql(s"CALL graft_spj3.evolve_spec('$name', 'bucket(8)')").collect()
      SinkSource.write(df, s"$root/$name", overwrite = true)
    }
    stageBucketed("facts", facts)
    stageBucketed("dims", dims)
    val joined = s.table("graft_spj3.facts").as("a")
      .join(s.table("graft_spj3.dims").as("b"), "k")
    val planStr = joined.queryExecution.executedPlan.toString
    val spjFree =
      if (!planStr.contains("Exchange") &&
        (planStr.contains("SortMergeJoin") ||
          planStr.contains("ShuffledHashJoin"))) 1L else 0L
    joined.select(col("k"), col("a.v").as("av"), col("b.v").as("bv"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("av") + col("bv")).as("s"))
      .withColumn("spj_exchange_free", lit(spjFree))
  }

  val q313Oracle: String =
    """WITH dims AS (
      |  SELECT event_id % 40 AS k,
      |    CAST(SUM(event_id % 100) AS BIGINT) AS w
      |  FROM events GROUP BY 1)
      |SELECT a.k, COUNT(*) AS n_pairs,
      |  CAST(SUM(a.v + b.w) AS BIGINT) AS s,
      |  CAST(1 AS BIGINT) AS spj_exchange_free
      |FROM (SELECT event_id % 40 AS k, event_id AS v FROM events) a
      |JOIN dims b ON a.k = b.k
      |GROUP BY 1""".stripMargin

  // q314 — PARTITIONS METADATA TABLE (`SELECT .. FROM <cat>.<t>
  // .partitions`, Iceberg's partitions table): one row per layout
  // group PER ERA — partition value, the spec it was written under,
  // file and row counts — all manifest arithmetic, zero data files
  // opened. This is the operational introspection spec evolution
  // makes necessary: "which eras still need migrating", "how
  // fragmented is bucket 3", "how big is each group" are the
  // questions a 100 TB table's maintenance jobs ask before choosing
  // compact/rewrite targets, and they must cost metadata, not scans.
  // The fixture spans BOTH eras (identity birth, bucket(4) growth),
  // so the oracle independently recomputes each era's group counts
  // from the raw rows.
  def q314PartitionsMeta(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q314", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val t = s"$root/t"
    val ev = Tables.events(s, dir)
    SinkSource.write(ev.filter(col("event_id") % 2 === 0)
      .select((col("event_id") % 10).as("k"), col("event_id").as("v"))
      .repartition(4, col("k")), t, overwrite = true)                // v1
    s.conf.set("spark.sql.catalog.graft_pmt", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_pmt.root", root)
    s.sql("CALL graft_pmt.evolve_spec('t', 'bucket(4)')").collect()  // v2
    SinkSource.write(ev.filter(col("event_id") % 2 =!= 0)
      .select((col("event_id") % 10).as("k"), col("event_id").as("v"))
      .repartition(2, col("k")), t, overwrite = false)               // v3
    // n_files is layout-noise (task counts); the pinned shape is
    // (group value, era, transform, exact rows)
    s.sql("SELECT key, spec_id, transform, n_rows " +
      "FROM graft_pmt.t.partitions")
  }

  val q314Oracle: String =
    """SELECT event_id % 10 AS key, CAST(0 AS BIGINT) AS spec_id,
      |  'identity' AS transform, COUNT(*) AS n_rows
      |FROM events WHERE event_id % 2 = 0 GROUP BY 1
      |UNION ALL
      |SELECT (event_id % 10) % 4 AS key, CAST(1 AS BIGINT) AS spec_id,
      |  'bucket(4)' AS transform, COUNT(*) AS n_rows
      |FROM events WHERE event_id % 2 <> 0 GROUP BY 1""".stripMargin

  // q315 — RUNTIME FILE PRUNING (V2 dynamic partition pruning /
  // Delta's dynamic file pruning) on the MAIN sink scan: when the
  // fact side of a join sits under an equi-join on k and the dim side
  // carries a selective predicate, Spark hands the materialized build
  // side's key set to the scan AFTER planning, and the same per-era
  // zone-map machinery that serves pushed literals drops whole layout
  // groups the join provably can't touch. The kill-shot IS the
  // correctness gate: every fact file outside the dim's key set is
  // physically REMOVED from disk before the join runs — the query can
  // only answer (and hash-match) if the runtime filter actually
  // pruned those groups from the scan.
  // Scale notes (100 TB): this is THE fact-table idiom — "join the
  // petabyte events table to the 3 surviving campaigns" must cost 3
  // groups' files, and the key set is only knowable at run time
  // (the dim filter is on v, not k, so no static pushdown can see
  // it). The dim builds tiny and broadcasts, so the pruning subquery
  // reuses the broadcast — zero extra passes.
  def q315RuntimeFilePruning(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q315", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    s.conf.set("spark.sql.catalog.graft_dfp", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dfp.root", root)
    // a seventh of events is plenty of fact volume (7 is coprime
    // with the key modulus, so every group stays populated) — the
    // mechanism under test is the runtime prune, not write throughput
    val ev = Tables.events(s, dir).filter(col("event_id") % 7 === 0)
    SinkSource.write(ev.select((col("event_id") % 20).as("k"),
      col("event_id").as("v")).repartition(8, col("k")),
      s"$root/fact", overwrite = true)
    // the dim: 20 rows, v = k * 7 — the query filters on v, so the
    // surviving KEY set {1, 3} is only derivable at run time
    import s.implicits._
    SinkSource.write((0L until 20L).map(k => (k, k * 7)).toDF("k", "v"),
      s"$root/dim", overwrite = true)
    // KILL-SHOT: remove every fact group the dim filter can't match
    val fact = s"$root/fact"
    val doomed = SinkSource.manifest(fact)
      .filterNot(e => e._1 == 1L || e._1 == 3L).map(_._2).distinct
    val f = SinkSource.fs(fact)
    doomed.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$fact/data/$fl"), false))
    val pruned = if (doomed.nonEmpty) 1L else 0L
    // NO broadcast hint (round 18): the dim's DEFAULT-ON manifest
    // statistics report its true ~20-row size, the planner broadcasts
    // it on its own, and DPP's default reuseBroadcastOnly posture
    // rides that broadcast to insert the pruning subquery — exactly
    // the production idiom (dim tables broadcast from commit-protocol
    // stats, the fact scan prunes off the reused build side). The
    // kill-shot above means this query only answers if that whole
    // chain fired hint-free.
    s.table("graft_dfp.fact").as("a")
      .join(s.table("graft_dfp.dim").as("b").filter(
        col("v").isin(7L, 21L)), Seq("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"), sum(col("a.v")).as("sum_v"))
      .withColumn("dpp_pruned", lit(pruned))
  }

  val q315Oracle: String =
    """SELECT event_id % 20 AS k, COUNT(*) AS n_rows,
      |  CAST(SUM(event_id) AS BIGINT) AS sum_v,
      |  CAST(1 AS BIGINT) AS dpp_pruned
      |FROM events WHERE event_id % 20 IN (1, 3) AND event_id % 7 = 0
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // q316 — MoR STORAGE-PARTITIONED JOIN: q313's exchange-free join,
  // kept through row-level deletes. Both tables are uniformly
  // bucket(8)-era under a mor=true catalog; the fact side then takes
  // a positional DELETE finer than the key (deletion vectors land,
  // data files untouched). Tombstones only REMOVE rows — a file's
  // bucket identity is unchanged — so the MoR scan still reports
  // KeyGroupedPartitioning(bucket(8, k)) and the join plans with
  // ZERO shuffle exchanges while every vector is merged row-by-row.
  // The in-query flag pins BOTH claims (exchange-free plan AND
  // tombstones actually present); the oracle recomputes the
  // post-delete join from the source.
  // Scale notes (100 TB): MERGE/CDC workloads produce exactly this
  // table state — bucket-era facts with fresh tombstones. Losing SPJ
  // on the first delete would re-shuffle 100 TB to re-earn a layout
  // already on disk; compaction becomes an I/O optimization, not a
  // prerequisite for sane join plans.
  def q316MorBucketSpj(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val root = ShardPaths.resolve(s, "q316", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    s.conf.set("spark.sql.catalog.graft_spjm", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_spjm.root", root)
    s.conf.set("spark.sql.catalog.graft_spjm.mor", "true")
    val ev = Tables.events(s, dir)
    val facts = ev.select((col("event_id") % 40).as("k"),
      col("event_id").as("v"))
    val dims = ev.groupBy((col("event_id") % 40).as("k"))
      .agg(sum(col("event_id") % 100).as("v"))
    def stageBucketed(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      SinkSource.write(df.limit(1), s"$root/$name", overwrite = true)
      s.sql(s"CALL graft_spjm.evolve_spec('$name', 'bucket(8)')").collect()
      SinkSource.write(df, s"$root/$name", overwrite = true)
    }
    stageBucketed("facts", facts)
    stageBucketed("dims", dims)
    // the row-level delete: finer than the key, so positional
    // deletion vectors land and data files stay byte-identical
    s.sql("DELETE FROM graft_spjm.facts WHERE v % 3 = 1")
    val tombstoned = SinkSource.deleteSidecar(s"$root/facts").nonEmpty
    val joined = s.table("graft_spjm.facts").as("a")
      .join(s.table("graft_spjm.dims").as("b"), "k")
    val planStr = joined.queryExecution.executedPlan.toString
    val spjFree =
      if (tombstoned && !planStr.contains("Exchange") &&
        (planStr.contains("SortMergeJoin") ||
          planStr.contains("ShuffledHashJoin"))) 1L else 0L
    joined.select(col("k"), col("a.v").as("av"), col("b.v").as("bv"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("av") + col("bv")).as("s"))
      .withColumn("mor_spj_exchange_free", lit(spjFree))
  }

  val q316Oracle: String =
    """WITH dims AS (
      |  SELECT event_id % 40 AS k,
      |    CAST(SUM(event_id % 100) AS BIGINT) AS w
      |  FROM events GROUP BY 1)
      |SELECT a.k, COUNT(*) AS n_pairs,
      |  CAST(SUM(a.v + b.w) AS BIGINT) AS s,
      |  CAST(1 AS BIGINT) AS mor_spj_exchange_free
      |FROM (SELECT event_id % 40 AS k, event_id AS v FROM events
      |      WHERE event_id % 3 <> 1) a
      |JOIN dims b ON a.k = b.k
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------------
  // q317 — RUNTIME FILE PRUNING ON A NON-KEY COLUMN: q315's dynamic
  // file pruning, keyed on `v` — a column the layout does NOT
  // organize. The scan reports every BIGINT read column as
  // runtime-filterable (round 18); the fact is range-laid-out on v at
  // write time, so each file's `#stat` zone map on field 2 is tight,
  // and the dim's runtime-derived key set prunes fact files by v
  // range exactly as a k-set prunes by layout group. The kill-shot IS
  // the gate: every fact file whose v zone can't hold the surviving
  // keys is physically deleted before the join — the query only
  // answers (and hash-matches) if the v-keyed prune fired.
  // Scale notes (100 TB): real fact tables join on more than their
  // partition key — order tables join on customer AND date AND item.
  // Layout organizes ONE of those; write-time range clustering plus
  // per-column zone maps is what lets the OTHER join keys still skip
  // I/O, and the runtime-filter surface must expose every covered
  // column or that clustering is wasted.
  def q317RuntimePruneNonKey(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    val root = ShardPaths.resolve(s, "q317", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    s.conf.set("spark.sql.catalog.graft_dfpv", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dfpv.root", root)
    val ev = Tables.events(s, dir)
    // range-partitioned on v at write time → tight per-file v zones
    SinkSource.write(ev.select((col("event_id") % 10).as("k"),
      col("event_id").as("v")).repartitionByRange(4, col("v")),
      s"$root/fact", overwrite = true)
    import s.implicits._
    // dim keys are MULTIPLES OF 11 (present at every SF); the filter
    // is on dim.v, so the surviving key set {33, 99} is only
    // derivable at run time
    SinkSource.write((0L until 50L).map(x => (x * 11, x)).toDF("k", "v"),
      s"$root/dim", overwrite = true)
    // KILL-SHOT: remove every fact file whose v zone misses {33, 99}
    val fact = s"$root/fact"
    val stats = SinkSource.manifestStats(fact)
    def overlaps(fl: String): Boolean =
      stats.get(fl).exists(_.exists { case (id, mn, mx) =>
        id == 2 && mn <= 99L && 33L <= mx })
    val doomed = SinkSource.manifest(fact).map(_._2).distinct
      .filterNot(overlaps)
    val f = SinkSource.fs(fact)
    doomed.foreach(fl =>
      f.delete(new org.apache.hadoop.fs.Path(s"$fact/data/$fl"), false))
    val pruned = if (doomed.nonEmpty) 1L else 0L
    // threshold between the dim's 800 B and the fact's ≥16 KB
    // manifest estimates: the dim broadcasts from its DEFAULT-ON
    // stats, the fact cannot, and DPP rides the dim's broadcast
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
    s.table("graft_dfpv.fact").as("a")
      .join(s.table("graft_dfpv.dim").as("b")
        .filter(col("v").isin(3L, 9L)),
        col("a.v") === col("b.k"))
      .select(col("a.v").as("v"), col("b.v").as("dim_x"))
      .withColumn("dpp_pruned", lit(pruned))
  }

  val q317Oracle: String =
    """SELECT CAST(event_id AS BIGINT) AS v,
      |  CAST(event_id / 11 AS BIGINT) AS dim_x,
      |  CAST(1 AS BIGINT) AS dpp_pruned
      |FROM events WHERE event_id IN (33, 99)""".stripMargin

  // --------------------------------------------------------------------
  // q318 — COLUMN-LEVEL STATISTICS from commit metadata (the V2
  // `Statistics.columnStats` surface, round 18): the scan reports
  // exact per-column min/max (zone maps), exact null counts (`#null`
  // headers), and the key's EXACT distinct count (identity-era
  // manifest entry keys ARE the key domain) — ANALYZE TABLE-grade
  // statistics at zero scan cost, lifted into the logical plan's
  // attributeStats where CBO's selectivity and join-cardinality
  // estimates read them. The query emits the REPORTED statistics as
  // rows (plus a flag pinning that they reached the logical plan);
  // the oracle recomputes every number from the raw source — so a
  // hash match proves the metadata-derived statistics are EXACTLY the
  // truth, not an estimate.
  // Scale notes (100 TB): CBO is only as good as its inputs, and an
  // ANALYZE pass over a petabyte table is a petabyte scan someone has
  // to schedule (and re-schedule after every ingest). Commit-time
  // statistics make the optimizer's inputs a by-product of writing
  // the data — always fresh, never sampled, free at plan time.
  def q318ColumnStats(spark: SparkSession, dir: String): DataFrame = {
    val root = ShardPaths.resolve(spark, "q318", dir)
    SinkSource.fs(root).delete(new org.apache.hadoop.fs.Path(root), true)
    val ev = Tables.events(spark, dir)
    SinkSource.write(ev.select((col("event_id") % 13).as("k"),
      col("event_id").as("v")).repartition(4, col("k")),
      s"$root/t", overwrite = true)
    import scala.jdk.CollectionConverters._
    val cs = new SinkScan(s"$root/t").estimateStatistics().columnStats()
      .asScala.map { case (nr, st) => nr.fieldNames()(0) -> st }
    // the propagation claim, pinned in-result: the V2 relation's
    // LOGICAL stats must carry the per-attribute statistics
    val rel = SinkSource.load(spark, s"$root/t").queryExecution
      .optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.head
    val planned = if (rel.stats.attributeStats.nonEmpty) 1L else 0L
    def row(name: String) = {
      val st = cs(name)
      def opt(o: java.util.OptionalLong): Option[Long] =
        if (o.isPresent) Some(o.getAsLong) else None
      (name,
        st.min().get().asInstanceOf[Long],
        st.max().get().asInstanceOf[Long],
        opt(st.nullCount()),
        opt(st.distinctCount()),
        planned)
    }
    import spark.implicits._
    Seq(row("k"), row("v"))
      .toDF("col", "mn", "mx", "nulls", "ndv", "stats_planned")
      .orderBy(col("col"))
  }

  val q318Oracle: String =
    """SELECT 'k' AS col, CAST(MIN(event_id % 13) AS BIGINT) AS mn,
      |  CAST(MAX(event_id % 13) AS BIGINT) AS mx,
      |  CAST(0 AS BIGINT) AS nulls,
      |  CAST(COUNT(DISTINCT event_id % 13) AS BIGINT) AS ndv,
      |  CAST(1 AS BIGINT) AS stats_planned
      |FROM events
      |UNION ALL
      |SELECT 'v', CAST(MIN(event_id) AS BIGINT),
      |  CAST(MAX(event_id) AS BIGINT), CAST(0 AS BIGINT),
      |  CAST(NULL AS BIGINT), CAST(1 AS BIGINT)
      |FROM events
      |ORDER BY col""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q318_column_stats" -> q318ColumnStats,
    "q317_runtime_prune_nonkey" -> q317RuntimePruneNonKey,
    "q316_mor_bucket_spj" -> q316MorBucketSpj,
    "q315_runtime_file_pruning" -> q315RuntimeFilePruning,
    "q314_partitions_meta" -> q314PartitionsMeta,
    "q313_bucket_spj" -> q313BucketSpj,
    "q312_merge_schema_write" -> q312MergeSchemaWrite,
    "q311_spec_evolution" -> q311SpecEvolution,
    "q310_bloom_index" -> q310BloomIndex,
    "q309_column_defaults" -> q309ColumnDefaults,
    "q308_null_stats" -> q308NullStats,
    "q307_branches" -> q307Branches,
    "q306_clustered_rewrite" -> q306ClusteredRewrite,
    "q305_equality_deletes" -> q305EqualityDeletes,
    "q304_occ_transact" -> q304OccTransact,
    "q303_type_widening" -> q303TypeWidening,
    "q302_rollback" -> q302Rollback,
    "q301_split_planning" -> q301SplitPlanning,
    "q299_remove_orphans" -> q299RemoveOrphans,
    "q298_mv_rewrite" -> q298MvRewrite,
    "q297_incremental_mv" -> q297IncrementalMv,
    "q296_change_data_feed" -> q296ChangeDataFeed,
    "q295_stats_minmax" -> q295StatsMinmax,
    "q294_zonemap_skipping" -> q294ZoneMapSkipping,
    "q293_timestamp_travel" -> q293TimestampTravel,
    "q292_sink_schema_evolution" -> q292SinkSchemaEvolution,
    "q291_check_constraint" -> q291CheckConstraint,
    "q290_partition_ddl" -> q290PartitionDdl,
    "q289_overwrite_by_filter" -> q289OverwriteByFilter,
    "q288_mor_merge" -> q288MorMerge,
    "q287_bucket_transform_write" -> q287BucketTransformWrite,
    "q286_metadata_tables" -> q286MetadataTables,
    "q285_expire_snapshots" -> q285ExpireSnapshots,
    "q284_mor_lineage" -> q284MorLineage,
    "q283_write_audit_publish" -> q283WriteAuditPublish,
    "q280_mor_vacuum" -> q280MorVacuum,
    "q279_mor_update" -> q279MorUpdate,
    "q277_mor_delete" -> q277MorDelete,
    "q276_compact_procedure" -> q276CompactProcedure,
    "q275_merge_upsert" -> q275MergeUpsert,
    "q274_rowlevel_update" -> q274RowLevelUpdate,
    "q271_reported_stats" -> q271ReportedStats,
    "q270_topn_pushdown" -> q270TopNPushdown,
    "q269_clustered_write" -> q269ClusteredWrite,
    "q265_manifest_agg" -> q265ManifestAgg,
    "q263_time_travel" -> q263TimeTravel,
    "q260_v2_commit_write" -> q260V2CommitWrite,
    "q261_v2_metadata_delete" -> q261V2MetadataDelete,
    "q258_file_provenance" -> q258FileProvenance,
    "q252_agg_pushdown" -> q252AggPushdown,
    "q239_xml_roundtrip" -> q239XmlRoundtrip,
    "q236_variant_json" -> q236VariantJson,
    "q235_nested_pruning" -> q235NestedPruning,
    "q164_dynamic_overwrite" -> q164DynamicOverwrite,
    "q145_dynamic_pruning" -> q145DynamicPruning,
    "q129_bucketed_join" -> q129BucketedJoin,
    "q54_csv_roundtrip" -> q54CsvRoundtrip,
    "q55_json_roundtrip" -> q55JsonRoundtrip,
    "q96_orc_roundtrip" -> q96OrcRoundtrip,
    "q59_corrupt_tolerant" -> q59CorruptTolerant,
    "q63_partition_pruning" -> q63PartitionPruning,
    "q64_schema_evolution" -> q64SchemaEvolution)

  def oracleSql: Map[String, String] = Map(
    "q318_column_stats" -> q318Oracle,
    "q317_runtime_prune_nonkey" -> q317Oracle,
    "q316_mor_bucket_spj" -> q316Oracle,
    "q315_runtime_file_pruning" -> q315Oracle,
    "q314_partitions_meta" -> q314Oracle,
    "q313_bucket_spj" -> q313Oracle,
    "q312_merge_schema_write" -> q312Oracle,
    "q311_spec_evolution" -> q311Oracle,
    "q310_bloom_index" -> q310Oracle,
    "q309_column_defaults" -> q309Oracle,
    "q308_null_stats" -> q308Oracle,
    "q307_branches" -> q307Oracle,
    "q306_clustered_rewrite" -> q306Oracle,
    "q305_equality_deletes" -> q305Oracle,
    "q304_occ_transact" -> q304Oracle,
    "q303_type_widening" -> q303Oracle,
    "q302_rollback" -> q302Oracle,
    "q301_split_planning" -> q301Oracle,
    "q299_remove_orphans" -> q299Oracle,
    "q298_mv_rewrite" -> q298Oracle,
    "q297_incremental_mv" -> q297Oracle,
    "q296_change_data_feed" -> q296Oracle,
    "q295_stats_minmax" -> q295Oracle,
    "q294_zonemap_skipping" -> q294Oracle,
    "q293_timestamp_travel" -> q293Oracle,
    "q292_sink_schema_evolution" -> q292Oracle,
    "q291_check_constraint" -> q291Oracle,
    "q290_partition_ddl" -> q290Oracle,
    "q289_overwrite_by_filter" -> q289Oracle,
    "q288_mor_merge" -> q288Oracle,
    "q287_bucket_transform_write" -> q287Oracle,
    "q286_metadata_tables" -> q286Oracle,
    "q285_expire_snapshots" -> q285Oracle,
    "q284_mor_lineage" -> q284Oracle,
    "q283_write_audit_publish" -> q283Oracle,
    "q280_mor_vacuum" -> q280Oracle,
    "q279_mor_update" -> q279Oracle,
    "q277_mor_delete" -> q277Oracle,
    "q276_compact_procedure" -> q276Oracle,
    "q275_merge_upsert" -> q275Oracle,
    "q274_rowlevel_update" -> q274Oracle,
    "q271_reported_stats" -> q271Oracle,
    "q270_topn_pushdown" -> q270Oracle,
    "q269_clustered_write" -> q269Oracle,
    "q265_manifest_agg" -> q265Oracle,
    "q263_time_travel" -> q263Oracle,
    "q260_v2_commit_write" -> q260Oracle,
    "q261_v2_metadata_delete" -> q261Oracle,
    "q258_file_provenance" -> q258Oracle,
    "q252_agg_pushdown" -> q252Oracle,
    "q239_xml_roundtrip" -> q239Oracle,
    "q236_variant_json" -> q236Oracle,
    "q235_nested_pruning" -> q235Oracle,
    "q164_dynamic_overwrite" -> q164Oracle,
    "q145_dynamic_pruning" -> q145Oracle,
    "q129_bucketed_join" -> q129Oracle,
    "q54_csv_roundtrip" -> q54Oracle,
    "q55_json_roundtrip" -> q55Oracle,
    "q96_orc_roundtrip" -> q96Oracle,
    "q59_corrupt_tolerant" -> q59Oracle,
    "q63_partition_pruning" -> q63Oracle,
    "q64_schema_evolution" -> q64Oracle)
}
