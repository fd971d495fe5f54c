package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * The reference engine pulls whole tables through a driver-side cursor
  * (`/root/reference/conection.py:55-63`, `SELECT *` + fetchall) — our
  * scans are distributed parquet reads so Catalyst's column pruning and
  * predicate pushdown reach the file scan (check `PushedFilters` /
  * `ReadSchema` in `.explain`). At 100 TB each table is a partitioned
  * parquet dataset; nothing here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One DataFrame per (session, dir, table): the plan carries its file
  // index, so re-listing + footer schema reads happen once per session
  // instead of once per query (the testdata is immutable; a loader for
  // mutable data would re-read). WeakHashMap: entries die with their
  // session.
  private val planCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.mutable.Map[(String, String), DataFrame]]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    planCache.synchronized {
      var m = planCache.get(spark)
      if (m == null) {
        m = scala.collection.mutable.Map.empty
        planCache.put(spark, m)
      }
      m.getOrElseUpdate((dir, name), {
        val df = spark.read.parquet(s"$dir/$name.parquet")
        if (name == "events") normalizeNanoTs(df) else df
      })
    }

  /** The events table carries parquet TIMESTAMP(NANOS) which Spark only
    * reads as a nanosecond long (`spark.sql.legacy.parquet.nanosAsLong`,
    * set in Verify/Bench/tests). Surface it at Spark's native µs
    * precision; nanos within the same µs truncate, matching a
    * `CAST(ts_ns AS TIMESTAMP)` in DuckDB.
    */
  private def normalizeNanoTs(df: DataFrame): DataFrame =
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000"))))
      .getOrElse(df)

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** The documents table, hash-repartitioned on doc_id across all
    * cores. The CPU-dense text pipelines (shingling, per-token hashing)
    * cost orders of magnitude more than one pass of the raw text over
    * the wire, so an up-front even spread always pays for itself: on a
    * cluster it also defends against few/large input files or skewed
    * file sizes — task count follows cores, not file layout.
    */
  def documentsSharded(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "documents")
    df.repartition(s.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("doc_id"))
  }

  /** Embeddings spread across cores, same rationale as
    * [[documentsSharded]]: the dot-product pipelines are CPU-dense
    * relative to vector size, and task count must not be hostage to the
    * input file layout.
    */
  def embeddingsSharded(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "embeddings")
    df.repartition(s.sparkContext.defaultParallelism,
      org.apache.spark.sql.functions.col("vec_id"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
