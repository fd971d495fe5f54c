package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.StarSchema.queries ++
      graft.queries.EventsQueries.queries ++
      graft.queries.EtlParity.queries ++
      graft.operators.TextAnalysis.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Multimodal.queries ++
      graft.queries.Profiling.queries ++
      graft.streaming.StreamingQueries.queries ++
      graft.queries.OperatorQueries.queries ++
      graft.sources.FormatQueries.queries ++
      graft.queries.StatsQueries.queries ++
      graft.queries.TimeSeriesQueries.queries ++
      graft.operators.Curation.queries ++
      graft.operators.ZOrder.queries ++
      graft.queries.PlannerMechanisms.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.StarSchema.oracleSql ++
      graft.queries.EventsQueries.oracleSql ++
      graft.queries.EtlParity.oracleSql ++
      graft.operators.TextAnalysis.oracleSql ++
      graft.operators.Dedup.oracleSql ++
      graft.operators.Similarity.oracleSql ++
      graft.operators.Multimodal.oracleSql ++
      graft.queries.Profiling.oracleSql ++
      graft.streaming.StreamingQueries.oracleSql ++
      graft.queries.OperatorQueries.oracleSql ++
      graft.sources.FormatQueries.oracleSql ++
      graft.queries.StatsQueries.oracleSql ++
      graft.queries.TimeSeriesQueries.oracleSql ++
      graft.operators.Curation.oracleSql ++
      graft.operators.ZOrder.oracleSql ++
      graft.queries.PlannerMechanisms.oracleSql
}
