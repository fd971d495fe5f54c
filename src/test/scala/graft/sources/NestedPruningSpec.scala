package graft.sources

import graft.SparkSpec

/** q235 — nested schema pruning. The contract: reading meta.lang and
  * chunks[].n_toks from the nested layout must narrow the parquet
  * ReadSchema to exactly those leaves — the payload column and every
  * sibling subfield (meta.source, meta.n_chars, chunks[].idx) stay
  * unread. Top-level pruning passing while nested pruning silently
  * regresses is exactly the failure this spec exists to catch: the
  * query's answer is unchanged, only the scan reads the petabyte.
  */
class NestedPruningSpec extends SparkSpec {

  test("ReadSchema prunes to the requested nested leaves only") {
    val df = FormatQueries.q235ReadBack(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val read = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no ReadSchema in plan:\n" + plan))
    assert(read.contains("lang"), s"pruned leaf missing: $read")
    assert(read.contains("n_toks"), s"pruned leaf missing: $read")
    assert(!read.contains("text"), s"payload column read: $read")
    assert(!read.contains("n_chars"), s"sibling struct leaf read: $read")
    assert(!read.contains("idx"), s"sibling array leaf read: $read")
    assert(!read.contains("doc_id"), s"unused top-level column read: $read")
  }

  test("the pruned read answers identically to the full read") {
    import org.apache.spark.sql.functions._
    val got = FormatQueries.q235NestedPruning(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("n", size(split(lower(trim(col("text"))), " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr(s"CAST((n - 1) DIV ${FormatQueries.NestedChunk} + 1 AS BIGINT)"))
          .as("n_chunks"),
        sum(col("n")).as("n_tokens"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"nested roundtrip drifted: $got vs $want")
  }
}
