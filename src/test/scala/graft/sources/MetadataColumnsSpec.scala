package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q258 — hidden file-metadata columns. The oracle proves the
  * inventory's values; this spec locks the MECHANISM: the provenance
  * scan must read NO data column (file_path and row_index come from
  * the split, not the files), and the path-derived shard key must
  * agree with the data-derived one row-by-row, not just in aggregate.
  */
class MetadataColumnsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the provenance scan's ReadSchema carries no data column") {
    val df = FormatQueries.q258FileProvenance(spark, dir)
    assert(df.collect().length == 8)
    // re-open the written layout exactly as the query does and check
    // the scan line: metadata columns must not widen the projection
    val path = FormatQueries.tmp(spark, "meta", dir)
    val probe = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
      .groupBy(regexp_extract(col("fp"), "/s=(\\d+)/", 1).cast("int")
        .as("shard"))
      .agg(count(lit(1)).as("n_rows"), max(col("ri")).as("max_ri"))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).getOrElse(fail("no FileScan in plan"))
    assert(scan.contains("ReadSchema: struct<_tmp_metadata_row_index:bigint>"),
      s"expected a data-free ReadSchema (metadata + partition only): $scan")
    assert(!scan.contains("doc_id"), s"scan reads a data column: $scan")
  }

  test("path-derived shard equals data-derived shard on every row") {
    FormatQueries.q258FileProvenance(spark, dir)
    val path = FormatQueries.tmp(spark, "meta", dir)
    val mismatches = spark.read.parquet(path)
      .select(col("doc_id"),
        regexp_extract(col("_metadata.file_path"), "/s=(\\d+)/", 1)
          .cast("int").as("from_path"))
      .filter(col("from_path") =!= (col("doc_id") % 8).cast("int"))
      .count()
    assert(mismatches == 0, s"$mismatches rows landed in the wrong shard file")
  }
}
