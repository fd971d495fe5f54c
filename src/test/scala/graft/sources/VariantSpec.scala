package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q236 — VARIANT ingestion. Pins the pieces the oracle can't see:
  * (1) the column really is VariantType through the parquet roundtrip
  *     (a silent fallback to string would keep the answers identical
  *     while re-parsing text per extraction);
  * (2) the generation-divergence contract: try_variant_get navigating
  *     INTO a scalar yields NULL, an object-to-scalar cast yields
  *     NULL, a missing array index yields NULL — those NULLs are what
  *     q236 counts per generation.
  */
class VariantSpec extends SparkSpec {

  test("variant survives parquet and divergent shapes obey the null contract") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_variant").toString
    Seq(
      """{"id":1,"vals":[1.5],"extra":{"flag":true}}""",
      """{"id":2,"vals":[2.5,5.0],"extra":7}""")
      .toDF("js").select(parse_json(col("js")).as("v"))
      .write.mode("overwrite").parquet(s"$dir/p")
    val back = spark.read.parquet(s"$dir/p")
    assert(back.schema("v").dataType ==
      org.apache.spark.sql.types.VariantType,
      s"variant column degraded to ${back.schema("v").dataType}")
    val rows = back.select(
        expr("variant_get(v, '$.id', 'long')").as("id"),
        expr("variant_get(v, '$.vals[0]', 'double')").as("v0"),
        expr("try_variant_get(v, '$.vals[1]', 'double')").as("v1"),
        expr("try_variant_get(v, '$.extra.flag', 'boolean')").as("flag"),
        expr("try_variant_get(v, '$.extra', 'int')").as("ex_num"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = rows(1L)
    assert(a.getDouble(1) == 1.5 && a.isNullAt(2), "gen A vals contract")
    assert(a.getBoolean(3), "gen A extra.flag must extract")
    assert(a.isNullAt(4), "object-to-int cast must be NULL under try_")
    val b = rows(2L)
    assert(b.getDouble(1) == 2.5 && b.getDouble(2) == 5.0, "gen B vals")
    assert(b.isNullAt(3), "path into a scalar must be NULL under try_")
    assert(b.getInt(4) == 7, "gen B scalar extra must extract")
  }
}
