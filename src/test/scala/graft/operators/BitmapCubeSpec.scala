package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q234 — distinct-count cube via re-aggregable bitmap state. The
  * properties that define the shape:
  * (1) every rollup level equals exact COUNT(DISTINCT) — a bitmap is
  *     not a sketch;
  * (2) the cube is INCREMENTALLY maintainable: the OR-merge of two
  *     half-corpus cubes answers identically to the cube of the whole
  *     corpus (the property COUNT(DISTINCT) lacks, and the reason the
  *     cube is persisted state);
  * (3) the timed consumer plan reads the persisted boundary only —
  *     zero document scans at any rollup level.
  */
class BitmapCubeSpec extends SparkSpec {

  private def docs(rows: Seq[(String, String, String)]) = {
    import spark.implicits._
    rows.toDF("source", "lang", "text")
  }

  private val fixture = Seq(
    ("web", "es", "uno dos tres dos"),
    ("web", "es", "tres cuatro"),
    ("web", "en", "one two two"),
    ("books", "es", "uno cinco"),
    ("books", "en", "one six seven"),
    ("books", "en", "six"))

  private def exactLevels(rows: Seq[(String, String, String)]) = {
    val h = docs(rows)
      .select(col("source"), col("lang"),
        explode(split(lower(trim(col("text"))), " ")).as("tok"))
      .select(col("source"), col("lang"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long") + 1L)
          .as("h"))
    val byLang = h.groupBy(col("source"), col("lang"))
      .agg(countDistinct(col("h")).as("vocab"))
      .collect().map(r => ("source_lang", r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    val bySource = h.groupBy(col("source"))
      .agg(countDistinct(col("h")).as("vocab"))
      .collect().map(r => ("source", r.getString(0), "*") -> r.getLong(1))
      .toMap
    val corpus = Map(("corpus", "*", "*") ->
      h.agg(countDistinct(col("h"))).collect()(0).getLong(0))
    byLang ++ bySource ++ corpus
  }

  private def rollup(cube: org.apache.spark.sql.DataFrame) = {
    val byLang = cube.groupBy(col("source"), col("lang"))
      .agg(sum(expr("bitmap_count(bm)")).as("vocab"))
      .select(lit("source_lang").as("level"), col("source"), col("lang"),
        col("vocab"))
    val bySource = cube.groupBy(col("source"), col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy(col("source"))
      .agg(sum(expr("bitmap_count(bm)")).as("vocab"))
      .select(lit("source").as("level"), col("source"), lit("*").as("lang"),
        col("vocab"))
    val corpus = cube.groupBy(col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .agg(sum(expr("bitmap_count(bm)")).as("vocab"))
      .select(lit("corpus").as("level"), lit("*").as("source"),
        lit("*").as("lang"), col("vocab"))
    byLang.unionByName(bySource).unionByName(corpus)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3))
      .toMap
  }

  test("every rollup level equals exact COUNT(DISTINCT)") {
    val got = rollup(TextAnalysis.bitmapCube(docs(fixture)))
    val want = exactLevels(fixture)
    assert(got == want, s"cube rollups drifted from exact: $got vs $want")
  }

  test("merging two half-corpus cubes answers for the whole corpus") {
    val (a, b) = fixture.splitAt(3)
    // incremental maintenance: yesterday's cube OR today's delta cube,
    // merged at the STATE level (bitmap_or_agg over the union of the
    // two cubes' rows) — no rescan of either half
    val merged = TextAnalysis.bitmapCube(docs(a))
      .unionByName(TextAnalysis.bitmapCube(docs(b)))
      .groupBy(col("source"), col("lang"), col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
    assert(rollup(merged) == exactLevels(fixture),
      "state-merged half cubes drifted from the whole-corpus answer")
  }

  test("the consumer plan reads the boundary, never the documents scan") {
    spark.conf.set("graft.shards.dir",
      Files.createTempDirectory("graft_q234").toString)
    val out = TextAnalysis.q234BitmapCube(spark, "/root/testdata/sf0.001")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("documents"),
      "rollup plan rescans the corpus instead of the persisted cube")
    assert(out.count() > 0)
  }
}
