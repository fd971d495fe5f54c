package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Split planning (q301): byte-range splits of large data files plus
  * first-fit packing of small ones. The oracle proves the aggregate;
  * this spec locks the boundary arithmetic and the planning rules:
  *   - EVERY splitBytes choice yields exactly the unsplit multiset —
  *     swept across sizes that land boundaries mid-line, at line
  *     starts, and at newlines (the classic off-by-one surfaces);
  *   - a large file fans out to multiple tasks; many small files
  *     pack into few tasks; default planning is unchanged;
  *   - splitting stands down under pushed topN (whole-file heap);
  *   - string payloads with URL-encoded delimiters cross boundaries
  *     intact (ASCII line discipline).
  */
class SinkSplitSpec extends SparkSpec {

  private def temp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_split_$tag").toString

  private def partitions(path: String, splitBytes: Option[Long]): Int =
    SinkSource.load(spark, path, splitBytes = splitBytes)
      .rdd.getNumPartitions

  test("every boundary placement reads exactly the unsplit multiset") {
    val root = temp("sweep")
    import spark.implicits._
    // one big single-key file with VARIED line lengths so boundaries
    // land everywhere interesting
    val rows = (0L until 3000L).map(i => (1L, i * 7))
    SinkSource.write(rows.toDF("k", "v").coalesce(1), s"$root/t",
      overwrite = true)
    val expected = rows.map(_._2).sorted
    val fileLen = {
      val f = SinkSource.fs(root)
      val name = SinkSource.manifest(s"$root/t").head._2
      f.getFileStatus(new org.apache.hadoop.fs.Path(s"$root/t/data/$name"))
        .getLen
    }
    for (sz <- Seq(1L, 7L, 64L, 1000L, fileLen - 1, fileLen, fileLen + 1)) {
      val got = SinkSource.load(spark, s"$root/t", splitBytes = Some(sz))
        .collect().map(_.getLong(1)).sorted.toSeq
      assert(got == expected, s"splitBytes=$sz lost/duplicated rows " +
        s"(got ${got.length}, expected ${expected.length})")
    }
  }

  test("large files fan out; small files pack; defaults unchanged") {
    val root = temp("plan")
    import spark.implicits._
    // one big file (single key, coalesced) ...
    SinkSource.write((0L until 5000L).map(i => (1L, i)).toDF("k", "v")
      .coalesce(1), s"$root/big", overwrite = true)
    // ... and many small files (one commit per key-batch)
    (0 until 6).foreach(b =>
      SinkSource.write(Seq((b.toLong, b.toLong)).toDF("k", "v").coalesce(1),
        s"$root/small", overwrite = b == 0))
    val bigFiles = SinkSource.manifest(s"$root/big").map(_._2).distinct.size
    val smallFiles = SinkSource.manifest(s"$root/small").map(_._2).distinct.size
    assert(bigFiles == 1 && smallFiles == 6, s"fixture: $bigFiles/$smallFiles")
    assert(partitions(s"$root/big", None) == 1)
    assert(partitions(s"$root/big", Some(4096L)) > 1,
      "a large file must fan out to several byte-range tasks")
    assert(partitions(s"$root/small", Some(1 << 20)) == 1,
      "six tiny files must pack into one task")
    // and both planners read the same content
    val viaSplits = SinkSource.load(spark, s"$root/big",
      splitBytes = Some(4096L)).agg(sum(col("v"))).collect()(0).getLong(0)
    assert(viaSplits == (0L until 5000L).sum)
  }

  test("splitting stands down under a pushed topN") {
    val root = temp("topn")
    import spark.implicits._
    SinkSource.write((0L until 2000L).map(i => (1L, i)).toDF("k", "v")
      .coalesce(1), s"$root/t", overwrite = true)
    val df = SinkSource.load(spark, s"$root/t", splitBytes = Some(1024L))
      .orderBy(col("v").desc).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN"), s"topN not pushed:\n$plan")
    assert(!plan.contains("splitPlanning"),
      s"split planning must stand down under pushed topN:\n$plan")
    assert(df.collect().map(_.getLong(1)).toSeq == Seq(1999L, 1998L, 1997L))
  }

  test("URL-encoded string payloads cross split boundaries intact") {
    val root = temp("str")
    spark.conf.set("spark.sql.catalog.graft_split", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_split.root", root)
    import spark.implicits._
    SinkSource.write(Seq((1L, 1L)).toDF("k", "v").coalesce(1), s"$root/t",
      overwrite = true)
    spark.sql("ALTER TABLE graft_split.t ADD COLUMN s STRING")
    spark.sql("""INSERT INTO graft_split.t
      SELECT 2, id, concat('x|y\nz', CAST(id AS STRING))
      FROM range(0, 500)""")
    val n = SinkSource.load(spark, s"$root/t", splitBytes = Some(256L))
      .filter(col("s").startsWith("x|y\nz")).count()
    assert(n == 500, s"string rows torn across boundaries: $n")
  }
}
