package graft.plans

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** q247 — dynamic partition overwrite. The oracle proves the merged
  * table state; this spec locks the write-path mechanism itself:
  * (1) a backfill pass rewrites ONLY the partitions present in the
  *     incoming frame — the untouched partitions' FILES are
  *     byte-stable (same names, lengths, mtimes), not merely
  *     value-equal after a silent rewrite;
  * (2) the conf is load-bearing — under the default STATIC mode the
  *     same backfill DROPS every untouched partition.
  */
class DynamicOverwriteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sessionWith(mode: String) = {
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.partitionOverwriteMode", mode)
    s
  }

  test("backfill leaves untouched partitions' files byte-stable") {
    val s = sessionWith("dynamic")
    val out = java.nio.file.Files
      .createTempDirectory("graft_q247_dyn").toString
    graft.queries.PlannerMechanisms.writePass(s, sf, out, None)
    val fs = new Path(out).getFileSystem(s.sessionState.newHadoopConf())
    def listing(lang: String) =
      fs.listStatus(new Path(out, s"lang=$lang"))
        .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
        .sortBy(_._1).toSeq
    val before = Map("de" -> listing("de"), "zh" -> listing("zh"))
    graft.queries.PlannerMechanisms.writePass(s, sf, out, Some("en"))
    assert(listing("de") == before("de") && listing("zh") == before("zh"),
      "dynamic overwrite rewrote partitions the incoming frame never touched")
    val back = s.read.parquet(out)
    import org.apache.spark.sql.functions.col
    assert(back.filter(col("lang") === "en")
      .filter(col("build") =!= "v2").count() == 0, "en partition not replaced")
    assert(back.filter(col("lang") =!= "en")
      .filter(col("build") =!= "v1").count() == 0, "non-en partitions changed")
  }

  test("static mode would drop the untouched partitions (conf is load-bearing)") {
    val s = sessionWith("static")
    val out = java.nio.file.Files
      .createTempDirectory("graft_q247_static").toString
    graft.queries.PlannerMechanisms.writePass(s, sf, out, None)
    graft.queries.PlannerMechanisms.writePass(s, sf, out, Some("en"))
    import org.apache.spark.sql.functions.col
    val langs = s.read.parquet(out).select(col("lang")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(langs.sameElements(Array("en")),
      s"static overwrite should keep only the written partition, got ${langs.mkString(",")}")
  }
}
