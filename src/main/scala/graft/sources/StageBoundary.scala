package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted stage boundaries: the production form of an in-plan
  * `.cache()` cut-point. A multi-consumer intermediate (a
  * decontaminated sample, a mixture-filtered survivor set) is written
  * to storage ONCE PER DATASET and read back by every consumer — in
  * any session — instead of being re-materialized into executor memory
  * once per session. At 100 TB a pipeline checkpoints these boundaries
  * anyway (executor memory cannot hold a corpus-sized intermediate,
  * and a session restart must not re-run upstream stages); `.cache()`
  * is the single-session approximation. This helper makes the real
  * thing the default for the heavy cut-points (q82's curation stages).
  *
  * Layout: `<shards base>/<query>_<md5(dir)>/fp_<fingerprint>` where
  * the fingerprint hashes the input directory's recursive file listing
  * (path, length, modification time). Regenerated or edited input data
  * changes the fingerprint, so a stale boundary can never answer for
  * fresh data — the correctness gate (Verify) stays sound with zero
  * cross-run coordination. Older fingerprints under the same query
  * root are deleted best-effort on write, bounding disk to one
  * boundary per (query, dataset).
  *
  * Writes are atomic: build into `<dest>__tmp`, then FS rename into
  * place (the q200 advice — a failure mid-write must not leave a
  * half boundary that later reads serve silently). A concurrent
  * builder losing the rename race just reads the winner's boundary.
  */
object StageBoundary {

  /** Read the boundary for (query, dir) if one exists for the CURRENT
    * input fingerprint; otherwise build, persist atomically, and read
    * back. `build` is by-name — never evaluated on a fingerprint hit.
    */
  def apply(spark: SparkSession, query: String, dir: String)
           (build: => DataFrame): DataFrame = {
    val root = new Path(ShardPaths.resolve(spark, query, dir))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dest = new Path(root, s"fp_${fingerprint(spark, dir)}")
    val marker = new Path(dest, "_SUCCESS")
    if (!fs.exists(marker)) {
      val tmp = new Path(root, dest.getName + "__tmp")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      build.write.mode("overwrite").parquet(tmp.toString)
      // drop superseded fingerprints before publishing the new one
      if (fs.exists(root)) fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("fp_") && !n.endsWith("__tmp") && n != dest.getName)
          try fs.delete(st.getPath, true) catch { case _: Exception => }
      }
      if (!fs.rename(tmp, dest)) {
        // lost a race to a concurrent builder — its boundary is ours too
        fs.delete(tmp, true)
        if (!fs.exists(marker))
          throw new IllegalStateException(s"stage boundary rename failed: $dest")
      }
    }
    spark.read.parquet(dest.toString)
  }

  /** Hash of the input dir's recursive (path, length, mtime) listing —
    * metadata-only (one FS listing, no data read), changes whenever any
    * input file is added, removed, resized, or rewritten.
    */
  private def fingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(d: Path): Unit =
      fs.listStatus(d).sortBy(_.getPath.toString).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else md.update(
          s"${st.getPath}|${st.getLen}|${st.getModificationTime}\n".getBytes("UTF-8"))
      }
    walk(p)
    md.digest().take(8).map("%02x".format(_)).mkString
  }
}
