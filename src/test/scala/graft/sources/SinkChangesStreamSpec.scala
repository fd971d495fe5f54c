package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** q300 — streaming change feed. The oracle proves the maintained
  * aggregate; this spec locks the streaming contracts:
  *   - a retraction arriving in a LATER batch corrects state the
  *     earlier batch built (admission = 1 version per batch);
  *   - a restart resumes from the checkpointed version offset and
  *     consumes only NEW commits;
  *   - a history rewrite mid-stream fails the query loudly.
  */
class SinkChangesStreamSpec extends SparkSpec {

  private def temp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_cdfs_$tag").toString

  private def signedAgg(path: String, name: String, ckpt: String) = {
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    SinkChanges.readStream(spark, path, 0, Some(1))
      .select(col("k"), sign.as("s"), col("v"))
      .groupBy(col("k"))
      .agg(sum(col("s")).as("n"), sum(col("s") * col("v")).as("sv"))
      .writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory").queryName(name).start()
  }

  private def state(name: String): Map[Long, (Long, Long)] =
    spark.table(name).filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("retractions cross batch boundaries; restart resumes the offset") {
    val root = temp("resume")
    import spark.implicits._
    SinkSource.write((0L until 20L).map(i => (i % 2, i)).toDF("k", "v")
      .repartition(2, col("k")), s"$root/t", overwrite = true)       // v1
    spark.conf.set("spark.sql.catalog.graft_cdfs", classOf[SinkCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_cdfs.root", root)
    spark.conf.set("spark.sql.catalog.graft_cdfs.mor", "true")
    spark.sql("DELETE FROM graft_cdfs.t WHERE v >= 15")              // v2
    val ckpt = temp("ckpt")
    val q1 = signedAgg(s"$root/t", "cdfs_a", ckpt)
    q1.processAllAvailable(); q1.stop()
    val afterTwo = state("cdfs_a")
    val expect2 = (0L until 15L).groupBy(_ % 2)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.sum)) }
    assert(afterTwo == expect2, s"retraction lost: $afterTwo")
    // new commits while the stream is DOWN; restart consumes only them
    spark.sql("DELETE FROM graft_cdfs.t WHERE v < 3")                // v3
    val q2 = signedAgg(s"$root/t", "cdfs_b", ckpt)
    q2.processAllAvailable(); q2.stop()
    val afterThree = state("cdfs_b")
    val expect3 = (3L until 15L).groupBy(_ % 2)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.sum)) }
    assert(afterThree == expect3, s"resume wrong: $afterThree")
    // the restarted run planned from the checkpoint: memory sink b
    // holds ONLY post-restart batches, so its state must equal the
    // DELTA-corrected view, proving v1/v2 were not re-read... but a
    // complete-mode agg over only v3's batch would LACK v1's inserts.
    // The checkpointed STATE carries them — which is exactly what the
    // equality above asserts.
  }

  test("a history rewrite mid-stream fails the query loudly") {
    val root = temp("rewrite")
    import spark.implicits._
    SinkSource.write(Seq((1L, 1L), (2L, 2L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true)                                  // v1
    val ckpt = temp("ckpt2")
    val q1 = signedAgg(s"$root/t", "cdfs_c", ckpt)
    q1.processAllAvailable(); q1.stop()
    SinkSource.write(Seq((1L, 9L)).toDF("k", "v").coalesce(1),
      s"$root/t", overwrite = true) // truncate: v1's files leave    // v2
    val q2 = signedAgg(s"$root/t", "cdfs_d", ckpt)
    val ex = intercept[Exception] { q2.processAllAvailable() }
    q2.stop()
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(_.getMessage != null) &&
      chain.exists(t => Option(t.getMessage).exists(_.contains("resync"))),
      s"unexpected failure: $chain")
  }
}
