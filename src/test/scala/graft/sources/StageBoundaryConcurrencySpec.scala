package graft.sources

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Concurrent builders racing the SAME (query, dir, fingerprint): each
  * attempt writes its own uuid tmp dir, exactly one rename wins, the
  * losers read the winner's complete boundary — never a partial
  * directory, never an exception (the old shared-literal '__tmp' path
  * let builder B delete/overwrite A's completed tmp, after which A
  * could publish B's still-in-progress directory).
  */
class StageBoundaryConcurrencySpec extends SparkSpec {

  test("racing builders all read one complete boundary") {
    val in = Files.createTempDirectory("graft_sbc_in").toString
    import spark.implicits._
    (1L to 100L).toDF("v").coalesce(2).write.mode("overwrite")
      .parquet(s"$in/t")
    spark.conf.set("graft.shards.dir",
      Files.createTempDirectory("graft_sbc_out").toString)

    val threads = 4
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(threads)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = (1 to threads).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          start.await(10, TimeUnit.SECONDS)
          StageBoundary(spark, "sbcrace", in) {
            builds.incrementAndGet()
            spark.read.parquet(s"$in/t").withColumn("w", col("v") * 3)
          }.agg(sum(col("w"))).collect()(0).getLong(0)
        }
      })
    }
    start.countDown()
    val sums = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // every racer sees the complete boundary (sum 3 * 100*101/2)
    assert(sums.forall(_ == 15150L), s"partial boundary read: $sums")
    // publish is atomic: exactly one live fingerprint, no leftover tmp
    val root = new org.apache.hadoop.fs.Path(
      ShardPaths.resolve(spark, "sbcrace", in))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("fp_"))
    assert(names.count(!_.contains("__tmp")) == 1,
      s"expected one live boundary, got ${names.toSeq}")
  }
}
