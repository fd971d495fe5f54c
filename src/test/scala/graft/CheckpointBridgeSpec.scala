package graft

import org.apache.spark.sql.graftbridge.CheckpointBridge
import org.apache.spark.storage.StorageLevel

/** The q76 iteration relies on CheckpointBridge actually reaching the
  * blocks behind Dataset.localCheckpoint — these pin that contract so a
  * Spark upgrade that changes the checkpoint plan shape fails here, not
  * as a silent storage leak.
  */
class CheckpointBridgeSpec extends SparkSpec {

  test("localCheckpoint blocks are found and freed deterministically") {
    import spark.implicits._
    val cp = (1 to 100).toDF("x").localCheckpoint(true)
    val rdd = CheckpointBridge.checkpointRdd(cp)
    assert(rdd.nonEmpty, "checkpoint plan no longer exposes its RDD")
    assert(rdd.get.getStorageLevel != StorageLevel.NONE)
    assert(CheckpointBridge.unpersistCheckpoint(cp, blocking = true))
    assert(rdd.get.getStorageLevel == StorageLevel.NONE)
  }

  test("a frame derived FROM a checkpoint is not a checkpoint handle") {
    import spark.implicits._
    val cp = (1 to 10).toDF("x").localCheckpoint(true)
    assert(!CheckpointBridge.unpersistCheckpoint(cp.select(($"x" + 1).as("y"))))
    assert(CheckpointBridge.unpersistCheckpoint(cp))
  }
}
