package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the block-level handle behind `Dataset.localCheckpoint`.
  *
  * A localCheckpoint materializes the Dataset as persisted RDD blocks
  * and rewraps them in a `LogicalRDD` — but `Dataset.unpersist` only
  * drops `cache()` entries from the CacheManager, so iterative
  * algorithms that checkpoint per generation (e.g. label propagation in
  * graft.operators.Dedup.q76DedupClusters) would otherwise accumulate
  * every superseded generation on the executors until the driver GC +
  * ContextCleaner get around to it. This exposes the checkpoint's RDD
  * so a superseded generation can be freed deterministically.
  */
object CheckpointBridge {

  /** The persisted RDD behind a checkpoint'ed Dataset — Some only when
    * the plan IS the `LogicalRDD` a checkpoint produces (a projection
    * OVER a checkpoint intentionally returns None: freeing through a
    * derived frame would be freeing blocks someone else still owns).
    */
  def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Free the blocks held by a localCheckpoint'ed Dataset. Returns true
    * when a checkpoint RDD was found and unpersisted — callers that
    * REQUIRE the release (per-iteration cleanup) should assert on it so
    * a plan-shape change cannot silently reintroduce the leak.
    */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Boolean =
    checkpointRdd(df) match {
      case Some(rdd) => rdd.unpersist(blocking); true
      case None => false
    }
}
