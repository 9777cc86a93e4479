package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Storage release for iterative-loop frames built with
  * `localCheckpoint(true)` (the house rule for pointer-doubling /
  * power-iteration / greedy-selection loops — see Components, PageRank,
  * LabelPropagation, Mmr).
  *
  * `Dataset.unpersist` only consults the CacheManager, but a
  * localCheckpoint persists at the RDD level: the checkpointed frame is a
  * `LogicalRDD` leaf wrapping an RDD that `RDD.localCheckpoint()`
  * implicitly persisted (MEMORY_AND_DISK). So `df.unpersist()` on such a
  * frame is a silent no-op and k loop rounds accumulate k block sets until
  * the ContextCleaner happens to GC the dropped references — a real
  * memory-pressure hazard at 100 TB loop frames (ADVICE r14, Mmr.scala).
  * This walks the frame's logical plan and unpersists the wrapped RDDs
  * directly, freeing the blocks deterministically at the point the loop
  * drops the frame.
  *
  * Safe by construction: only `LogicalRDD` leaves are touched, so calling
  * it on a non-checkpointed frame is a no-op, and unpersisting an RDD is
  * idempotent.
  */
object LoopFrames {

  /** Free the localCheckpoint blocks behind `df` (blocking=false). Call
    * when a loop replaces its previous round's frame; do NOT call on the
    * frame being returned to the caller.
    */
  def release(df: Dataset[_]): Unit =
    df.queryExecution.logical.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
}
