package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Frees the block-manager blocks behind a `localCheckpoint`ed frame.
  *
  * `Dataset.unpersist` routes through the CacheManager, which only knows
  * about `persist()`-cached plans — a checkpointed Dataset's blocks belong
  * to the RDD inside its `LogicalRDD` leaf and are invisible to it, so
  * iterative operators that retire one checkpoint per round (connected
  * components) would otherwise lean on the ContextCleaner's GC-driven
  * cleanup, which with a large heap may not run for dozens of rounds —
  * the block-manager debt class LEAKCHECK tracks (ADVICE r12).
  *
  * Lives beside [[ColumnShim]] inside an `org.apache.spark.sql` subpackage
  * so the `private[sql]` execution internals stay reachable without
  * reflection. Safe on non-checkpoint frames (no-op): only a plan that IS
  * a bare `LogicalRDD` leaf (what `localCheckpoint` returns) is touched,
  * and unpersisting an RDD that was never persisted does nothing.
  *
  * CAUTION: a localCheckpoint truncates lineage — unpersist a checkpoint
  * only once every frame derived from it has been materialized; a later
  * recompute would fail loudly (blocks gone, no lineage to rebuild them).
  */
object CheckpointShim {
  /** The reliable checkpoint file behind `df`, if any — None for local
    * checkpoints and non-checkpoint frames. Observability for the
    * local-cluster auto-mode spec: "which arm did `Checkpoints.ckpt`
    * actually take" is exactly this Option's definedness. */
  def checkpointFile(df: Dataset[_]): Option[String] =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.getCheckpointFile
      case _ => None
    }

  def unpersistCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        lr.rdd.unpersist(blocking)
        // RELIABLE checkpoints (Dataset.checkpoint — the non-local CC
        // path, r15) retire FILES, not blocks: delete the rdd-<id>
        // checkpoint dir once the caller declares the frame dead, the
        // same promptness contract the block unpersist gives local
        // checkpoints (the ContextCleaner only cleans these when
        // spark.cleaner.referenceTracking.cleanCheckpoints is on AND the
        // reference is GC'd — dozens of retired rounds can pile up on
        // the checkpoint store meanwhile). getCheckpointFile is None for
        // local checkpoints and unfinished checkpoints, so this is
        // exactly the reliable-and-materialized case.
        if (lr.rdd.getCheckpointFile.isDefined)
          org.apache.spark.rdd.ReliableRDDCheckpointData.cleanCheckpoint(
            lr.rdd.sparkContext, lr.rdd.id)
      case _ => ()
    }
}
