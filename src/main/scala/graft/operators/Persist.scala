package graft.operators

import org.apache.spark.sql.DataFrame

/** Round-staging for the iterative operators (PageRank's per-round
  * state, the dedup closures, Lloyd sweeps, BPE/unigram dictionaries,
  * the curation keep-lists): every loop here materializes its round
  * frame so round i never re-executes rounds < i (the q45/q134
  * quadratic-re-execution discipline).
  *
  * Backend (VERDICT r17 residual: fault tolerance was pinned to
  * `localCheckpoint`): by default this is `localCheckpoint()` —
  * executor-local blocks, cheapest possible staging, with the
  * documented trade that losing an executor mid-job fails the job and
  * the caller reruns (acceptable interactive/gate semantics). Set
  * `spark.graft.checkpointDir` to a cluster-visible path (HDFS/S3) and
  * every round instead stages through a RELIABLE `checkpoint()` —
  * lineage truncated to durable storage, executor loss recovered by
  * recompute-from-checkpoint — the 100 TB operational posture for
  * multi-hour iterative jobs, flipped by ONE conf with zero operator
  * changes.
  *
  * Lifecycle (ADVICE r18): changing the conf MID-SESSION takes effect
  * on the next round — the applied conf value is tracked and
  * `setCheckpointDir` re-runs when it differs (the SparkContext dir is
  * a UUID SUBDIRECTORY of the conf path, so comparing against
  * `sc.getCheckpointDir` could never detect the change). Reliable
  * checkpoint files accumulate one directory per staged round and are
  * NOT deleted here (the returned plans still read them); set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to let the
  * ContextCleaner reap them when their frames are GC'd, or sweep the
  * directory between jobs — the standard reliable-checkpoint
  * housekeeping.
  */
object Persist {

  /** The conf key selecting the reliable backend. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** The conf value last pushed through `setCheckpointDir` — see the
    * lifecycle note above (`sc.getCheckpointDir` returns the UUID
    * child, never equal to the conf string).
    */
  @volatile private var appliedDir: String = null

  /** Stage an iterative round's frame (eager in both backends).
    *
    * Stats clamp (round 19): checkpoints carry the origin plan's
    * Statistics into the truncated LogicalRDD, and join estimation
    * MULTIPLIES children — so a loop that self-joins its round frame
    * squares the carried sizeInBytes every round, until from ~round 20
    * the driver lives inside BigInteger.multiply in
    * JoinSelection.canBroadcastBySize (observed: q230's inner
    * connectedComponents pinned one core for 75+ minutes of PLANNING
    * at sf0.1 while executors idled). Estimates that fit in a long
    * pass through untouched — small checkpointed build sides stay
    * broadcastable — anything wider clamps to Long.MaxValue, which is
    * what such an estimate already meant to every consumer. See
    * [[org.apache.spark.sql.graftbridge.StatsBridge]].
    */
  def round(df: DataFrame): DataFrame = {
    val cp = df.sparkSession.conf.getOption(CheckpointDirKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = df.sparkSession.sparkContext
        synchronized {
          if (sc.getCheckpointDir.isEmpty || appliedDir != dir) {
            sc.setCheckpointDir(dir)
            appliedDir = dir
          }
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
    org.apache.spark.sql.graftbridge.StatsBridge.clampCheckpointStats(cp)
  }
}
