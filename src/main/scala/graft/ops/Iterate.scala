package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded-lineage materialization for iterative round loops (PageRank,
  * BFS, connected components): each round's state must be pinned or the
  * unrolled plan grows exponentially in rounds (see g01's header).
  *
  * Two modes, one call site:
  *  - DEFAULT: `localCheckpoint` — truncated-lineage blocks live in
  *    executor block managers. Fast (no FS round-trip) and correct,
  *    but NOT fault-tolerant: on a real cluster an executor loss drops
  *    the only copy of lineage-truncated state, failing the job.
  *  - RELIABLE: set `spark.graft.checkpointDir` to a shared-storage
  *    path (HDFS/S3) and the SAME call sites write RDD checkpoints
  *    there instead — state survives executor loss and the job
  *    recomputes only the current round. The cost is one write+read
  *    of the per-round state — the standard iterative-workload
  *    tradeoff (GraphX periodic checkpointing, MLlib ALS's
  *    checkpointInterval).
  *
  * OpsSpec pins that both modes produce identical ranks/labels.
  * Reliable checkpoint files are not auto-reclaimed unless
  * spark.cleaner.referenceTracking.cleanCheckpoints is on — point the
  * dir at a job-scoped location.
  */
object Iterate {
  private val CONF_KEY = "spark.graft.checkpointDir"
  // keyed by (applicationId, dir): the checkpoint dir is CONTEXT
  // state — remembering the dir string alone would skip
  // setCheckpointDir on a fresh context in the same JVM and
  // df.checkpoint() would throw
  private var dirSetFor: Option[(String, String)] = None

  /** Pin `df`'s current state with bounded lineage, mode per session
    * conf (see object doc). Eager in both modes. */
  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(CONF_KEY).filter(_.nonEmpty) match {
      case Some(dir) =>
        val key = (s.sparkContext.applicationId, dir)
        synchronized {
          if (!dirSetFor.contains(key)) {
            s.sparkContext.setCheckpointDir(dir)
            dirSetFor = Some(key)
          }
        }
        // persist BEFORE checkpoint: eager checkpoint runs the plan
        // once for its count and a SECOND job to write the partition
        // files — unpersisted, that second job recomputes the whole
        // round subtree (the PeriodicCheckpointer/ALS pattern:
        // persist → checkpoint → unpersist the source)
        df.persist()
        val out = df.checkpoint()
        df.unpersist()
        out
      case None => df.localCheckpoint()
    }
  }
}
