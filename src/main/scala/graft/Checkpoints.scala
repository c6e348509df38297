package graft

import org.apache.spark.sql.DataFrame

/** Round-checkpoint policy for the iterative operators (components /
  * PageRank / k-core / PQ codebooks): every loop truncates its lineage
  * once per round so Catalyst re-planning cost stays constant (the
  * measured pathology in [[operators.Components]]'s scaladoc). HOW the
  * truncation persists is a deployment decision, so it lives in ONE
  * place behind a config instead of hard-coded per operator (r7 VERDICT
  * #5 — make the documented "swap localCheckpoint for checkpoint() on a
  * real cluster" an actual switch):
  *
  *  - default: eager `localCheckpoint()` — executor-local blocks, no
  *    external storage, the right cost model for local mode and for
  *    short-lived rounds on a healthy static cluster;
  *  - `spark.graft.checkpointDir` set: eager RELIABLE `checkpoint()`
  *    into that directory (HDFS/object store on a real cluster).
  *    localCheckpoint blocks die with their executor — under dynamic
  *    allocation, spot preemption, or any executor loss, a 30-round
  *    lineage already truncated to its last round CANNOT be recomputed
  *    and the job dies mid-iteration; reliable checkpoints survive
  *    executor churn, which is the 1000-executor operating mode.
  *
  * The switch is read per call, so a session can gate it per job; the
  * context-global checkpoint directory is set on first reliable use
  * (and re-set when the conf changes — sessions share one context in
  * tests).
  *
  * Retention: superseded rounds' LOCAL checkpoint blocks are reclaimed
  * by the ContextCleaner automatically; RELIABLE checkpoint files are
  * only auto-deleted when
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  * false) — set it alongside the dir, or budget ~O(rounds × frame
  * size) of transient checkpoint storage per job.
  */
object Checkpoints {

  /** Session conf key; value = reliable checkpoint directory. */
  val ConfKey = "spark.graft.checkpointDir"

  def round(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // the checkpoint directory is CONTEXT-global while the conf is
        // session-local, so the set-dir and the checkpoint ride one
        // lock: two sessions configured with different dirs would
        // otherwise interleave and land a checkpoint under the other
        // session's directory (whose owner may clean it — exactly the
        // lost-blocks failure the reliable path exists to prevent).
        // Serializing reliable checkpoints is acceptable: they are
        // per-round, and contention only exists in the multi-session
        // different-dirs case this guards. The CONTEXT's own
        // getCheckpointDir is the source of truth (not a JVM-local
        // cache): it survives context restarts in the same JVM and
        // stays correct when user code calls setCheckpointDir directly.
        synchronized {
          val sc = spark.sparkContext
          // setCheckpointDir creates a unique subdirectory under `dir`,
          // so compare against the PARENT of what the context reports —
          // as hadoop Paths, not java.net.URIs (a dir with spaces or
          // other URI-illegal characters must not crash the round, and
          // a same-path-different-scheme dir must NOT match: hdfs://nn
          // /ckpt vs file:/ckpt are different filesystems). A
          // scheme-less configured dir compares by path (the context
          // reports fully-qualified).
          val want = new org.apache.hadoop.fs.Path(dir)
          val matches = sc.getCheckpointDir.exists { c =>
            Option(new org.apache.hadoop.fs.Path(c).getParent).exists {
              parent =>
                if (want.toUri.getScheme == null)
                  parent.toUri.getPath == want.toUri.getPath
                else parent.toString == want.toString
            }
          }
          if (!matches) sc.setCheckpointDir(dir)
          df.checkpoint()
        }
      case None => df.localCheckpoint()
    }
  }

  /** `.roundCheckpoint()` drop-in so iterative loops keep the postfix
    * shape of the `localCheckpoint()` they replace.
    */
  implicit class RoundCheckpoint(private val df: DataFrame)
      extends AnyVal {
    def roundCheckpoint(): DataFrame = round(df)
  }
}
