package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative/multi-job operators
  * (connected components, the packing prefix sum).
  *
  * Two tiers, selected by config:
  *   - default: `localCheckpoint` — blocks live on executors WITHOUT
  *     lineage. Right for single-JVM local mode (this sandbox); NOT
  *     preemption-safe on a real cluster: one lost executor kills the
  *     job, because there is no lineage left to recompute from.
  *   - `spark.graft.checkpointDir=<path>` set (cluster runs): RELIABLE
  *     `checkpoint()` to that directory — survives executor loss, and
  *     is what makes a 10^12-row iterative job resumable. This is the
  *     option round 1 lacked; its comments claimed localCheckpoint was
  *     cluster-reliable, which it is not.
  */
object Checkpointing {

  val ConfKey = "spark.graft.checkpointDir"

  // setCheckpointDir qualifies the path and appends a UUID subdir, so
  // comparing sc.getCheckpointDir against the configured value is always
  // false — track what we applied ourselves (one UUID dir per configured
  // path per JVM, not one per materialize call)
  private var applied: Option[String] = None

  /** Materialize `df` eagerly with truncated lineage (see class doc). */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        synchronized {
          if (!applied.contains(dir) || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            applied = Some(dir)
          }
        }
        df.checkpoint(true)
      case _ => df.localCheckpoint(true)
    }
  }
}
