package graft.ops

import org.apache.spark.sql.DataFrame

/** Per-iteration lineage truncation for the iterative operators
  * (connected-components label propagation in [[LlmOps2.duplicateGroups]]
  * and [[LlmOps5.dupClusters]]).
  *
  * Default is `localCheckpoint()` — fast, no configuration — but its
  * blocks are NON-REPLICATED executor memory/disk: on a real cluster,
  * losing one executor mid-iteration kills the whole job because the
  * truncated lineage can't be recomputed. Setting
  * `graft.iter.checkpoint-dir` to a durable path (HDFS/object store)
  * switches every iteration boundary to a RELIABLE `checkpoint()`, the
  * production-grade spelling at 100 TB: any executor can re-read the
  * checkpointed blocks, so iteration state survives node loss. Local
  * runs keep the zero-config fast path.
  */
private[graft] object IterCheckpoint {

  /** Truncate `df`'s lineage eagerly, reliably iff the session sets
    * `graft.iter.checkpoint-dir`. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("graft.iter.checkpoint-dir").filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir creates a per-context UUID subdir under the
        // base (and qualifies the scheme, e.g. file:/...); only (re)set
        // when the base actually changed so repeated iterations share
        // one subdir
        val bare = dir.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", "")
        if (!sc.getCheckpointDir.exists(_.contains(bare))) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
}
