package graft.ops

import org.apache.spark.sql.DataFrame

/** Lineage-truncation checkpoint with a reliability escape hatch
  * (VERDICT r19 item 9). The dedup/CC query paths truncate lineage and
  * materialize shared intermediates with EAGER localCheckpoint:
  * executor-local blocks, no external FS required — the right default
  * for a single-node harness, and cheap (guide §5). On a real cluster,
  * losing an executor loses its non-replicated localCheckpoint blocks
  * AND the truncated lineage, failing the job; a session that needs
  * fault tolerance at 100 TB sets
  *
  *   spark.conf.set(Ckpt.DirConf, "hdfs://.../ckpt")   // or any DFS path
  *
  * and every call below becomes a RELIABLE `Dataset.checkpoint` under
  * that directory (the SparkContext checkpoint dir is installed on first
  * use). With the conf unset the behavior is identical to the previous
  * inline `.localCheckpoint(eager)` spelling — CkptSpec pins both modes.
  */
object Ckpt {
  val DirConf = "spark.graft.checkpoint.dir"

  private def cp(df: DataFrame, eager: Boolean): DataFrame =
    df.sparkSession.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  def eager(df: DataFrame): DataFrame = cp(df, eager = true)
  def lazily(df: DataFrame): DataFrame = cp(df, eager = false)
}
