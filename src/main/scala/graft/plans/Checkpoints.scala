package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation policy for the iterative operators
  * ([[graft.operators.Dedup.duplicateClusters]]' min-label loop,
  * [[graft.operators.QualityModels.bpeMerges]]' corpus-rewrite chain):
  * each round must cut the growing plan, or iteration i's plan contains
  * all of 0..i-1.
  *
  * By default that cut is `localCheckpoint` — executor-local blocks, no
  * filesystem round-trip, the right call at local[*] and for any job
  * whose re-run cost is acceptable. But local checkpoints TRUNCATE
  * lineage without durable storage: on a real cluster, losing one
  * executor mid-loop loses blocks that can no longer be recomputed and
  * kills the job (Spark logs the exact WARN). Setting
  * `spark.graft.checkpoint.dir` opts the loops into RELIABLE
  * checkpoints backed by `SparkContext.setCheckpointDir` — an
  * executor loss then recomputes the lost partitions from the
  * checkpoint files instead of failing the job. Point it at durable
  * shared storage (HDFS/object store at cluster scale); see DEPLOY.md.
  *
  * Checkpoint FILES are owned by the dir's lifecycle: delete the dir
  * after the job, or set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to let the
  * ContextCleaner reap them as the datasets are GC'd. An existing
  * `SparkContext` checkpoint dir is respected (we only set it when
  * unset).
  */
object Checkpoints {
  val DirConf = "spark.graft.checkpoint.dir"

  def reliableDir(spark: SparkSession): Option[String] =
    spark.conf.getOption(DirConf).filter(_.trim.nonEmpty)

  /** One loop-step materialization: reliable `checkpoint` when the dial
    * is set, `localCheckpoint` otherwise. `eager=false` defers the
    * write to the step's first action (the bpeMerges pattern, whose
    * next action is always a full pass anyway). */
  def iter(df: DataFrame, eager: Boolean = true): DataFrame =
    reliableDir(df.sparkSession) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }

  /** Release a superseded step: unpersists a local checkpoint's blocks
    * (via [[graft.operators.Dedup.freeLocalCheckpoint]]); a reliable
    * checkpoint holds no block-manager state, so this is a safe no-op
    * there — its files follow the dir lifecycle above. */
  def free(df: DataFrame): Unit =
    graft.operators.Dedup.freeLocalCheckpoint(df)
}
