package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
import graft.operators.Behavior

/** Real-time funnel monitoring — the streaming twin of
  * [[graft.operators.Behavior.funnel]], with O(1) state PER USER (three
  * nullable stage timestamps) instead of the batch operator's candidate
  * lists.
  *
  * The fold is a per-user state machine: a stage timestamp is set at most
  * once ("first touch"), from the earliest qualifying event strictly after
  * the previous stage. That machine is EXACT under event-time IN-ORDER
  * delivery (each batch's events are no earlier than every prior batch's
  * — the CurationStream delivery contract): a prior-batch stage timestamp
  * can never be superseded by later data, so `coalesce(state, batch
  * candidate)` is the whole merge, and an unset stage resolves against the
  * batch's own candidate lists (which is why the SAME-batch view→click
  * path works). Out-of-order history would need the batch operator's full
  * candidate lists — that recompute IS [[Behavior.funnel]]; the stream
  * refuses regression instead: batches must arrive with ascending ids
  * (`meta` guard), and replays of the last uncommitted batch are the only
  * redelivery foreachBatch produces.
  *
  * Replays are idempotent: the merge only fills nulls, and refilling from
  * the same batch computes the same values. State is rewritten per batch
  * behind the package temp-swap (+ heal preamble) — O(active users), the
  * dashboard's own cardinality, the [[OverviewStream]] keyed-MV shape
  * rather than the append-log shape of the corpus streams.
  */
object FunnelStream {

  private def stPath(stateDir: String) = s"$stateDir/funnel"
  private def metaPath(stateDir: String) = s"$stateDir/meta"

  private def emptyState(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("user_id"),
      col("id").cast("timestamp").as("s1"),
      col("id").cast("timestamp").as("s2"),
      col("id").cast("timestamp").as("s3"))

  private def recoverSwaps(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    for (p <- Seq(stPath(stateDir), metaPath(stateDir))) {
      val out = new org.apache.hadoop.fs.Path(p)
      val tmp = new org.apache.hadoop.fs.Path(p + ".tmp")
      if (!fs.exists(out) && fs.exists(tmp)) FsUtils.renameOrThrow(fs, tmp, out)
    }
  }

  /** Per-user stage timestamps folded so far. */
  def readState(spark: SparkSession, stateDir: String): DataFrame = {
    recoverSwaps(spark, stateDir)
    val path = stPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyState(spark)
    else spark.read.parquet(path).select("user_id", "s1", "s2", "s3")
  }

  /** Highest applied batch id (−1 before the first). */
  def lastApplied(spark: SparkSession, stateDir: String): Long = {
    recoverSwaps(spark, stateDir)
    val p = metaPath(stateDir)
    if (!FsUtils.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))) -1L
    else spark.read.parquet(p).agg(max("batch")).head().getLong(0)
  }

  /** Fold one micro-batch. Returns false (no-op) for batchId ≤ lastApplied
    * — the replay guard that also enforces the ascending-id contract. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String,
                 steps: Seq[String] = Seq("view", "click", "purchase")): Boolean = {
    recoverSwaps(spark, stateDir)
    if (batchId <= lastApplied(spark, stateDir)) return false
    val Seq(a, b, c) = steps
    val fs = FsUtils.fs(spark, stateDir)
    val own = batch.groupBy("user_id").agg(
      min(when(col("event_type") === a, col("ts"))).as("vb"),
      collect_list(when(col("event_type") === b, col("ts"))).as("cb"),
      collect_list(when(col("event_type") === c, col("ts"))).as("pb"))
    val merged = readState(spark, stateDir)
      .join(own, Seq("user_id"), "full_outer")
      .withColumn("s1n", coalesce(col("s1"), col("vb")))
      .withColumn("s2n", coalesce(col("s2"),
        array_min(filter(col("cb"), t => t > col("s1n")))))
      .withColumn("s3n", coalesce(col("s3"),
        array_min(filter(col("pb"), t => t > col("s2n")))))
      .select(col("user_id"), col("s1n").as("s1"),
        col("s2n").as("s2"), col("s3n").as("s3"))
      .localCheckpoint(true)
    val tmp = new org.apache.hadoop.fs.Path(stPath(stateDir) + ".tmp")
    val dst = new org.apache.hadoop.fs.Path(stPath(stateDir))
    merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    FsUtils.replaceDir(fs, tmp, dst)
    import spark.implicits._
    val metaTmp = new org.apache.hadoop.fs.Path(metaPath(stateDir) + ".tmp")
    Seq(batchId).toDF("batch")
      .coalesce(1).write.mode("overwrite").parquet(metaTmp.toString)
    FsUtils.replaceDir(fs, metaTmp, new org.apache.hadoop.fs.Path(metaPath(stateDir)))
    spark.catalog.refreshByPath(stPath(stateDir))
    org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(merged)
      .foreach(_.unpersist(blocking = false))
    true
  }

  /** The live funnel — over in-order-delivered union events this equals
    * the one-shot [[Behavior.funnel]] exactly (FunnelStreamSpec). */
  def currentFunnel(spark: SparkSession, stateDir: String,
                    steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    Behavior.funnelSummary(readState(spark, stateDir), steps)

  /** File-source wrapper: parquet event drops → live funnel state. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    checkpointDir: String, schemaFrom: DataFrame,
                    steps: Seq[String] = Seq("view", "click", "purchase")): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, steps)
        ()
      }
      .start()
}
