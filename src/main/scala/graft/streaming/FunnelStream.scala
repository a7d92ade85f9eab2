package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
import graft.operators.Behavior

/** Real-time funnel monitoring — the streaming twin of
  * [[graft.operators.Behavior.funnel]], with O(1) state PER USER (k
  * nullable stage timestamps) instead of the batch operator's candidate
  * lists. Like the batch operator it folds over ANY k ≥ 2 steps; the step
  * list must stay FIXED for a state dir's lifetime (the state schema is
  * s1…sk — the QualityStream fixed-suite contract).
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
  * behind the [[StateLog]] temp-swap (+ heal preamble) — O(active users),
  * the dashboard's own cardinality, the [[OverviewStream]] keyed-MV shape
  * rather than the append-log shape of the corpus streams.
  */
object FunnelStream {

  private def stPath(stateDir: String) = s"$stateDir/funnel"
  private def metaPath(stateDir: String) = s"$stateDir/meta"

  private def heal(spark: SparkSession, stateDir: String): Unit =
    StateLog.healSwaps(spark, stPath(stateDir), metaPath(stateDir))

  private def stageCols(k: Int): Seq[String] = (1 to k).map(i => s"s$i")

  private def emptyState(spark: SparkSession, k: Int): DataFrame =
    spark.range(0).select(
      (col("id").as("user_id") +:
        stageCols(k).map(s => col("id").cast("timestamp").as(s))): _*)

  /** Per-user stage timestamps folded so far (k = funnel length the state
    * dir was deployed with). */
  def readState(spark: SparkSession, stateDir: String, k: Int = 3): DataFrame = {
    heal(spark, stateDir)
    val path = stPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new org.apache.hadoop.fs.Path(path)))
      emptyState(spark, k)
    else spark.read.parquet(path).select(("user_id" +: stageCols(k)).map(col): _*)
  }

  /** Highest applied batch id (−1 before the first). */
  def lastApplied(spark: SparkSession, stateDir: String): Long = {
    heal(spark, stateDir)
    val p = metaPath(stateDir)
    if (!FsUtils.fs(spark, p).exists(new org.apache.hadoop.fs.Path(p))) -1L
    else spark.read.parquet(p).agg(max("batch")).head().getLong(0)
  }

  /** Fold one micro-batch. Returns false (no-op) for batchId ≤ lastApplied
    * — the replay guard that also enforces the ascending-id contract. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String,
                 steps: Seq[String] = Seq("view", "click", "purchase")): Boolean = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    heal(spark, stateDir)
    if (batchId <= lastApplied(spark, stateDir)) return false
    val k = steps.size
    // the batch's own candidates: first step folds to its min directly; the
    // later steps keep candidate lists so an unset stage can resolve against
    // same-batch events strictly after its (possibly just-set) predecessor
    val aggs =
      min(when(col("event_type") === steps.head, col("ts"))).as("c1") +:
        steps.tail.zipWithIndex.map { case (s, i) =>
          collect_list(when(col("event_type") === s, col("ts"))).as(s"c${i + 2}")
        }
    val own = batch.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    val joined = readState(spark, stateDir, k)
      .join(own, Seq("user_id"), "full_outer")
      .withColumn("n1", coalesce(col("s1"), col("c1")))
    val resolved = (2 to k).foldLeft(joined) { (df, i) =>
      df.withColumn(s"n$i", coalesce(col(s"s$i"),
        array_min(filter(col(s"c$i"), t => t > col(s"n${i - 1}")))))
    }
    val merged = resolved
      .select((col("user_id") +:
        (1 to k).map(i => col(s"n$i").as(s"s$i"))): _*)
      .localCheckpoint(true)
    StateLog.swapWrite(spark, stPath(stateDir), merged)
    import spark.implicits._
    StateLog.swapWrite(spark, metaPath(stateDir), Seq(batchId).toDF("batch"))
    StateLog.release(merged)
    true
  }

  /** The live funnel — over in-order-delivered union events this equals
    * the one-shot [[Behavior.funnel]] exactly (FunnelStreamSpec). */
  def currentFunnel(spark: SparkSession, stateDir: String,
                    steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame =
    Behavior.funnelSummary(readState(spark, stateDir, steps.size), steps)

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
