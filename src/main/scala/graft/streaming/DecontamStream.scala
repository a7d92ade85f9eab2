package graft.streaming

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Prep

/** Streaming decontamination with an EVOLVING benchmark set: documents
  * arrive on one stream — benchmark (eval) docs (`doc_id % 10 = 0` stands
  * in, as in the batch query) grow the accumulated shingle-hash state, and
  * every training doc is flagged against the benchmark-as-of-its-batch.
  * This is the production shape for eval-set additions: adding a benchmark
  * doc is an O(its shingles) state append, never a corpus rescan.
  *
  * State: `bench_shingles/batch=<id>` — the batch's distinct benchmark
  * shingle hashes, idempotent overwrite commits ([[EmbeddingIndexStream]]
  * pattern). Output: `out/batch=<id>` — (doc_id, contaminated, n_shared)
  * for the batch's training docs, same idempotent commit. A replayed batch
  * rewrites its own state dir first (deterministic content), then re-flags
  * against state ≤ its own id — byte-identical to the first delivery.
  *
  * Consistency contract (DecontamStreamSpec): flags are FIRST-ARRIVAL —
  * a training doc is judged against benchmark docs delivered in its batch
  * or earlier, so (a) if the full benchmark arrives first, the accumulated
  * output EQUALS the batch [[Prep.decontaminate]]; (b) under any arrival
  * order, streaming flags are a SUBSET of the batch run's (late benchmark
  * docs can only have under-flagged — nothing is ever over-flagged).
  */
object DecontamStream {

  /** Benchmark hashes accumulated by batches ≤ `uptoBatch` — the bound
    * makes a replayed batch read EXACTLY the state its first delivery saw,
    * even if later batches have already grown the benchmark (partition-
    * pruned filter, like OverviewStream's own-partition exclusion). */
  private def benchState(spark: SparkSession, stateDir: String,
      uptoBatch: Long): DataFrame = {
    val path = s"$stateDir/bench_shingles"
    val empty = spark.range(0).select(col("id").as("sh"))
    if (!graft.functions.FsUtils.fs(spark, path)
        .exists(new org.apache.hadoop.fs.Path(path))) empty
    else
      try spark.read.parquet(path).filter(col("batch") <= uptoBatch)
        .select(col("sh"))
      catch { // every dir file-less (benchmark-free batches so far)
        case e: AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
      }
  }

  /** Fold one document micro-batch: grow the benchmark state, then flag
    * the batch's training docs against the accumulated state. Idempotent
    * per batchId. */
  /** @param stateWriteParts files per state/output write — O(batch
    *   shingles) / O(batch docs) rows; raise it if a huge benchmark drop
    *   would serialize the single write task (cf.
    *   [[OverviewStream.applyBatch]]). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      stateDir: String, outDir: String, stateWriteParts: Int = 1): Unit = {
    Prep.benchShingleHashes(batch.filter(Prep.isBenchDoc))
      .coalesce(stateWriteParts)
      .write.mode("overwrite").parquet(s"$stateDir/bench_shingles/batch=$batchId")
    spark.catalog.refreshByPath(s"$stateDir/bench_shingles")
    // state ≤ this batch: same-batch benchmark docs apply to same-batch
    // training docs (matches the batch query when everything arrives at
    // once), later batches are invisible so a replay is byte-identical;
    // distinct over batch dirs because the same shingle may enter the
    // state in several batches
    val bench = benchState(spark, stateDir, uptoBatch = batchId).distinct()
    Prep.decontaminateAgainst(batch.filter(!Prep.isBenchDoc), bench)
      .coalesce(stateWriteParts)
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
  }

  /** The accumulated flag table (one row per delivered training doc).
    * Fresh or file-less output (no training doc delivered yet) reads as
    * empty, like the state reads. */
  def readFlags(spark: SparkSession, outDir: String): DataFrame = {
    val empty = spark.range(0).select(col("id").as("doc_id"),
      lit(false).as("contaminated"), lit(0L).as("n_shared"))
    if (!graft.functions.FsUtils.fs(spark, outDir)
        .exists(new org.apache.hadoop.fs.Path(outDir))) empty
    else
      try spark.read.parquet(outDir).drop("batch")
      catch {
        case e: AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => empty
      }
  }

  /** File-source wrapper: document parquet drops → incremental flags. */
  def run(spark: SparkSession, inDir: String, stateDir: String, outDir: String,
      checkpointDir: String, schemaFrom: DataFrame): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir, outDir)
      }
      .start()
}
