package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Similarity

/** Streaming maintenance of the IVF inverted-list index (the streaming
  * upgrade of `Similarity.appendAssigned`): new embeddings drop as parquet
  * into `inDir`; each micro-batch is assigned against the PERSISTED
  * quantizer (k tiny rows, loaded once per run — never retrained) and lands
  * in the index. Queries (`Similarity.ivfTopKAssigned`) read the index with
  * neither training nor assignment scans, and see new vectors as soon as
  * their batch commits.
  *
  * Idempotence: foreachBatch is at-least-once, and a bare `mode("append")`
  * would duplicate a replayed batch's rows. Each batch instead OVERWRITES
  * its own `batch=<id>` subdirectory — a replay rewrites the same files
  * (same batchId from the checkpoint), so the index holds each delivered
  * vector exactly once. At 100 TB the batch= dirs double as compaction
  * units for `Layout.compactPartitions`.
  */
object EmbeddingIndexStream {

  /** @param quantizedDir when set, each batch ALSO lands in an
    *   int8-quantized index at this path (same `batch=/cluster=` layout,
    *   `qv: array<byte>` instead of `v`). One assignment pass feeds all
    *   writes — membership is identical by construction, quantization is
    *   [[Similarity.buildIndexQuantized]]'s exact scheme (shared code), so
    *   a quantized query against the streamed index equals one against a
    *   from-scratch rebuild (SimilaritySpec pins both). The exact write
    *   commits FIRST; a crash between writes replays the batch and
    *   overwrites every `batch=<id>` dir idempotently.
    * @param pq when set to (indexDir, codebooksPath), each batch also
    *   lands in a product-quantized index (packed BIGINT codes, 25× less
    *   hot storage) — codebooks loaded once per stream start from
    *   [[graft.operators.Pq.saveCodebooks]] output, never retrained
    *   online, encoding shared with [[graft.operators.Pq.buildIndexPq]]
    *   (byte-identical codes; PqSpec pins streamed ≡ one-shot). */
  def run(spark: SparkSession, inDir: String, assignedDir: String,
          checkpointDir: String, schemaFrom: DataFrame,
          centroidsPath: String,
          quantizedDir: Option[String] = None,
          pq: Option[(String, String)] = None): StreamingQuery = {
    // O(k) driver rows, loaded once per stream start — not per batch
    val cents = Similarity.loadCentroids(spark, centroidsPath)
    val pqLoaded = pq.map { case (dir, books) =>
      (dir, graft.operators.Pq.loadCodebooks(spark, books))
    }
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // cluster-partitioned inside the idempotent batch dir: queries
        // partition-prune to their nprobe `cluster=` dirs across all batches
        val assigned = Similarity.assign(batch, cents)
          .localCheckpoint(true) // one assignment pass feeds all writes
        try {
          assigned
            .write.mode("overwrite").partitionBy("cluster")
            .parquet(s"$assignedDir/batch=$batchId")
          quantizedDir.foreach { qd =>
            Similarity.quantizedFromAssigned(assigned)
              .write.mode("overwrite").partitionBy("cluster")
              .parquet(s"$qd/batch=$batchId")
          }
          pqLoaded.foreach { case (pd, cb) =>
            graft.operators.Pq.pqFromAssigned(assigned, cb)
              .write.mode("overwrite").partitionBy("cluster")
              .parquet(s"$pd/batch=$batchId")
          }
        } finally org.apache.spark.sql.graft.DatasetInternals
          .checkpointedRdd(assigned).foreach(_.unpersist(blocking = false))
        ()
      }
      .start()
  }

  /** The queryable inverted-list table (drops the bookkeeping batch col). */
  def readIndex(spark: SparkSession, assignedDir: String): DataFrame =
    spark.read.parquet(assignedDir).drop("batch")
}
