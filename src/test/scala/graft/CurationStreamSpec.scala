package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Curation
import graft.streaming.CurationStream

/** Incremental curation is proven by batch-equivalence: with id-ordered
  * arrival (backfill/replay), the accumulated streamed output must equal
  * the one-shot batch pipeline over the same corpus. */
class CurationStreamSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val h60 = graft.functions.Hashing.h60 _

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "lang_pred", "quality", "char_len", "ws_tokens", "re_tokens")
      .as[(Long, String, Double, Long, Long, Long)].collect().toSet

  test("id-ordered incremental batches reproduce the batch pipeline exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cstream").toString
    val docs = Tables.documents(spark, Sf0001)
    val batchResult = rows(Curation.curate(spark, Sf0001, hashFn = h60))

    val cuts = Seq(0L, 150L, 300L, Long.MaxValue)
    val streamed = cuts.sliding(2).zipWithIndex.flatMap { case (Seq(lo, hi), i) =>
      val r = rows(CurationStream.curateBatch(spark,
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi), s"$tmp/state",
        batchId = i, hashFn = h60))
      // folding the append-only state logs must not change any election
      if (i == 1) CurationStream.compactState(spark, s"$tmp/state")
      r
    }.toSet
    assert(streamed == batchResult,
      s"streamed ${streamed.size} rows != batch ${batchResult.size}")
  }

  test("re-delivered batch is a no-op (exactly-once via state)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cstream2").toString
    val docs = Tables.documents(spark, Sf0001)
    val b1 = docs.filter(col("doc_id") < 200)
    val first = rows(CurationStream.curateBatch(spark, b1, s"$tmp/state",
      batchId = 0, hashFn = h60))
    assert(first.nonEmpty)
    val redelivered = rows(CurationStream.curateBatch(spark, b1, s"$tmp/state",
      batchId = 1, hashFn = h60))
    assert(redelivered.isEmpty, "re-delivery must add nothing")
  }

  test("auto-compaction triggers on the file threshold and moves nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cstream-auto").toString
    val docs = Tables.documents(spark, Sf0001)
    val batchResult = rows(Curation.curate(spark, Sf0001, hashFn = h60))
    val fs = graft.functions.FsUtils.fs(spark, tmp)
    def bucketFiles: Int = {
      val p = new org.apache.hadoop.fs.Path(s"$tmp/state/buckets")
      if (!fs.exists(p)) 0
      else {
        val it = fs.listFiles(p, true); var n = 0
        while (it.hasNext) { if (!it.next().getPath.getName.startsWith("_")) n += 1 }
        n
      }
    }
    // threshold 1 byte: EVERY batch crosses it → compaction runs inline after
    // each append, so the log's file count stays at one fold's worth
    // instead of growing per batch — and the output still equals the batch
    // pipeline (id-ordered arrival, same contract as the manual test)
    val cuts = Seq(0L, 150L, 300L, Long.MaxValue)
    var maxFiles = 0
    val streamed = cuts.sliding(2).zipWithIndex.flatMap { case (Seq(lo, hi), i) =>
      val r = rows(CurationStream.curateBatch(spark,
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi), s"$tmp/state",
        batchId = i, hashFn = h60, autoCompactBytes = 1L))
      maxFiles = math.max(maxFiles, bucketFiles)
      r
    }.toSet
    assert(streamed == batchResult,
      s"auto-compacted stream ${streamed.size} rows != batch ${batchResult.size}")
    // bounded: never more than one compacted fold's file count (4 test
    // shuffle partitions, plus a success marker filtered out above)
    assert(maxFiles <= 8, s"band log grew to $maxFiles files despite auto-compaction")
  }

  test("out-of-order arrival may over-keep but never drops a batch-kept doc") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cstream4").toString
    val docs = Tables.documents(spark, Sf0001)
    val batchResult = rows(Curation.curate(spark, Sf0001, hashFn = h60))
    // reversed batch order: high ids first
    val streamed =
      rows(CurationStream.curateBatch(spark,
        docs.filter(col("doc_id") >= 250), s"$tmp/state", batchId = 0, hashFn = h60)) ++
      rows(CurationStream.curateBatch(spark,
        docs.filter(col("doc_id") < 250), s"$tmp/state", batchId = 1, hashFn = h60))
    // the contract: superset of the batch keep set (over-keep allowed,
    // drop never), and each streamed row's doc was at least exact-unique
    // and gate-passing (same row content whenever ids overlap)
    assert(batchResult.subsetOf(streamed),
      s"stream dropped ${(batchResult -- streamed).size} batch-kept docs")
  }

  test("file-source streaming wrapper accumulates the batch-equivalent output") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cstream3").toString
    val docs = Tables.documents(spark, Sf0001)
    val batchResult = rows(Curation.curate(spark, Sf0001, hashFn = h60))
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.parquet(s"$tmp/in/b1")
    val q = CurationStream.runFileStream(spark, s"$tmp/in/*", s"$tmp/state",
      s"$tmp/out", s"$tmp/ckpt", docs, hashFn = h60)
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") >= 250).coalesce(1)
        .write.parquet(s"$tmp/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(spark.read.parquet(s"$tmp/out")) == batchResult)
  }
}
