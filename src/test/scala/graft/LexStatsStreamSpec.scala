package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.streaming.LexStatsStream

/** Maintained lexical-index coverage: the additive df/dl/nd fold is
  * bit-identical to the one-shot batch aggregate under any batching, BM25
  * served from the maintained stats equals the batch bm25Topk bitwise, and
  * the StateLog replay/compaction guards hold.
  */
class LexStatsStreamSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("lexstats").toString
  private def docs = Tables.documents(spark, Sf0001)

  private def statsRows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq

  private def batchStats = statsRows(
    TextAnalysis.lexStatsOf(docs)
      .groupBy("term").agg(sum("df").as("df"), sum("dl").as("dl"), sum("nd").as("nd")))

  private def foldAll(state: String, mod: Int = 3, compactAfter: Int = -1): Unit =
    for (b <- 0 until mod) {
      LexStatsStream.applyBatch(spark, docs.filter($"doc_id" % mod === b),
        b.toLong, state)
      if (b == compactAfter) LexStatsStream.compactState(spark, state)
    }

  test("folded stats over the union equal the one-shot aggregate, any batching") {
    for (mod <- Seq(1, 4)) {
      val state = tmp()
      foldAll(state, mod = mod)
      assert(statsRows(LexStatsStream.currentStats(spark, state)) == batchStats,
        s"mod=$mod")
    }
  }

  test("served BM25 from streamed stats is bitwise-identical to the batch form") {
    val state = tmp()
    foldAll(state)
    val served = LexStatsStream.bm25Topk(spark, state, docs)
      .as[(Long, Double)].collect().toSeq
    val batch = TextAnalysis.bm25Topk(spark, Sf0001)
      .as[(Long, Double)].collect().toSeq
    assert(served == batch)
  }

  test("served BM25 handles a term absent from the corpus (df=0 path)") {
    val state = tmp()
    foldAll(state)
    val out = LexStatsStream.bm25Topk(spark, state, docs,
      terms = Seq("dup", "zzz_no_such_token"), k = 5)
      .as[(Long, Double)].collect()
    assert(out.length == 5)
    // a missing term contributes 0 tf everywhere; scores stay finite
    assert(out.forall { case (_, s) => !s.isNaN && !s.isInfinite })
  }

  test("replay of a folded batch is skipped; counts never double") {
    val state = tmp()
    foldAll(state)
    val applied = LexStatsStream.applyBatch(spark,
      docs.filter($"doc_id" % 3 === 1), 1L, state)
    assert(!applied, "replay must short-circuit on the committed batch dir")
    assert(statsRows(LexStatsStream.currentStats(spark, state)) == batchStats)
  }

  test("replay AFTER compaction is skipped via the fold watermark; stats survive") {
    val state = tmp()
    foldAll(state)
    LexStatsStream.compactState(spark, state)
    assert(LexStatsStream.foldedUpto(spark, state) == 2L)
    val applied = LexStatsStream.applyBatch(spark,
      docs.filter($"doc_id" % 3 === 0), 0L, state)
    assert(!applied, "folded batch must be skipped via the watermark")
    assert(statsRows(LexStatsStream.currentStats(spark, state)) == batchStats)
    // and serving still reads the same answer off the folded state
    assert(LexStatsStream.bm25Topk(spark, state, docs)
      .as[(Long, Double)].collect().toSeq ==
      TextAnalysis.bm25Topk(spark, Sf0001).as[(Long, Double)].collect().toSeq)
  }

  test("file-source end-to-end: dropped parquet batches fold to the one-shot stats") {
    val in = tmp(); val state = tmp(); val ckpt = tmp()
    val q = LexStatsStream.runFileStream(spark, in, state, ckpt,
      schemaFrom = docs, autoCompactBatches = 2)
    try {
      for (b <- 0 to 2) {
        docs.filter($"doc_id" % 3 === b).coalesce(1)
          .write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(statsRows(LexStatsStream.currentStats(spark, state)) == batchStats)
    assert(LexStatsStream.bm25Topk(spark, state, docs)
      .as[(Long, Double)].collect().toSeq ==
      TextAnalysis.bm25Topk(spark, Sf0001).as[(Long, Double)].collect().toSeq)
  }

  test("mid-stream compaction composes with later batches") {
    val state = tmp()
    foldAll(state, mod = 3, compactAfter = 1)
    assert(statsRows(LexStatsStream.currentStats(spark, state)) == batchStats)
  }
}
