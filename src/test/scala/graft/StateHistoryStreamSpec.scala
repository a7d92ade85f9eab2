package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.History
import graft.streaming.StateHistoryStream

class StateHistoryStreamSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-scd2-stream").toString

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Monotone-ts change log: users recur, states cycle with runs of
    * varying length, some users idle for long stretches — event-id range
    * batching ⇒ event-time in-order delivery per user. */
  private def log(n: Int): DataFrame =
    (0 until n).map { i =>
      (i % 29L, i.toLong, Seq("A", "B", "C")((i / 17 % 3).toInt),
        new Timestamp(ts("2024-01-01 00:00:00").getTime + i * 1000L))
    }.toDF("user_id", "event_id", "state", "ts")

  private def split(df: DataFrame, n: Int, of: Int): Seq[DataFrame] = {
    val sz = (of + n - 1) / n
    (0 until n).map(i =>
      df.filter(col("event_id") >= i * sz && col("event_id") < (i + 1) * sz))
  }

  private def oneShot(df: DataFrame) = History.stateHistory(df).collect().toSeq

  test("in-order fold ≡ one-shot stateHistory, any batching (order included)") {
    val df = log(400)
    val want = oneShot(df)
    for (nB <- Seq(1, 3, 5)) {
      val st = tmp()
      split(df, nB, 400).zipWithIndex.foreach { case (b, i) =>
        assert(StateHistoryStream.applyBatch(spark, b, i, st))
      }
      val got = StateHistoryStream.currentHistory(spark, st).collect().toSeq
      assert(got == want, s"batching $nB diverged")
    }
  }

  test("cross-batch merge extends a run; cross-batch change closes it") {
    val st = tmp()
    val b0 = Seq((1L, 1L, "A", ts("2024-01-01 10:00:00")),
      (1L, 2L, "A", ts("2024-01-01 11:00:00")),
      (2L, 3L, "X", ts("2024-01-01 11:30:00")))
      .toDF("user_id", "event_id", "state", "ts")
    val b1 = Seq((1L, 4L, "A", ts("2024-01-01 12:00:00")), // extends the A run
      (2L, 5L, "Y", ts("2024-01-01 13:00:00")))            // closes X, opens Y
      .toDF("user_id", "event_id", "state", "ts")
    assert(StateHistoryStream.applyBatch(spark, b0, 0, st))
    assert(StateHistoryStream.applyBatch(spark, b1, 1, st))
    val h = StateHistoryStream.currentHistory(spark, st).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getTimestamp(3)), r.getLong(4)))
    assert(h.toSeq == Seq(
      (1L, "A", None, 3L),                                  // ONE merged run of 3
      (2L, "X", Some(ts("2024-01-01 13:00:00")), 1L),       // closed at Y's start
      (2L, "Y", None, 1L)))
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq ==
      oneShot(b0.unionByName(b1)))
  }

  test("idle keys keep their open run and can extend batches later") {
    val st = tmp()
    val mk = (id: Long, u: Long, s: String, t: String) =>
      Seq((u, id, s, ts(t))).toDF("user_id", "event_id", "state", "ts")
    StateHistoryStream.applyBatch(spark, mk(1, 7, "A", "2024-01-01 10:00:00"), 0, st)
    StateHistoryStream.applyBatch(spark, mk(2, 8, "Q", "2024-01-01 11:00:00"), 1, st) // 7 idle
    StateHistoryStream.applyBatch(spark, mk(3, 7, "A", "2024-01-01 12:00:00"), 2, st)
    val h = StateHistoryStream.currentHistory(spark, st).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getBoolean(5)))
    assert(h.toSeq == Seq((7L, "A", 2L, true), (8L, "Q", 1L, true)))
  }

  test("replay guard; crash between closed append and MV swap heals idempotently") {
    val df = log(300)
    val bs = split(df, 3, 300)
    val st = tmp()
    assert(StateHistoryStream.applyBatch(spark, bs(0), 0, st))
    // replay of an applied batch is a guarded no-op
    assert(!StateHistoryStream.applyBatch(spark, bs(0), 0, st))
    // simulate the crash window: snapshot the open MV, apply batch 1
    // (closed/batch=1 lands + MV swaps), then restore the OLD MV — the
    // exact on-disk state of a crash after the closed append
    val fs = graft.functions.FsUtils.fs(spark, st)
    val open = new org.apache.hadoop.fs.Path(s"$st/open")
    val snap = new org.apache.hadoop.fs.Path(s"$st/open-snap")
    org.apache.hadoop.fs.FileUtil.copy(fs, open, fs, snap, false,
      spark.sparkContext.hadoopConfiguration)
    assert(StateHistoryStream.applyBatch(spark, bs(1), 1, st))
    val want = StateHistoryStream.currentHistory(spark, st).collect().toSeq
    fs.delete(open, true)
    graft.functions.FsUtils.renameOrThrow(fs, snap, open)
    spark.catalog.refreshByPath(open.toString)
    assert(StateHistoryStream.lastApplied(spark, st) == 0L)
    // the replay recomputes identical closed rows, keeps the existing dir,
    // and completes the MV swap — no duplication, no loss
    assert(StateHistoryStream.applyBatch(spark, bs(1), 1, st))
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq == want)
    assert(StateHistoryStream.applyBatch(spark, bs(2), 2, st))
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq ==
      oneShot(df))
  }

  test("compaction is a lossless concatenation; empty batches are harmless") {
    val df = log(300)
    val bs = split(df, 5, 300)
    val st = tmp()
    bs.zipWithIndex.foreach { case (b, i) =>
      StateHistoryStream.applyBatch(spark, b, i, st) }
    val before = StateHistoryStream.currentHistory(spark, st).collect().toSeq
    StateHistoryStream.compactState(spark, st)
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq == before)
    // an empty batch advances the watermark without touching intervals
    assert(StateHistoryStream.applyBatch(spark, df.filter(lit(false)), 5, st))
    assert(StateHistoryStream.lastApplied(spark, st) == 5L)
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq == before)
  }

  test("file-source stream end-to-end folds to the one-shot history") {
    val st = tmp(); val in = tmp(); val cp = tmp()
    val df = log(300)
    val bs = split(df, 3, 300)
    val q = StateHistoryStream.runFileStream(spark, in, st, cp,
      schemaFrom = df, autoCompactBatches = 2)
    try {
      bs.foreach { b =>
        // ONE data file per drop: the query is live while we write, and a
        // multi-file append can be listed mid-commit — half the drop in one
        // micro-batch, half in the next, in arbitrary file order, violating
        // the stream's per-user in-order delivery contract (a real
        // deployment gets order from its log; the committer's single-file
        // rename gives the harness the same atomicity)
        b.coalesce(1).write.mode("append").parquet(in)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq ==
      oneShot(df))
  }

  test("leading-null-state batches fold correctly (grp is genuinely 1-based)") {
    // regression: with the <=>-only change test, a key whose first event in
    // a batch carries a NULL state got grp = 0, breaking the per-key merge
    // (the stream reads grp === 1 as "the batch's first run"): run indices
    // collided and a null-only batch minted a SECOND open row per key
    val b0 = Seq((1L, 1L, Option("A"), ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "state", "ts")
    // batch 1 opens with a null state, then B — the stored A run must close
    // at the NULL run's start, not at B's
    val b1 = Seq((1L, 2L, Option.empty[String], ts("2024-01-01 11:00:00")),
      (1L, 3L, Option("B"), ts("2024-01-01 12:00:00")))
      .toDF("user_id", "event_id", "state", "ts")
    // batch 2 is ONLY a null state for the key — must extend the open null
    // run, never mint a second open row
    val b2 = Seq((1L, 4L, Option.empty[String], ts("2024-01-01 13:00:00")))
      .toDF("user_id", "event_id", "state", "ts")
    val union = b0.unionByName(b1).unionByName(b2)
    val st = tmp()
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      assert(StateHistoryStream.applyBatch(spark, b, i, st))
    }
    val got = StateHistoryStream.currentHistory(spark, st).collect().toSeq
    assert(got == oneShot(union))
    // exactly one open interval for the key; B closed by nothing yet? no:
    // B then null → B closed at the null's ts; the null run is open
    assert(got.count(_.isNullAt(3)) === 1)
    assert(StateHistoryStream.readOpen(spark, st).count() === 1L)
  }

  test("uncommitted closed dir (crash window) is invisible to reads and blocks compaction") {
    val st = tmp()
    val df = log(120)
    split(df, 3, 120).zipWithIndex.foreach { case (b, i) =>
      assert(StateHistoryStream.applyBatch(spark, b, i, st)) }
    val before = StateHistoryStream.currentHistory(spark, st).collect().toSeq
    // simulate a crash between the closed append and the MV swap: a closed
    // batch dir exists whose id exceeds the applied watermark
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val closed = new org.apache.hadoop.fs.Path(s"$st/closed")
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(closed, "batch=2"),
      fs, new org.apache.hadoop.fs.Path(closed, "batch=9"), false,
      spark.sparkContext.hadoopConfiguration)
    spark.catalog.refreshByPath(closed.toString)
    // reads honor the commit point: the uncommitted rows are invisible
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq == before)
    // and compaction refuses to fold it (folding then replaying batch 9
    // would duplicate its closed rows)
    StateHistoryStream.compactState(spark, st)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(closed, "batch=-1")))
    // the heal MECHANISM: an applyBatch with the crashed id completes the
    // MV swap (keeping the surviving closed dir), after which the batch is
    // committed, visible, and compactable. (The fixture fabricates batch 9
    // from batch 2's rows, so the resulting HISTORY is a re-merge of old
    // events — a real crash's dir matches its replayed batch; this test
    // pins the commit/visibility mechanics, the equivalence tests above
    // pin the history arithmetic.)
    assert(StateHistoryStream.applyBatch(spark,
      split(df, 3, 120)(2), 9, st))
    val healed = StateHistoryStream.currentHistory(spark, st).collect().toSeq
    assert(healed.nonEmpty)
    StateHistoryStream.compactState(spark, st)
    assert(StateHistoryStream.currentHistory(spark, st).collect().toSeq == healed)
  }
}
