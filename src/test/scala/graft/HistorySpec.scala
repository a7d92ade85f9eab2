package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.History

class HistorySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, Long, String, String)*): DataFrame =
    rows.map { case (u, id, st, t) => (u, id, st, ts(t)) }
      .toDF("user_id", "event_id", "state", "ts")

  private def hist(df: DataFrame) =
    History.stateHistory(df).collect().map(r => (r.getLong(0), r.getString(1),
      r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))

  test("flip-flop collapses to runs, not states: A→B→A is three intervals") {
    val df = ev(
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (1L, 2L, "A", "2024-01-01 11:00:00"),
      (1L, 3L, "B", "2024-01-01 12:00:00"),
      (1L, 4L, "A", "2024-01-01 13:00:00"))
    val h = hist(df)
    assert(h.map(x => (x._2, x._5)).toSeq == Seq(("A", 2L), ("B", 1L), ("A", 1L)))
    // gapless half-open partition of time: valid_to(i) == valid_from(i+1)
    assert(h.init.zip(h.tail).forall { case (a, b) => a._4.contains(b._3) })
    assert(h.last._4.isEmpty && h.last._6 && h.init.forall(!_._6))
  }

  test("timestamp tie across a change: zero-duration run, tiebreak by event_id") {
    val df = ev(
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (1L, 5L, "B", "2024-01-01 11:00:00"),
      (1L, 6L, "C", "2024-01-01 11:00:00")) // same instant, later event_id
    val h = hist(df)
    assert(h.map(_._2).toSeq == Seq("A", "B", "C"))
    val b = h(1)
    // B's interval is [11:00, 11:00) — zero duration, superseded in-place
    assert(b._3 == ts("2024-01-01 11:00:00") && b._4.contains(ts("2024-01-01 11:00:00")))
    // ...so the as-of read at that instant sees C, never B
    val at = History.stateAsOf(df, "2024-01-01 11:00:00").collect()
    assert(at.map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "C")))
  }

  test("null states form runs under the null-safe compare") {
    val df = ev(
      (1L, 1L, null, "2024-01-01 10:00:00"),
      (1L, 2L, null, "2024-01-01 11:00:00"),
      (1L, 3L, "A", "2024-01-01 12:00:00"))
    val h = hist(df)
    assert(h.length == 2)
    assert(h.head._2 == null && h.head._5 == 2L)
    assert(h.last._2 == "A" && h.last._6)
  }

  test("as-of boundary: the new state holds exactly at its transition instant") {
    val df = ev(
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (1L, 2L, "B", "2024-01-01 12:00:00"),
      (2L, 3L, "X", "2024-01-02 09:00:00")) // first event after the read
    def at(t: String) = History.stateAsOf(df, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(at("2024-01-01 11:59:59") == Seq((1L, "A")))
    assert(at("2024-01-01 12:00:00") == Seq((1L, "B"))) // half-open boundary
    assert(at("2024-01-01 09:59:59") == Seq.empty)      // before any state
    assert(at("2024-01-02 09:00:00") == Seq((1L, "B"), (2L, "X")))
  }

  test("intervals reassemble the log: counts sum, per-user time partition") {
    val rows = (0L until 300L).map { i =>
      (i % 7, i, Seq("A", "B", "C")((i % 11 % 3).toInt),
        f"2024-01-${1 + (i % 25)}%02d 0${i % 9}:00:00")
    }
    val df = ev(rows: _*)
    val h = hist(df)
    assert(h.map(_._5).sum == 300L)
    h.groupBy(_._1).foreach { case (_, runs) =>
      // already in run order per user; gapless and exactly one open interval
      assert(runs.init.zip(runs.tail).forall { case (a, b) => a._4.contains(b._3) })
      assert(runs.count(_._6) == 1 && runs.last._6)
    }
  }

  test("partitioning independence") {
    val rows = (0L until 200L).map { i =>
      (i % 5, i, Seq("A", "B")((i % 3 % 2).toInt), f"2024-02-${1 + (i % 20)}%02d 03:00:00")
    }
    val df = ev(rows: _*)
    assert(hist(df).toSeq == hist(df.repartition(7)).toSeq)
    val a = History.stateAsOf(df, "2024-02-10 00:00:00").collect().toSeq
    val b = History.stateAsOf(df.repartition(7), "2024-02-10 00:00:00").collect().toSeq
    assert(a == b)
  }
}
