package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Behavior

class BehaviorSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, at) => (u, t, ts(at)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: greedy earliest-after-previous semantics") {
    val events = ev(
      // u1: full conversion in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // u2: click BEFORE the first view, then another click after — the
      // greedy scan must use the later click (min(ts>s1), not min(ts)>s1)
      (2L, "click", "2024-01-02 09:00:00"),
      (2L, "view", "2024-01-02 10:00:00"),
      (2L, "click", "2024-01-02 11:00:00"),
      // u3: view only
      (3L, "view", "2024-01-03 10:00:00"),
      // u4: purchase BEFORE the click stage is reached — no stage-3 credit
      (4L, "view", "2024-01-04 10:00:00"),
      (4L, "purchase", "2024-01-04 10:30:00"),
      (4L, "click", "2024-01-04 11:00:00"),
      // u5: no view at all — contributes to no stage
      (5L, "click", "2024-01-05 10:00:00"),
      (5L, "purchase", "2024-01-05 11:00:00"))
    val out = Behavior.funnel(events).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "view", 4L), (2L, "click", 3L), (3L, "purchase", 1L)))
    // conv is relative to stage 1
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 0.75, 0.25))
  }

  test("funnel: equal timestamps do not advance (strictly-after matching)") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"), // same instant: not after view
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:00:01"))
    val n = Behavior.funnel(events).collect().map(r => r.getLong(2)).toSeq
    assert(n == Seq(2L, 1L, 0L))
  }

  test("funnel: k=2 and k=5 step lists (VERDICT r14 item 5)") {
    val events = ev(
      // u1 walks all five stages in order
      (1L, "a", "2024-01-01 10:00:00"),
      (1L, "b", "2024-01-01 11:00:00"),
      (1L, "c", "2024-01-01 12:00:00"),
      (1L, "d", "2024-01-01 13:00:00"),
      (1L, "e", "2024-01-01 14:00:00"),
      // u2 stalls at stage 3: its d precedes its c, so stage 4 can't match
      (2L, "a", "2024-01-02 10:00:00"),
      (2L, "b", "2024-01-02 11:00:00"),
      (2L, "d", "2024-01-02 11:30:00"),
      (2L, "c", "2024-01-02 12:00:00"),
      // u3 reaches stage 2 only
      (3L, "a", "2024-01-03 10:00:00"),
      (3L, "b", "2024-01-03 11:00:00"))
    val k5 = Behavior.funnel(events, Seq("a", "b", "c", "d", "e")).collect()
    assert(k5.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 2L), (4L, "d", 1L), (5L, "e", 1L)))
    val k2 = Behavior.funnel(events, Seq("a", "b")).collect()
    assert(k2.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "a", 3L), (2L, "b", 3L)))
    // the 3-step default is the same operator at k=3 (gate form unchanged)
    val k3 = Behavior.funnel(events, Seq("a", "b", "c")).collect()
    assert(k3.map(_.getLong(2)).toSeq == Seq(3L, 3L, 2L))
    // step names with quotes survive the stack() literal escaping
    val quoted = Behavior.funnel(
      events.withColumn("event_type",
        when(col("event_type") === "a", lit("o'view")).otherwise(col("event_type"))),
      Seq("o'view", "b")).collect()
    assert(quoted.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("o'view", 3L), ("b", 3L)))
  }

  test("funnel: stage counts are monotone non-increasing on real data") {
    val out = Behavior.funnelGate(spark, Sf0001).collect()
    val ns = out.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(ns.length == 3 && ns(0) >= ns(1) && ns(1) >= ns(2) && ns(0) > 0)
  }

  test("funnel and retention are partitioning-independent") {
    val e = Tables.events(spark, Sf0001)
    val f1 = Behavior.funnel(e).collect()
    val f2 = Behavior.funnel(e.repartition(7, col("event_id"))).collect()
    assert(f1.sameElements(f2))
    val r1 = Behavior.retention(e).collect()
    val r2 = Behavior.retention(e.repartition(7, col("event_id"))).collect()
    assert(r1.sameElements(r2))
  }

  test("retention: cohort and offsets on a hand corpus") {
    val events = ev(
      // u1 first seen week of 2024-01-01 (Mon), active weeks 0 and 2
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "click", "2024-01-16 10:00:00"),
      // u2 same cohort, week 0 only (two events, one distinct week)
      (2L, "view", "2024-01-03 10:00:00"),
      (2L, "view", "2024-01-04 10:00:00"),
      // u3 cohort of 2024-01-08, active weeks 0 and 1
      (3L, "view", "2024-01-08 10:00:00"),
      (3L, "view", "2024-01-15 10:00:00"))
    val out = Behavior.retention(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }

  test("retention: offset-0 cell equals cohort size; users counted once per week") {
    val e = Tables.events(spark, Sf0001)
    val out = Behavior.retention(e)
    // every user's cohort week is an active week, so sum over offset-0
    // cells = number of distinct users
    val zero = out.filter(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    val users = e.select(countDistinct("user_id")).as[Long].head()
    assert(zero == users)
    // no cell can exceed its cohort's size (the offset-0 cell)
    val c0 = out.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("c0"))
    assert(out.join(c0, "cohort_week").filter(col("n_users") > col("c0")).count() == 0)
  }
}
