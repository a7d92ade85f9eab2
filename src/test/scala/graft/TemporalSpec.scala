package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofJoin attaches the latest right value at-or-before each left ts") {
    val clicks = Seq(
      (100L, 1L, t("2024-01-01 09:00:00")), // before any purchase -> null
      (101L, 1L, t("2024-01-01 11:00:00")), // after p1 -> 10.0
      (102L, 1L, t("2024-01-01 13:00:00")), // after p2 -> 20.0
      (103L, 2L, t("2024-01-01 12:00:00"))  // user 2, exact-ts purchase -> 99.0
    ).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, 1L, t("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, t("2024-01-01 12:00:00"), 20.0),
      (3L, 2L, t("2024-01-01 12:00:00"), 99.0)
    ).toDF("event_id", "user_id", "ts", "value")
      .select("user_id", "ts", "value", "event_id")
    val out = Temporal.asofJoin(clicks, purchases, "user_id", "ts", "ts", "value", "event_id")
      .orderBy("event_id")
      .select("event_id", "asof_value").as[(Long, Option[Double])].collect()
    assert(out.toSeq == Seq(
      (100L, None), (101L, Some(10.0)), (102L, Some(20.0)), (103L, Some(99.0))))
  }

  test("asofJoin right-side ts ties resolve by the tie-break column") {
    val clicks = Seq((1L, 7L, t("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (10L, 7L, t("2024-01-01 09:00:00"), 1.0),
      (11L, 7L, t("2024-01-01 09:00:00"), 2.0) // higher event_id wins
    ).toDF("event_id", "user_id", "ts", "value")
      .select("user_id", "ts", "value", "event_id")
    val out = Temporal.asofJoin(clicks, purchases, "user_id", "ts", "ts", "value", "event_id")
      .select("asof_value").as[Double].head()
    assert(out == 2.0)
  }

  test("rangeJoin matches rows into [start, end) intervals per key") {
    val points = Seq((1L, 5L), (1L, 10L), (2L, 7L)).toDF("k", "x")
    val intervals = Seq((1L, 0L, 6L, "a"), (1L, 6L, 20L, "b"), (2L, 0L, 5L, "c"))
      .toDF("k", "s", "e", "tag")
    val out = Temporal.rangeJoin(points, intervals, "k", "x", "s", "e")
      .select("x", "tag").as[(Long, String)].collect().toSet
    assert(out == Set((5L, "a"), (10L, "b"))) // x=7 for k=2 has no interval
  }
}
