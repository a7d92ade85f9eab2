package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Upsert semantics — the reference's ON CONFLICT last-write-wins
  * (`services/dataIngestion.js:35-36`) as set-oriented merge. */
class MergeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def existing = Seq(
    (1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L)
  ).toDF("id", "payload", "v")

  private def incoming = Seq(
    (2L, "b2", 1L),      // update
    (4L, "d", 1L),       // insert
    (4L, "d2", 2L)       // within-batch dup: higher version wins
  ).toDF("id", "payload", "v")

  test("upsert replaces on conflict, appends new keys") {
    val out = Merge.upsert(existing, incoming, Seq("id"), "v")
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "a", 0L), (2L, "b2", 1L), (3L, "c", 0L), (4L, "d2", 2L)))
  }

  test("within-batch dedup keeps the highest version (last-write-wins)") {
    val d = Merge.latestPerKey(incoming, Seq("id"), "v")
      .orderBy("id").as[(Long, String, Long)].collect()
    assert(d.toSeq == Seq((2L, "b2", 1L), (4L, "d2", 2L)))
  }

  test("upsert is idempotent: applying the same batch twice == once") {
    val once = Merge.upsert(existing, incoming, Seq("id"), "v")
    val twice = Merge.upsert(once, incoming, Seq("id"), "v")
    val a = once.orderBy("id").collect().toSeq
    val b = twice.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("empty incoming batch is a no-op") {
    val out = Merge.upsert(existing, incoming.limit(0), Seq("id"), "v")
    assert(out.orderBy("id").collect().toSeq == existing.orderBy("id").collect().toSeq)
  }

  test("composite keys merge on the full key") {
    val ex = Seq((1L, 10L, "x", 0L), (1L, 11L, "y", 0L)).toDF("tenant", "key", "p", "v")
    val in = Seq((1L, 10L, "x2", 1L), (2L, 10L, "z", 1L)).toDF("tenant", "key", "p", "v")
    val out = Merge.upsert(ex, in, Seq("tenant", "key"), "v")
      .orderBy("tenant", "key").as[(Long, Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, 10L, "x2", 1L), (1L, 11L, "y", 0L), (2L, 10L, "z", 1L)))
  }
}
