package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Evolution

class EvolutionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("snapshotDiff classifies all four statuses on a hand corpus") {
    val old = Seq(
      (1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"))
      .toDF("doc_id", "fp", "source")
    val nw = Seq(
      (1L, "a", "s1"),      // unchanged
      (2L, "B", "s1"),      // changed
      (4L, "d", "s2"))      // added; 3 removed
      .toDF("doc_id", "fp", "source")
    val out = Evolution.snapshotDiff(old, nw).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("s1", "changed", 1L), ("s1", "unchanged", 1L),
      ("s2", "added", 1L), ("s2", "removed", 1L)))
  }

  test("corpusDiff counts match the fixture derivation exactly") {
    val docs = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"))
    val expRemoved = docs.filter(col("doc_id") % 7 === 0)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val expAdded = docs.filter(col("doc_id") % 11 === 0)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val expChanged = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 === 0)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val expUnchanged = docs.filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 5 =!= 0)
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val got = Evolution.corpusDiff(spark, Sf0001).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    def cell(st: String, m: Map[String, Long]) =
      m.foreach { case (src, n) => assert(got.getOrElse((src, st), 0L) == n,
        s"$st/$src: expected $n got ${got.get((src, st))}") }
    cell("removed", expRemoved)
    cell("added", expAdded)
    cell("changed", expChanged)
    cell("unchanged", expUnchanged)
    // and nothing else
    assert(got.values.sum ==
      expRemoved.values.sum + expAdded.values.sum +
        expChanged.values.sum + expUnchanged.values.sum)
  }

  test("corpusDiff is partitioning-independent and deterministic") {
    val a = Evolution.corpusDiff(spark, Sf0001).collect()
    val b = Evolution.corpusDiff(spark, Sf0001).collect()
    assert(a.sameElements(b))
  }
}
