package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

class SubstringDedupSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val L = 3

  private def spans(docs: org.apache.spark.sql.DataFrame) =
    SubstringDedup.repeatedSpans(docs, "text", "doc_id", L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect()

  test("cross-document repeated span is cut from both docs; unique docs untouched") {
    val docs = Seq(
      (0L, "aa bb cc dd ee"),       // shares "bb cc dd" with doc 1
      (1L, "xx bb cc dd yy"),
      (2L, "pp qq rr ss tt")        // fully unique
    ).toDF("doc_id", "text")
    val r = spans(docs)
    // doc 0: gram "bb cc dd" (pos 1) duplicated -> tokens 1..3 covered
    assert(r(0) == ((0L, 5L, 1L, 3L, 0.6, "aa ee")))
    assert(r(1) == ((1L, 5L, 1L, 3L, 0.6, "xx yy")))
    assert(r(2) == ((2L, 5L, 0L, 0L, 0.0, "pp qq rr ss tt")))
  }

  test("within-document repetition counts as duplication") {
    val docs = Seq((0L, "aa bb cc aa bb cc")).toDF("doc_id", "text")
    val r = spans(docs)
    // "aa bb cc" occurs at pos 0 and 3 (plus overlapping grams "bb cc aa",
    // "cc aa bb" occur once each) -> both occurrences marked, full coverage
    assert(r(0)._3 == 2L)
    assert(r(0)._4 == 6L && r(0)._5 == 1.0 && r(0)._6 == "")
  }

  test("overlapping duplicated spans merge in coverage (no double counting)") {
    val docs = Seq(
      (0L, "aa bb cc dd ee ff"),    // "aa bb cc" and "cc dd ee" both duplicated
      (1L, "aa bb cc zz"),
      (2L, "yy cc dd ee ww")
    ).toDF("doc_id", "text")
    val r = spans(docs)
    // doc 0: starts 0 and 2 -> covers 0..4 = 5 tokens of 6
    assert(r(0)._3 == 2L && r(0)._4 == 5L && r(0)._6 == "ff")
  }

  test("docs shorter than L produce no grams and are never marked") {
    val docs = Seq((0L, "aa bb"), (1L, "aa bb")).toDF("doc_id", "text")
    val r = spans(docs)
    assert(r.forall(t => t._3 == 0L && t._5 == 0.0))
  }

  test("hash-agnostic: xxhash64 production path equals the h60 gate path") {
    val docs = Tables.documents(spark, Sf0001).filter($"doc_id" < 200)
    val x = SubstringDedup.repeatedSpans(docs, "text", "doc_id", 5).orderBy("doc_id").collect()
    val h = SubstringDedup.repeatedSpans(docs, "text", "doc_id", 5,
      graft.functions.Hashing.h60).orderBy("doc_id").collect()
    assert(x.sameElements(h))
  }

  test("partitioning-independent") {
    val docs = Tables.documents(spark, Sf0001).filter($"doc_id" < 200)
    val a = SubstringDedup.repeatedSpans(docs, "text", "doc_id", 5).orderBy("doc_id").collect()
    val b = SubstringDedup.repeatedSpans(docs.repartition(7), "text", "doc_id", 5)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("raw gram stream never shuffles at gate scale: one partial-agg gh exchange only") {
    val df = SubstringDedup.repeatedSpansGate(spark, Sf0001)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val plan = { val c = s.indexOf("== Initial Plan =="); if (c >= 0) s.substring(0, c) else s }
    // exactly one hash exchange on the gram hash — the duplicate-count
    // aggregate's, fed by a map-side partial (compressed, not raw grams)
    assert("hashpartitioning\\(gh".r.findAllIn(plan).length == 1,
      s"expected ONE gh exchange:\n${plan.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")}")
    assert(plan.contains("partial_count"),
      "duplicate-count aggregate lost its map-side partial")
    // occurrence semi-join runs broadcast at this scale — the raw stream
    // is never shuffled for it
    assert(plan.contains("LeftSemi"), "semi-join shape lost")
    assert(!plan.contains("SortMergeJoin [gh"),
      "occurrence join shuffled the raw gram stream at broadcast scale")
  }

  test("contaminationSpans: bench-overlapping spans are cut, clean docs untouched") {
    import graft.operators.Prep
    val bench = Seq((0L, "secret eval answer")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "aa bb secret eval answer cc"),   // contains the bench 3-gram at pos 2
      (11L, "xx yy zz ww vv")                 // clean
    ).toDF("doc_id", "text")
    val r = SubstringDedup.contaminationSpans(train,
        Prep.benchShingleHashes(bench, 3), "text", "doc_id", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect()
    assert(r(0) == ((10L, 6L, 1L, 3L, 0.5, "aa bb cc")))
    assert(r(1) == ((11L, 5L, 0L, 0L, 0.0, "xx yy zz ww vv")))
  }

  test("contaminationSpans gate: train slice excludes bench docs; ratios well-formed") {
    val df = SubstringDedup.contaminationSpansGate(spark, Sf0001)
    val rows = df.as[(Long, Long, Long, Long, Double, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 % 10 != 0), "bench docs must not appear in the report")
    rows.foreach { case (_, n, spans, cov, ratio, cleaned) =>
      assert(cov <= n && ratio >= 0.0 && ratio <= 1.0)
      if (spans == 0) assert(cov == 0 && ratio == 0.0)
      if (cov == n) assert(cleaned.isEmpty)
    }
    // the synthetic corpus shares grams across the split: contamination fires
    assert(rows.exists(_._3 > 0))
  }
}
