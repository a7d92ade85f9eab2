package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

/** PLANS.md's audit, enforced: the plan-shape invariants the 100 TB
  * posture rests on are asserted mechanically against the EXECUTED
  * (post-AQE) plans at sf0.001, so a regression in pushdown, broadcast
  * choice, exchange count, or stage reuse fails the build instead of
  * silently surviving until a bench run. String-matching executed plans is
  * version-coupled by nature — these pins are for THIS build's Spark
  * (4.1.2); a Spark upgrade that changes node names should update them
  * consciously.
  */
class PlanInvariantsSpec extends AnyFunSuite with SparkSuite {

  private def executed(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, Sf0001)
    df.collect()
    // AdaptiveSparkPlan's toString prints the final plan FOLLOWED by the
    // initial one — keep only the final section or every count doubles
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("orders_by_date_range: both range bounds are PUSHED to the parquet scan") {
    // toString truncates FileScan metadata — formatted explain carries the
    // full PushedFilters list
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out)) {
      SparkEntry.queries("orders_by_date_range")(spark, Sf0001).explain("formatted")
    }
    val plan = out.toString
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") &&
      plan.contains("LessThanOrEqual(o_orderdate"),
      s"date bounds not pushed:\n${plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")}")
  }

  test("minhash_dedup_keep: the election's two branches share ONE exchange (stage reuse)") {
    val plan = executed("minhash_dedup_keep")
    assert(plan.contains("ReusedExchange"),
      "no ReusedExchange — the signature subtree is being computed twice")
  }

  test("source_overlap: the vocab diamond shares ONE corpus scan (stage reuse)") {
    val plan = executed("source_overlap")
    assert("ReusedExchange".r.findAllIn(plan).length >= 3,
      "vocab exchange not shared — intersection/size branches re-scan the corpus")
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      s"expected ONE documents scan:\n${plan.linesIterator.filter(_.contains("FileScan")).mkString("\n")}")
  }

  test("embedding_dispersion / semantic_dedup_keep: anchors broadcast, no shuffle join") {
    for (q <- Seq("embedding_dispersion", "semantic_dedup_keep")) {
      val plan = executed(q)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
        s"$q: anchor join did not broadcast")
      assert(!plan.contains("SortMergeJoin"),
        s"$q: anchor join fell back to a shuffle join")
    }
  }

  test("dsir_weights: scoring pass is narrow — no exchange above the scan but the gate sort") {
    val plan = executed("dsir_weights")
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    // the range partitioner for the pre-sorted scan is the only exchange;
    // the ratio map rides as a literal, so scoring never shuffles
    assert(exchanges <= 1, s"narrow scoring pass grew $exchanges exchanges:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("customer_region: dimension joins broadcast (no shuffle of the fact side)") {
    val plan = executed("customer_region")
    assert(plan.contains("BroadcastHashJoin"), "dim join did not broadcast")
    assert(!plan.contains("SortMergeJoin"), "dim join fell back to a shuffle join")
  }

  test("lineitem_bloom_join: the membership filter sits BELOW the exact join") {
    val plan = executed("lineitem_bloom_join")
    val probeIdx = plan.indexOf("graft_bloom_might_contain")
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    assert(probeIdx >= 0, "bloom membership filter missing from the plan")
    assert(joinIdx >= 0 && joinIdx < probeIdx,
      "bloom filter is not below the join (probe rows reach the join unpruned)")
  }

  test("pii_scrub: narrow pipeline — no data exchange except the gate sort") {
    val plan = executed("pii_scrub")
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    assert(exchanges <= 1, s"narrow query grew $exchanges exchanges:\n" +
      plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("sample_weighted: bounded TakeOrdered below the rank window, pruned scan") {
    val plan = executed("sample_weighted")
    val takeIdx = plan.indexOf("TakeOrderedAndProject")
    assert(takeIdx >= 0, "no TakeOrderedAndProject — the race would sort the corpus")
    val windowIdx = plan.indexOf("Window")
    assert(windowIdx >= 0 && windowIdx < takeIdx,
      "rank window not ABOVE the bounded top-n (it would window the corpus)")
    // column pruning: the scan must not read the full document row
    val out = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(out)) {
      SparkEntry.queries("sample_weighted")(spark, Sf0001).explain("formatted")
    }
    val read = out.toString.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("text") && read.contains("source")
      && !read.contains("lang"), s"scan not pruned to the 3 needed columns: $read")
  }

  test("token_freq_sketch: partial Misra-Gries buffers combine BELOW the exchange") {
    val plan = executed("token_freq_sketch")
    val partialIdx = plan.indexOf("partial_misragries")
    assert(partialIdx >= 0, "no map-side partial sketch aggregation")
    val exchangeIdx = plan.indexOf("Exchange", 0)
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "partial aggregate not below the exchange (token rows would shuffle)")
  }
}
