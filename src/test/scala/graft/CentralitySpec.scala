package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Centrality

class CentralitySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // 1→2, 1→3, 2→3; node 3 dangling (no out-edges), node 4 isolated
  private def nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")

  test("one iteration matches the hand-computed integer update (scale 1000)") {
    // N=4, init 250, base = 15*1000/(100*4) = 37 (floor)
    // shares: 1→{2,3} at 250 div 2 = 125; 2→3 at 250
    // dangling = rank(3)+rank(4) = 500; dang div N = 125
    // rank = 37 + (85*(insum+125)) div 100
    val r = Centrality.pageRank(nodes, edges, iterations = 1, scale = 1000L)
      .orderBy("id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ===
      Seq((1L, 143L), (2L, 249L), (3L, 462L), (4L, 143L)))
    // the double column is exactly micro × the same constant
    assert(r.map(_.getDouble(2)).toSeq ===
      Seq(143L, 249L, 462L, 143L).map(_.toDouble * (1.0 / 1000L)))
  }

  test("mass is conserved up to bounded floor leak, every iteration count") {
    for (k <- 1 to 4) {
      val tot = Centrality.pageRank(nodes, edges, iterations = k, scale = 1000000L)
        .agg(sum("rank_micro")).head().getLong(0)
      assert(tot <= 1000000L, s"iter $k total $tot exceeds scale")
      assert(tot > 900000L, s"iter $k leaked too much: $tot")
    }
  }

  test("sink accumulates, sources drain, isolated node gets only base+dangling share") {
    val r = Centrality.pageRank(nodes, edges, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(3L) > r(2L) && r(2L) > r(1L)) // 3 receives from both, 2 from one
    assert(r(1L) === r(4L)) // no in-links vs isolated: identical update
  }

  test("integer arithmetic is partitioning-independent (bitwise)") {
    val a = Centrality.pageRank(nodes.repartition(5), edges.repartition(3),
      iterations = 3).orderBy("id").collect().toSeq
    val b = Centrality.pageRank(nodes, edges, iterations = 3)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("personalized: hand-computed seed-teleport updates (seed {1}, scale 1000)") {
    // iter1: 1 shares 500 to {2,3}; dangling 0; seed base 150
    //   → (150, 425, 425, 0)
    // iter2: shares 75/75 from 1, 425 from 2; dangling rank(3)=425
    //   teleports to the seed → 1 gets 150 + 361; 4 stays 0
    def ppr(k: Int) = Centrality.personalizedPageRank(nodes, edges,
        seeds = spark.createDataFrame(Seq(Tuple1(1L))).toDF("id"),
        iterations = k, scale = 1000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ppr(1) === Seq((1L, 150L), (2L, 425L), (3L, 425L), (4L, 0L)))
    assert(ppr(2) === Seq((1L, 511L), (2L, 63L), (3L, 425L), (4L, 0L)))
  }

  test("personalized: nodes unreachable from the seeds rank exactly 0; bitwise under repartition") {
    val s = spark.createDataFrame(Seq(Tuple1(1L))).toDF("id")
    val a = Centrality.personalizedPageRank(nodes.repartition(5),
      edges.repartition(3), s, iterations = 3).orderBy("id").collect().toSeq
    val b = Centrality.personalizedPageRank(nodes, edges, s, iterations = 3)
      .orderBy("id").collect().toSeq
    assert(a === b)
    assert(b.find(_.getLong(0) == 4L).get.getLong(1) === 0L) // isolated, non-seed
    // all mass stays within the seed-reachable set (conservation w/ leak)
    assert(b.map(_.getLong(1)).sum <= 1000000000L)
  }

  test("gate fixture: one row per doc, ordered by rank desc, ranks vary") {
    val dir = "/root/testdata/sf0.001"
    val n = graft.Tables.documents(spark, dir).count()
    val rows = Centrality.docPageRank(spark, dir).collect()
    assert(rows.length.toLong === n)
    assert(rows.map(_.getLong(1)).distinct.length > 5)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y })
  }
}
