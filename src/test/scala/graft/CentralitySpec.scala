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
