package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.Components

/** Laws for the large-star/small-star connected components: agreement with
  * a driver-side union-find on random graphs (any shape — chains, cliques,
  * singleton-heavy), the non-root-only output contract, and input-order /
  * partitioning invariance. */
class ComponentsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Reference union-find: component = min node id. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("components agree with union-find on random graphs; only non-roots emitted") {
    val edgesGen = for {
      n <- Gen.choose(0, 60)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    } yield es
    check(Prop.forAll(edgesGen) { es =>
      val expected = unionFind(es.filter(e => e._1 != e._2))
        .filter { case (k, v) => k != v } // non-roots only
      val got = Components.connectedComponents(
          es.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      got == expected
    })
  }

  test("shareExchange=false agrees with the shared-exchange default") {
    val es = Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L), (9L, 7L), (5L, 1L))
    val shared = Components.connectedComponents(es.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val unshared = Components.connectedComponents(es.toDF("a", "b"), "a", "b",
        shareExchange = false)
      .as[(Long, Long)].collect().toMap
    assert(shared == unshared)
  }

  test("chain + clique + singleton: labels and roots are exact") {
    // chain 1-2-3-4, clique {10,11,12}, singleton 20
    val pairs = Seq((2L, 1L), (3L, 2L), (4L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("doc_id")
    val out = Components.componentLabels(nodes, "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("round count tracks diameter, not volume: a clique converges fast") {
    // near-clique (the dedup-graph shape): 40 nodes all paired to node 0
    // plus ring edges — converges in a couple of star rounds regardless of
    // how many members the clique has
    val clique = (1L to 40L).map(i => (0L, i)) ++ (1L until 40L).map(i => (i, i + 1))
    val (cc, rounds) =
      Components.connectedComponentsWithRounds(clique.toDF("a", "b"), "a", "b")
    cc.collect()
    assert(rounds <= 4, s"clique took $rounds rounds")
  }

  test("result is invariant under edge order and direction flips") {
    val base = Seq((1L, 5L), (5L, 9L), (9L, 13L), (2L, 4L))
    val flipped = base.map { case (a, b) => (b, a) }.reverse
    val r1 = Components.connectedComponents(base.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val r2 = Components.connectedComponents(flipped.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(r1 == r2 && r1 == Map(5L -> 1L, 9L -> 1L, 13L -> 1L, 4L -> 2L))
  }
}
