package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.ThetaSketch
import graft.operators.ThetaSketch.{ThetaBuf, ThetaRes, ThetaSketchAgg}

/** Laws for the KMV theta sketch: partitioning invariance (any merge tree
  * yields the identical sketch), exactness below k, the documented error
  * bound in the estimation regime, and intersection/union accuracy — plus
  * the end-to-end Spark aggregate against exact distincts.
  */
class ThetaSketchSpec extends AnyFunSuite with SparkSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  private def build(agg: ThetaSketchAgg, parts: Seq[Seq[Long]]): ThetaRes = {
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(if (bufs.isEmpty) agg.zero else bufs.reduce(agg.merge))
  }

  /** Mirrors ThetaSketch.estimate for a local ThetaRes. */
  private def est(r: ThetaRes): Double = {
    val below = r.ks.count(_ < r.theta_t).toDouble
    below / ((r.theta_t.toDouble + 9.223372036854776e18) / 1.8446744073709552e19)
  }

  private def hash(x: Long): Long = // splitmix64 — decorrelates dense ids
    { var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31) }

  test("any partitioning / merge order yields the identical sketch") {
    val valuesGen = for {
      n <- Gen.choose(0, 300)
      vs <- Gen.listOfN(n, Gen.choose(-500L, 500L))
    } yield vs.map(hash)
    val cutGen = Gen.choose(0, 300)
    check(Prop.forAll(valuesGen, cutGen, cutGen) { (vs, c1, c2) =>
      val agg = new ThetaSketchAgg(32)
      val whole = build(agg, Seq(vs))
      val (a, rest) = vs.splitAt(c1 % (vs.size + 1))
      val (b, c) = rest.splitAt(c2 % (rest.size + 1))
      val split = build(agg, Seq(a, b, c))
      val rev = build(agg, Seq(c, b, a))
      whole.theta_t == split.theta_t && whole.ks.sameElements(split.ks) &&
        whole.theta_t == rev.theta_t && whole.ks.sameElements(rev.ks)
    })
  }

  test("exact regime: n distinct <= k gives the exact count (theta stays 1)") {
    val agg = new ThetaSketchAgg(64)
    val r = build(agg, Seq((1L to 60L).map(hash) ++ (1L to 60L).map(hash)))
    assert(r.theta_t == Long.MaxValue)
    assert(est(r) == 60.0)
  }

  test("estimation regime: 50k distinct at k=1024 within 5 standard errors") {
    val agg = new ThetaSketchAgg(1024)
    val n = 50000
    val r = build(agg, (0 until 10).map(p => (p * n / 10) until ((p + 1) * n / 10))
      .map(_.map(i => hash(i.toLong))))
    val rse = 1.0 / math.sqrt(1024 - 2)
    assert(math.abs(est(r) - n) / n <= 5 * rse,
      s"estimate ${est(r)} vs $n (rse bound ${5 * rse})")
  }

  test("intersection and union estimates within 5 relative standard errors") {
    // A = [0, 30k), B = [20k, 50k): |A∩B| = 10k, |A∪B| = 50k
    val agg = new ThetaSketchAgg(1024)
    val a = build(agg, Seq((0L until 30000L).map(hash)))
    val b = build(agg, Seq((20000L until 50000L).map(hash)))
    // evaluate the column-level estimators over the two local sketches
    import spark.implicits._
    val skDf = Seq((a, b)).toDF("sa", "sb")
      .select(ThetaSketch.intersectionEstimate(col("sa"), col("sb")).as("inter"),
        ThetaSketch.unionEstimate(col("sa"), col("sb")).as("uni"),
        ThetaSketch.estimate(col("sa")).as("ea"))
    val row = skDf.head()
    val rse = 1.0 / math.sqrt(1024 - 2)
    assert(math.abs(row.getDouble(0) - 10000) / 10000 <= 8 * rse, s"inter=${row.getDouble(0)}")
    assert(math.abs(row.getDouble(1) - 50000) / 50000 <= 5 * rse, s"union=${row.getDouble(1)}")
    assert(math.abs(row.getDouble(2) - 30000) / 30000 <= 5 * rse, s"estA=${row.getDouble(2)}")
  }

  test("custkeys_intersect_theta end-to-end: bound holds and exact side matches") {
    val out = SparkEntry.queries("custkeys_intersect_theta")(spark, Sf0001).head()
    assert(out.getAs[Boolean]("theta_within_25pct"))
    assert(out.getAs[Long]("n_intersect") ==
      SparkEntry.queries("custkeys_intersect")(spark, Sf0001).count())
  }
}
