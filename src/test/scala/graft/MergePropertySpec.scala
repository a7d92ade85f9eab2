package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Merge

case class Row3(k: Long, v: Double, ver: Long)

/** Property-based merge laws (SURVEY.md §5.4): randomized tables/batches,
  * scalacheck driven directly (no scalatest bridge in the offline cache).
  */
class MergePropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rowGen: Gen[Row3] = for {
    k <- Gen.choose(0L, 15L)       // small key space forces collisions
    v <- Gen.choose(-100.0, 100.0)
    ver <- Gen.choose(0L, 5L)
  } yield Row3(k, v, ver)

  private val batchGen: Gen[List[Row3]] = Gen.listOfN(30, rowGen)

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    // (key, version) pairs identify the surviving row deterministically
    df.select("k", "ver").as[(Long, Long)].collect().toSet

  test("upsert is idempotent: upsert(upsert(t,b),b) == upsert(t,b)") {
    check(Prop.forAll(batchGen, batchGen) { (t: List[Row3], b: List[Row3]) =>
      // target must be key-unique (it models a table with the ON CONFLICT
      // constraint); batches may carry duplicates
      val target = Merge.latestPerKey(t.toDF(), Seq("k"), "ver")
      val batch = b.toDF()
      val once = Merge.upsert(target, batch, Seq("k"), "ver")
      val twice = Merge.upsert(once, batch, Seq("k"), "ver")
      canon(once) == canon(twice)
    })
  }

  test("upsert result is key-unique and covers target ∪ batch keys") {
    check(Prop.forAll(batchGen, batchGen) { (t: List[Row3], b: List[Row3]) =>
      val target = Merge.latestPerKey(t.toDF(), Seq("k"), "ver")
      val merged = Merge.upsert(target, b.toDF(), Seq("k"), "ver")
        .select("k", "ver").as[(Long, Long)].collect()
      val keys = merged.map(_._1)
      keys.length == keys.distinct.length &&
        keys.toSet == (t.map(_.k).toSet ++ b.map(_.k).toSet)
    })
  }

  test("batch rows win over target rows for their keys (last-write-wins)") {
    check(Prop.forAll(batchGen, batchGen) { (t: List[Row3], b: List[Row3]) =>
      val target = Merge.latestPerKey(t.toDF(), Seq("k"), "ver")
      val merged = Merge.upsert(target, b.toDF(), Seq("k"), "ver")
        .select("k", "ver").as[(Long, Long)].collect().toMap
      val expectedBatchWinners = b.groupBy(_.k).view.mapValues(_.map(_.ver).max)
      expectedBatchWinners.forall { case (k, maxVer) => merged(k) == maxVer }
    })
  }
}
