package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Profile
import graft.operators.Profile.{NumCol, StrCol, TsCol}

class ProfileSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    (Some(1L), Some(2.0), Some("b"), Some("2024-01-02 10:00:00")),
    (Some(2L), Some(2.0), Some("a"), Some("2024-01-01 09:00:00")),
    (Some(2L), None, None, None),
    (None, Some(4.5), Some("c"), Some("2024-01-03 23:59:59")))
  private def df = rows
    .toDF("k", "v", "s", "ts_s")
    .withColumn("ts", to_timestamp(col("ts_s")))
    .drop("ts_s")

  test("profile computes exact per-column stats on a hand-checked frame") {
    val out = Profile.profile(df,
        Seq("k" -> NumCol, "v" -> NumCol, "s" -> StrCol, "ts" -> TsCol))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = out("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1 && k.getLong(3) == 2)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 2.0)
    assert(k.getDouble(6) == math.rint(5.0 / 3.0 * 1e4) / 1e4) // mean over non-null
    val v = out("v")
    assert(v.getLong(2) == 1 && v.getLong(3) == 2)
    assert(v.getDouble(4) == 2.0 && v.getDouble(5) == 4.5)
    assert(v.getDouble(6) == math.rint((2.0 + 2.0 + 4.5) / 3.0 * 1e4) / 1e4)
    val s = out("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 3)
    assert(s.isNullAt(4) && s.isNullAt(6))
    assert(s.getString(7) == "a" && s.getString(8) == "c")
    val ts = out("ts")
    assert(ts.getString(7) == "2024-01-01 09:00:00")
    assert(ts.getString(8) == "2024-01-03 23:59:59")
  }

  test("profile output is one row per column, sorted by name") {
    val out = Profile.profile(df, Seq("v" -> NumCol, "k" -> NumCol))
      .select("col_name").as[String].collect().toSeq
    assert(out == Seq("k", "v"))
  }

  test("profileApprox matches exact profile on everything but n_distinct, which stays in the HLL bound") {
    val docs = Tables.documents(spark, Sf0001)
    val cols = Seq("doc_id" -> NumCol, "lang" -> StrCol, "source" -> StrCol,
      "n_chars" -> NumCol)
    val exact = Profile.profile(docs, cols).collect()
    val approx = Profile.profileApprox(docs, cols).collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      // HLL++ default rsd 0.05 — assert a generous 3-sigma-ish bound
      val (ed, ad) = (e.getLong(3).toDouble, a.getLong(3).toDouble)
      assert(math.abs(ad - ed) / ed <= 0.15, s"${e.getString(0)}: $ad vs $ed")
      Seq(4, 5, 6, 7, 8).foreach { i =>
        assert(e.isNullAt(i) == a.isNullAt(i))
        if (!e.isNullAt(i)) assert(e.get(i) == a.get(i))
      }
    }
  }

  test("profileApprox plans without an Expand; exact form carries one") {
    val cols = Seq("k" -> NumCol, "v" -> NumCol)
    val exactPlan = Profile.profile(df, cols).queryExecution.executedPlan.toString
    val approxPlan = Profile.profileApprox(df, cols).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"))
  }

  test("profile is partitioning-independent") {
    val cols = Seq("k" -> NumCol, "s" -> StrCol)
    val a = Profile.profile(df.repartition(7), cols).collect().toSeq
    val b = Profile.profile(df.coalesce(1), cols).collect().toSeq
    assert(a == b)
  }

  test("histogram: zero-filled grid, counts sum to non-null n, edge buckets") {
    val K = 4
    val h = Profile.histogram(df, Seq("k", "v"), K).collect().toSeq
    assert(h.size == 2 * K, "one row per (col, bucket), zero-filled")
    // per-column counts sum to the non-null count
    val sums = h.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(4)).sum)
    assert(sums("k") == 3L && sums("v") == 3L)
    // k in {1, 2, 2}: min=1 max=2 -> value at min lands in bucket 0, at
    // max in bucket K-1 (the least() clamp)
    val kRows = h.filter(_.getString(0) == "k").map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(kRows(0L) == 1L && kRows(K - 1L) == 2L)
    // bounds tile [min, max]: first lo == min, last hi == max
    val kB = h.filter(_.getString(0) == "k").sortBy(_.getLong(1))
    assert(kB.head.getDouble(2) == 1.0 && kB.last.getDouble(3) == 2.0)
  }

  test("histogram: constant and all-null columns degrade safely") {
    val d = Seq((1L, Option.empty[Double]), (1L, None), (1L, None))
      .toDF("c", "nn")
    val h = Profile.histogram(d, Seq("c", "nn"), 4).collect().toSeq
    val cRows = h.filter(_.getString(0) == "c")
    // constant column: all mass in bucket 0, zero elsewhere
    assert(cRows.find(_.getLong(1) == 0L).get.getLong(4) == 3L)
    assert(cRows.filter(_.getLong(1) > 0L).forall(_.getLong(4) == 0L))
    // all-null column: full zero-filled grid with null bounds
    val nRows = h.filter(_.getString(0) == "nn")
    assert(nRows.size == 4 && nRows.forall(r => r.getLong(4) == 0L && r.isNullAt(2)))
  }

  test("histogram is partitioning-independent and mergeable under a fixed grid") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Profile.histogram(docs.repartition(7), Seq("doc_id", "n_chars")).collect().toSeq
    val b = Profile.histogram(docs.coalesce(1), Seq("doc_id", "n_chars")).collect().toSeq
    assert(a == b)
    // additivity on a shared grid: a disjoint split's bucket counts sum to
    // the whole corpus's (min/max of the split halves span the same grid
    // here because both halves contain the extremes' buckets is NOT
    // guaranteed in general — the streaming caveat documented on
    // histogram(); this asserts pure count additivity per (col, bucket)
    // by recomputing on the union)
    val u = Profile.histogram(docs.filter(col("doc_id") % 2 === 0)
        .unionByName(docs.filter(col("doc_id") % 2 === 1)), Seq("doc_id", "n_chars"))
      .collect().toSeq
    assert(u == a)
  }
}
