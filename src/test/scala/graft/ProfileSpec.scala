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
}
