package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.operators.Quality._

class QualitySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // fixture with every violation kind present: nulls, dups, out-of-range,
  // off-list values, pattern breaks, and orphan foreign keys
  private def users = Seq(
    (1L, Option(10L), Option("a@x.io"), Option("US"), Option(25.0)),
    (2L, Option(10L), Option("b@x.io"), Option("US"), Option(-3.0)), // dup ref=10, age<0
    (3L, Option(99L), Option("c@x.io"), Option("DE"), Option(40.0)), // orphan ref
    (4L, None,        Option("bad"),    Option("XX"), Option(130.0)), // null ref, bad email, off-list, age>120
    (5L, Option(20L), None,             None,         None))          // nulls
    .toDF("id", "ref_id", "email", "country", "age")

  private def dims = Seq(10L, 20L, 30L).toDF("d_id")

  private def checks = Seq(
    NotNull("id"),
    Unique("id"),
    Unique("ref_id"),                       // dup 10 → 1 violation (4 non-null, 3 distinct)
    NotNull("ref_id", maxViolFrac = 0.25),  // 1/5 = 0.2 ≤ 0.25 → passes
    NotNull("email"),                       // 1 violation → fails
    InRange("age", 0.0, 120.0),             // -3 and 130 → 2 violations
    AcceptedValues("country", Seq("US", "DE", "FR")), // XX → 1
    MatchesPattern("email", "^[a-z]+@[a-z]+\\.[a-z]+$"), // "bad" → 1 (null NOT counted)
    RefIntegrity("ref_id", "d_id", "dims")) // 99 → 1 (null fk NOT counted)

  private def report() =
    Quality.validate(users, checks, refs = Map("dims" -> dims)).collect()

  test("violation counts and verdicts, every check kind") {
    val r = report()
    assert(r.length === checks.length)
    // (check_id, violations, passed)
    val got = r.map(x => (x.getLong(0), x.getLong(4), x.getBoolean(6))).toSeq
    assert(got === Seq(
      (0L, 0L, true),   // id not null
      (1L, 0L, true),   // id unique
      (2L, 1L, false),  // ref_id dup
      (3L, 1L, true),   // 20% nulls within 25% tolerance
      (4L, 1L, false),  // email null
      (5L, 2L, false),  // ages out of range
      (6L, 1L, false),  // country XX
      (7L, 1L, false),  // pattern: only the non-null "bad"
      (8L, 1L, false))) // orphan 99; null fk not an orphan
    assert(r.forall(_.getLong(3) === 5L)) // n = table rows on every row
  }

  test("frac arithmetic and threshold boundary: violations == maxFrac*n passes") {
    val r = report()
    val nn = r.find(_.getLong(0) == 3L).get
    assert(nn.getDouble(5) === 0.2)
    // exact boundary: 1 violation, tolerance exactly 1/5
    val b = Quality.validate(users, Seq(NotNull("email", maxViolFrac = 0.2)))
      .collect().head
    assert(b.getLong(4) === 1L && b.getBoolean(6))
  }

  test("approx-unique path (exactUnique=false) agrees on this cardinality and fuses to one aggregate") {
    val r = Quality.validate(users, checks, refs = Map("dims" -> dims),
      exactUnique = false).collect()
    val exact = report()
    assert(r.map(_.getLong(4)).toSeq === exact.map(_.getLong(4)).toSeq)
    // the fused plan has no Expand (the exact multi-distinct signature)
    val plan = Quality.validate(users, Seq(Unique("id"), NotNull("id")),
      exactUnique = false).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"))
  }

  test("oracle SQL generated from the same checks matches the query on the gate fixture") {
    // structural guard: every check id appears exactly once in the SQL and
    // the kinds line up (the value-level compare is the DuckDB gate's job)
    val sql = Quality.validateSql("orders", Quality.ordersChecks)
    Quality.ordersChecks.zipWithIndex.foreach { case (c, i) =>
      assert(sql.contains(s"CAST($i AS BIGINT) AS check_id"))
      assert(sql.contains(s"'${c.kind}' AS check_type"))
    }
    assert(sql.split("UNION ALL").length === Quality.ordersChecks.length)
  }

  test("suggestChecks closes the profile loop and the suggested suite passes on its own data") {
    val prof = graft.operators.Profile.profile(
      users.select("id", "age"),
      Seq("id" -> graft.operators.Profile.NumCol,
        "age" -> graft.operators.Profile.NumCol)).collect().toSeq
    val sug = Quality.suggestChecks(prof)
    // id: no nulls, all distinct, observed range; age: has nulls (no
    // NotNull) but its NON-NULL values are all distinct → Unique + range
    assert(sug === Seq(
      Unique("age"), InRange("age", -3.0, 130.0),
      NotNull("id"), Unique("id"), InRange("id", 1.0, 5.0)))
    val rep = Quality.validate(users, sug).collect()
    assert(rep.forall(_.getBoolean(6))) // observed constraints hold by construction
    // HLL profiles must not mint hard uniqueness claims
    assert(!Quality.suggestChecks(prof, exactProfile = false)
      .exists(_.isInstanceOf[Unique]))
  }

  test("partitioning independence") {
    val a = Quality.validate(users.repartition(7), checks,
      refs = Map("dims" -> dims.repartition(3))).collect().toSeq
    assert(a === report().toSeq)
  }

  test("empty input: zero violations, NULL fraction, every check passes (ADVICE r14)") {
    val empty = users.limit(0)
    for (r <- Seq(
        Quality.validate(empty, checks, refs = Map("dims" -> dims)).collect(),
        Quality.validateTheta(empty, checks, refs = Map("dims" -> dims)).collect())) {
      assert(r.length === checks.length)
      assert(r.forall(_.getLong(3) === 0L), "n must be 0")
      assert(r.forall(_.getLong(4) === 0L), "violations must be 0, not NULL")
      assert(r.forall(_.isNullAt(5)), "frac over zero rows is NULL (defined, both engines)")
      assert(r.forall(_.getBoolean(6)), "an empty table violates nothing")
    }
  }

  test("validateSql escapes quotes in values and patterns") {
    val sql = Quality.validateSql("t", Seq(
      AcceptedValues("name", Seq("O'Brien", "plain")),
      MatchesPattern("name", "^[a-z']+$")))
    assert(sql.contains("'O''Brien'"))
    assert(sql.contains("'^[a-z'']+$'"))
    assert(!sql.contains("'O'Brien'"))
  }
}
