package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
import org.apache.spark.sql.functions._
import graft.plans.PushSortBelowProjects

class PlanRulesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Run `f` with the rule mounted on the shared session, then unmount. */
  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PushSortBelowProjects
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == PushSortBelowProjects)
  }

  /** True if some Project sits ABOVE the (single) global Sort. */
  private def projectAboveSort(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    val sorts = plan.collect { case s: Sort => s }
    assert(sorts.length == 1)
    plan.collectFirst { case p: Project
      if p.collectFirst { case s: Sort => s }.isDefined => p }.isDefined
  }

  private def docs = Tables.documents(spark, Sf0001)

  test("global sort sinks below a computed projection; results unchanged") {
    def q = docs.select(col("doc_id"), upper(col("text")).as("u"))
      .orderBy("doc_id")
    val without = q.collect()
    withRule {
      assert(projectAboveSort(q), "rule should leave Project above Sort")
      assert(q.collect().sameElements(without))
    }
    assert(!projectAboveSort(q), "without the rule the Sort stays on top")
  }

  test("sinks below the (collapsed) projection chain, none left beneath") {
    def q = docs.select(col("doc_id"), length(col("text")).as("n"))
      .select(col("doc_id"), (col("n") * 2).as("n2"))
      .orderBy("doc_id")
    withRule {
      val plan = q.queryExecution.optimizedPlan
      val sort = plan.collect { case s: Sort => s }.head
      assert(sort.collectFirst { case p: Project => p }.isEmpty,
        "no Project below the sunk Sort")
      assert(projectAboveSort(q))
    }
  }

  test("does not cross a projection the sort key does not pass through") {
    // sort key is itself the computed alias — rule must not fire
    def q = docs.select(col("doc_id"), length(col("text")).as("n")).orderBy("n")
    withRule {
      val plan = q.queryExecution.optimizedPlan
      val sort = plan.collect { case s: Sort => s }.head
      assert(sort.child.isInstanceOf[Project])
      assert(q.collect().length == docs.count())
    }
  }

  test("does not fire on pure column prunes or non-global sorts") {
    def prune = docs.select("doc_id", "source").orderBy("doc_id")
    def local = docs.select(col("doc_id"), upper(col("text")).as("u"))
      .sortWithinPartitions("doc_id")
    withRule {
      assert(!projectAboveSort(prune), "column prune must not be crossed")
      val lp = local.queryExecution.optimizedPlan
      assert(lp.collect { case s: Sort => s }.forall(!_.global))
      assert(lp.collectFirst { case p: Project
        if p.collectFirst { case s: Sort => s }.isDefined => p }.isEmpty)
    }
  }
}
