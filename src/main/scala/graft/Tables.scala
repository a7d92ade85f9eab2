package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Parquet is self-describing, so no schema inference pass happens; Catalyst
  * pushes filters and prunes columns into these scans automatically (the
  * reference's B-tree index access, `migrations/init.sql:16,31-32`, maps to
  * parquet row-group min/max skipping — SURVEY.md §4).
  *
  * Scale note (100 TB posture): these are plain directory scans. On a real
  * cluster the same loaders work unchanged over partitioned layouts
  * (e.g. `orders/o_orderdate=.../`), where partition pruning kicks in on top.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = p(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = p(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = p(spark, dir, "embeddings")

  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS) which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Sessions that read
    * events set `spark.sql.legacy.parquet.nanosAsLong=true` at BUILD time
    * (Bench/Verify/SparkSuite/tools) — a loader must not mutate session
    * config as a side effect (it would race concurrent queries and silently
    * change semantics of unrelated reads mid-session). The long nanos are
    * truncated to microseconds — the same truncation DuckDB applies when it
    * reads the file, so oracle comparisons line up exactly.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events")
    p(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
