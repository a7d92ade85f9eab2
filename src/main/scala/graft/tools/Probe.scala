package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main — rewritten per investigation. Current: round-4 plan
  * audit of the changed queries (date-range pushdown, udaf partial
  * aggregation, bounded sub-bucket exchanges). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    println("=== orders_by_date_range: bounds must reach PushedFilters ===")
    graft.SparkEntry.queries("orders_by_date_range")(spark, sf).explain("formatted")

    println("=== cosine_topk_agg: partial ObjectHashAggregate before the exchange ===")
    graft.SparkEntry.queries("cosine_topk_agg")(spark, sf).explain("formatted")

    println("=== embedding_near_dup_lsh: window -> explode -> ONE repartition exchange -> exchange-free groupBy ===")
    graft.SparkEntry.queries("embedding_near_dup_lsh")(spark, sf).explain("formatted")

    spark.stop()
  }
}
