package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe main — rewritten per investigation. Current: round-count
  * vs volume for the iterative connected components on ScaleBench's
  * synthetic skip-chain + hub graph. The scale claim under test: rounds
  * are a function of graph STRUCTURE (diameter), not edge count — so
  * amplifying the corpus k× adds per-round volume but not rounds. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the ScaleBench connected_components graph, verbatim
    def edges(k: Int): DataFrame = {
      val n = k * 1000000L
      spark.range(n).select(
        col("id").as("a"),
        when(pmod(xxhash64(col("id")), lit(100)) < 1, pmod(xxhash64(col("id"), lit(1)), lit(1000)))
          .otherwise(col("id") + 1L + pmod(xxhash64(col("id"), lit(2)), lit(1000)))
          .as("b"))
    }
    for (k <- Seq(1, 4, 16)) {
      val t0 = System.nanoTime()
      graft.operators.Components.connectedComponents(edges(k), "a", "b")
        .write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"factor=$k rounds=${graft.operators.Components.lastRounds} single_run_sec=$t%.1f")
    }
    spark.stop()
  }
}
