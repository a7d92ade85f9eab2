package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe main — rewritten per investigation. Current: A/B of
  * Components.connectedComponents shareExchange (one repartition-on-u
  * exchange feeding dedupe + groupBy-min + join-back per star step, the
  * electKeep pattern) vs the unshared 3-exchanges-per-step form, on
  * ScaleBench's synthetic skip-chain graph at 4x (4M edges). Shared-box
  * noise is ±25%, so variants run round-robin and compare on min AND
  * median. */
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

    def edges(k: Int): DataFrame = {
      val n = k * 1000000L
      spark.range(n).select(
        col("id").as("a"),
        when(pmod(xxhash64(col("id")), lit(100)) < 1, pmod(xxhash64(col("id"), lit(1)), lit(1000)))
          .otherwise(col("id") + 1L + pmod(xxhash64(col("id"), lit(2)), lit(1000)))
          .as("b"))
    }
    def run(share: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.operators.Components.connectedComponents(edges(4), "a", "b", shareExchange = share)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(share = false); run(share = true) // warm
    val results = collection.mutable.Map[Boolean, Vector[Double]]().withDefaultValue(Vector())
    for (_ <- 1 to 3; share <- Seq(false, true)) results(share) = results(share) :+ run(share)
    for (share <- Seq(false, true)) {
      val ts = results(share).sorted
      println(f"shareExchange=$share%-5s min=${ts.head}%.1f med=${ts(ts.size / 2)}%.1f " +
        f"all=${results(share).map(t => f"$t%.1f").mkString(",")} rounds=${graft.operators.Components.lastRounds}")
    }
    spark.stop()
  }
}
