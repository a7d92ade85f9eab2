package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe main — rewritten per investigation. Current: single-shot
  * connected-components run at SPARK_GRAFT_CC_FACTOR × 1M edges with the
  * round-7 constant levers exposed (SPARK_GRAFT_CC_CKPT_EVERY,
  * SPARK_GRAFT_CC_PARTS) for the A/B in PLANS.md "CC constant". */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CC_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = sys.env.getOrElse("SPARK_GRAFT_CC_FACTOR", "64").toInt
    val n = k * 1000000L
    // refuse heaps the run cannot fit instead of OOMing 15 rounds in: the
    // measured floor is ~0.5 GB heap per 1M edges (Components scaladoc —
    // 16M fits the 8g sbt fork, 64M needs ~32g). Documented invocation:
    //   java -Xmx32g -cp "$(ls -d /opt/spark/jars)/*:target/scala-2.13/classes" \
    //     graft.tools.Probe       # SPARK_GRAFT_CC_FACTOR=64
    val heapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    val floorGb = k / 2
    if (heapGb < floorGb) {
      System.err.println(
        s"Probe: factor=$k (${k}M edges) needs ≈${floorGb}g heap; this JVM has " +
        s"${heapGb}g (-Xmx). Re-run with an explicit -Xmx ≥ ${floorGb}g — " +
        "refusing to start a run that will OOM mid-iteration.")
      sys.exit(2)
    }
    val edges: DataFrame = spark.range(n).select(
      col("id").as("a"),
      when(pmod(xxhash64(col("id")), lit(100)) < 1, pmod(xxhash64(col("id"), lit(1)), lit(1000)))
        .otherwise(col("id") + 1L + pmod(xxhash64(col("id"), lit(2)), lit(1000)))
        .as("b"))
    val ckptEvery = sys.env.getOrElse("SPARK_GRAFT_CC_CKPT_EVERY", "1").toInt
    val parts = sys.env.getOrElse("SPARK_GRAFT_CC_PARTS", "0").toInt
    val t0 = System.nanoTime()
    val (cc, rounds) =
      graft.operators.Components.connectedComponentsWithRounds(edges, "a", "b",
        checkpointEvery = ckptEvery, numPartitions = parts)
    cc.write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    println(f"factor=$k ckptEvery=$ckptEvery parts=$parts rounds=$rounds single_run_sec=$t%.1f")
    spark.stop()
  }
}
