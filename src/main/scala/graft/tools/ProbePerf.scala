package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe — current (round 14): adjudicate the two r13 driver-epoch
  * outliers (VERDICT "what's wrong" #3). `bm25_topk` read 0.22 → 2.70 s and
  * `orders_daily_delta` 0.14 → 1.43 s across driver epochs with no code
  * change; both are suspected first-execution JIT/class-load on a warm VM.
  * Min-of-5 with per-rep breakdown separates the one-time cost (rep 1) from
  * steady state (reps 2-5): if rep 1 alone carries the spike, the outlier
  * is the VM's, the query goes on BASELINE.md's wobble-prone list, and the
  * round-14 Bench warm-up (untimed first execution) prevents the class
  * structurally. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(name: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    // same setup Bench performs before timing
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sf/region.parquet").count()
    graft.operators.Similarity.trainedCentroids(graft.Tables.embeddings(spark, sf), sf)

    for (q <- sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES",
           "bm25_topk,orders_daily_delta").split(",").map(_.trim).filter(_.nonEmpty)) {
      require(graft.SparkEntry.queries.contains(q), s"no such query: $q")
      time(q) { graft.SparkEntry.queries(q)(spark, sf) }
    }
    spark.stop()
  }
}
