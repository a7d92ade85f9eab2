package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe — current: why is custkeys_intersect_approx slow? */
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
    def time(name: String)(f: => Unit): Unit = {
      val reps = 5
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f")
    }
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    graft.Tables.orders(spark, sf).count()
    val df = graft.operators.Analytics.custkeysIntersectApprox(spark, sf)
    time("intersect_approx") { run(df) }
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode).take(4000))
  }
}
