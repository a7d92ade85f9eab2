package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe — rewritten per investigation. Current: window-vs-aggregator
  * top-k A/B at sf0.1 (round-4 item 2: the bounded-buffer aggregator must
  * beat the window formulation it exists to replace).
  */
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
    val e = graft.Tables.embeddings(spark, sf)
    e.count() // warm file listing + JVM

    def time(name: String)(f: => Unit): Unit = {
      val reps = 5
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-18s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f")
    }
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    time("window") {
      graft.operators.Similarity.bruteForceTopK(e, probes, 3)
        .write.format("noop").mode("overwrite").save()
    }
    time("aggregator") {
      graft.operators.TopK.bruteForceTopKAgg(e, probes, 3)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
