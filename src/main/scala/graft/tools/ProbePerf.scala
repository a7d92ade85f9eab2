package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe — current: adjudicate the r9 bench-epoch outliers
  * (`chunk_embed_topk`, `cosine_topk_agg`, `doc_fingerprint`) flagged in
  * VERDICT.md: run each with many reps in one session and report the full
  * distribution, so run-order luck and JIT warmup can't masquerade as a
  * plan regression the way a loaded min-of-2 epoch can. */
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
    // same setup Bench performs before timing
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sf/region.parquet").count()
    graft.operators.Similarity.trainedCentroids(graft.Tables.embeddings(spark, sf), sf)
    for (name <- Seq("doc_fingerprint", "cosine_topk_agg", "chunk_embed_topk")) {
      val df = graft.SparkEntry.queries(name)(spark, sf)
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); run(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-18s min=${times.min}%.3f  med=${times.sorted.apply(3)}%.3f  " +
        f"max=${times.max}%.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
  }
}
