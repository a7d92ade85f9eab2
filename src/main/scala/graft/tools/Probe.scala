package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe main — rewritten per investigation. Current: round-6
  * interleaved timing of the election family after the shareInput decision
  * (shared-box noise is ±25%, so variants are timed round-robin and
  * compared on min AND median; the full A/B record lives in PLANS.md). */
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
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "curation_pipeline" -> (() => graft.SparkEntry.queries("curation_pipeline")(spark, sf)),
      "minhash_dedup_keep" -> (() => graft.SparkEntry.queries("minhash_dedup_keep")(spark, sf)),
      "simhash_dedup_keep" -> (() => graft.SparkEntry.queries("simhash_dedup_keep")(spark, sf)),
      "embedding_dedup_keep" -> (() => graft.SparkEntry.queries("embedding_dedup_keep")(spark, sf)),
      "dedup_clusters" -> (() => graft.SparkEntry.queries("dedup_clusters")(spark, sf)))

    graft.Tables.documents(spark, sf).count() // warm
    variants.foreach { case (_, f) => time(f()) } // warm codegen per variant
    val reps = 7
    val results = collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    for (_ <- 1 to reps; (n, f) <- variants) results(n) = results(n) :+ time(f())
    for ((n, _) <- variants) {
      val ts = results(n).sorted
      println(f"$n%-20s min=${ts.head}%.2f med=${ts(ts.size / 2)}%.2f all=${results(n).map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
