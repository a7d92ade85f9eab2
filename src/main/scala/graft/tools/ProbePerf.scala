package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe — current investigation: global orderBy ABOVE a narrow
  * pipeline makes the range-partitioner's sampling job re-execute the whole
  * pipeline (no shuffle below to reuse) — sort the narrow base instead and
  * let order-preserving maps carry it. */
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
    import graft.operators.{Dedup, TextAnalysis, Prep}
    import graft.functions.TextFunctions._
    import graft.functions.Hashing.h60

    def time(name: String)(f: => Unit): Unit = {
      val reps = 7
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f")
    }
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.documents(spark, sf)
    docs.count()
    val sorted = docs.orderBy("doc_id")

    time("lang_id above") { run(TextAnalysis.langId(spark, sf)) }
    time("lang_id below") { run(sorted.select(col("doc_id"), langIdHeuristic(col("text")).as("lang_pred"))) }
    time("fingerprint above") { run(TextAnalysis.fingerprint(spark, sf)) }
    time("fingerprint below") { run(sorted.select(
      col("doc_id"), h60(col("text")).as("content_fp"),
      Dedup.simhash(col("text"), h60).as("simhash_fp"),
      array_join(transform(Dedup.winnowingFingerprint(col("text"), hashFn = h60),
        _.cast("string")), "-").as("winnow_fp"))) }
    time("chunk above") { run(Prep.chunkOverlap(spark, sf)) }
  }
}
