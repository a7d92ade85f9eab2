package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe — current: does PushSortBelowProjects recover the
  * sort-below win automatically on a sort-above formulation? */
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
    import graft.functions.TextFunctions._

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
    def sortAbove = docs.select(col("doc_id"), langIdHeuristic(col("text")).as("lang_pred"))
      .orderBy("doc_id")

    time("sort-above, no rule") { run(sortAbove) }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.PushSortBelowProjects
    time("sort-above, rule mounted") { run(sortAbove) }
  }
}
