package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main — rewritten per investigation. Current: plan-shape
  * audit of sample_weighted — the 100 TB claim is narrow projection →
  * TakeOrderedAndProject(n) with no corpus-wide sort/window below the
  * bounded top-n. */
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
    val df = graft.SparkEntry.queries("sample_weighted")(spark, sf)
    df.explain("formatted")
    spark.stop()
  }
}
