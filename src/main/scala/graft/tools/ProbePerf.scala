package graft.tools
import org.apache.spark.sql.SparkSession

/** Smoke: curation pipeline must be non-empty at every sf. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
      println(s"$d curation rows: ${graft.operators.Curation.curate(spark, d).count()}")
    spark.stop()
  }
}
