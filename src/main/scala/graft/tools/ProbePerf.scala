package graft.tools
import org.apache.spark.sql.SparkSession

/** Driver-flow smoke: t1 entry() on sf0.001 must return >0 rows. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows: $n")
    df.show(5, truncate = false)
    assert(n > 0)
    spark.stop()
  }
}
