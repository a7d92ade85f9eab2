package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.Tables

object ProbePerf {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    time("warmup")(e.count())
    val full = Similarity.embeddingNearDupLsh(e, 64, 0.35)
    println(s"verified: ${time("lsh v3 (CosinePairs)")(full.count())}")
    println(s"again: ${time("lsh v3 rerun")(full.count())}")
    spark.stop()
  }
}
