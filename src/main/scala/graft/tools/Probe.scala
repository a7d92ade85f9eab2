package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main — used during development to check how Spark reads
  * the driver testdata (e.g. the nanosecond timestamp in events.parquet). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    import org.apache.spark.sql.functions._
    val ev2 = ev.withColumn("ts_us", expr("timestamp_micros(ts div 1000)"))
    ev2.select(col("event_id"), col("ts"), col("ts_us")).show(5, truncate = false)
    ev2.selectExpr("count(*) n", "count(distinct event_id) d").show()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.show(5, truncate = 80)
    docs.groupBy("lang").count().show()
    docs.groupBy("source").count().show()
    // any exact dup texts?
    docs.groupBy(md5(col("text"))).count().filter(col("count") > 1).show()
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.printSchema()
    emb.select(size(col("embedding")).as("dim")).distinct().show()
    emb.groupBy("label").count().show()
    spark.stop()
  }
}
