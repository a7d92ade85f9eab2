package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe — current: does disabling constraint propagation cut the
  * per-query Catalyst planning floor without changing results? */
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
    def runSet(): Double = {
      val names = Seq("point_lookup", "overview", "recent_orders", "docs_by_source",
        "orders_by_date", "curation_pipeline", "minhash_dedup_keep", "events_asof")
      val t0 = System.nanoTime()
      names.foreach(n => run(graft.SparkEntry.queries(n)(spark, sf)))
      (System.nanoTime() - t0) / 1e9
    }
    graft.Tables.orders(spark, sf).count()
    runSet() // warm
    val a = (1 to 3).map(_ => runSet()).min
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    val b = (1 to 3).map(_ => runSet()).min
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    println(f"8-query set: default=$a%.2f s, constraintProp-off=$b%.2f s")
  }
}
