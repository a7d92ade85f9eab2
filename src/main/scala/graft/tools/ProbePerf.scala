package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe — rewritten per investigation. Current: curation_pipeline
  * gate placement (scores below vs above the near-dup semi-join). */
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
    import graft.operators.Dedup
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

    def curateOld: DataFrame = {
      val exactKept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      val nearKeepIds = Dedup.lshDedupKeep(exactKept, "text", "doc_id",
          numPerm = 64, bands = 8, shingleK = 1, hashFn = h60)
        .filter(col("keep")).select("doc_id")
      exactKept
        .join(nearKeepIds, Seq("doc_id"), "left_semi")
        .withColumn("quality", qualityScore(col("text")))
        .withColumn("lang_pred", langIdHeuristic(col("text")))
        .filter(col("quality") >= 0.3 && col("lang_pred") === "en")
        .select(col("doc_id"), col("lang_pred"), col("quality"),
          length(col("text")).cast("long").as("char_len"),
          wsTokenCount(col("text")).as("ws_tokens"),
          reTokenCount(col("text")).as("re_tokens"))
        .orderBy("doc_id")
    }

    time("old (gates above join)") { run(curateOld) }
    time("new (gates below join)") {
      run(graft.operators.Curation.curate(spark, sf, hashFn = h60))
    }
    time("old again") { run(curateOld) }
    time("new again") {
      run(graft.operators.Curation.curate(spark, sf, hashFn = h60))
    }
  }
}
