package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe — rewritten per investigation. Current: plan audit of the
  * round-2 changes (multimodal digest placement, partition-scoped merge
  * pruning, IVF cached-quantizer plan).
  */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"

    println("=== multimodal_frames (md5 must sit BELOW the generator) ===")
    graft.operators.Multimodal.sampleFrames(
      graft.operators.Multimodal.mediaFromDocuments(graft.Tables.documents(spark, sf)))
      .explain("formatted")

    println("=== extractFeatures (single md5 per row via bindOnce) ===")
    graft.operators.Multimodal.extractFeatures(
      graft.operators.Multimodal.mediaFromDocuments(graft.Tables.documents(spark, sf)))
      .explain("formatted")

    println("=== ann_ivf_topk with cached quantizer (no training scan) ===")
    val e = graft.Tables.embeddings(spark, sf)
    val cents = graft.operators.Similarity.trainedCentroids(e, sf)
    graft.operators.Similarity.ivfTopK(e, cents, Seq(0L, 1L, 2L), 3, 3)
      .explain("formatted")

    println("=== partition-scoped merge: slice read must show PartitionFilters ===")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("probe-pmerge").toString
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 7L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 8L, "view", 2.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    graft.streaming.EventsPipeline.mergePartitioned(spark, ev, s"$tmp/out")
    val slice = spark.read.parquet(s"$tmp/out")
      .filter(col("event_date").isin(java.sql.Date.valueOf("2024-01-02")))
    slice.explain("formatted")
    spark.stop()
  }
}
