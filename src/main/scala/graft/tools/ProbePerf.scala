package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Tables

object ProbePerf {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, d).filter(col("doc_id") < 500)
    time("warmup count")(docs.count())
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 64, 1)
    val bands = Dedup.lshBands(sigs, "doc_id", 64, 8)
    time("bands materialized")(bands.agg(bit_xor(col("band_key"))).collect())
    val cands = Dedup.lshCandidatePairs(sigs, "doc_id", 64, 8)
    println(s"candidates: ${time("candidates")(cands.count())}")
    val pairs = Dedup.nearDuplicatePairs(docs, "text", "doc_id", 0.9, 64, 8, 1)
    println(s"verified: ${time("verified pairs")(pairs.count())}")
    val keep = Dedup.lshDedupKeep(Tables.documents(spark, d), "text", "doc_id", 64, 8, 1)
    time("dedup keep full 5000... wait sf0.01 is 500")(keep.count())
    val sim = Dedup.simhashNearDupPairs(docs, "text", "doc_id", 7, 8)
    println(s"simhash pairs: ${time("simhash pairs")(sim.count())}")
    spark.stop()
  }
}
