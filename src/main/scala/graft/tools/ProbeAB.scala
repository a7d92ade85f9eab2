package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe — rewritten per investigation (the Probe/ProbePerf
  * pattern). Current: decompose chunk_embed_topk (r20 opt) — time each
  * sub-frame to locate the 4.6 s of stage CPU the full query pays.
  */
object ProbeAB {
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
    def time(name: String, reps: Int = 3)(mk: => DataFrame): Unit = {
      run(mk) // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); run(mk); (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $name%-28s min=${times.min}%.3f  all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    import graft.operators.Prep
    val docs = graft.Tables.fanOut(graft.Tables.documents(spark, sf))
    val chunks = Prep.chunkOverlapOf(docs).select("doc_id", "chunk_hash")
    time("chunks") { chunks }
    val cands = chunks.select("chunk_hash")
      .filter(col("chunk_hash").isNotNull).distinct()
      .select(col("chunk_hash"), Prep.chunkEmbedExpr(col("chunk_hash"), 16).as("v"))
    time("cands(embed)") { cands }
    val probes = chunks.filter(col("doc_id") < 3L)
      .select("chunk_hash").distinct()
      .join(cands, "chunk_hash")
      .select(col("chunk_hash").as("query_hash"), col("v").as("qv"))
    time("probes") { probes }
    val joined = cands.join(broadcast(probes), col("query_hash") =!= col("chunk_hash"))
      .select(col("query_hash"), col("chunk_hash").as("cand_hash"),
        graft.functions.ExprUtils.roundz(
          graft.functions.VectorFunctions.cosine(col("qv"), col("v")), 4).as("sim"))
    time("joined(cosine)") { joined }
    time("full") { graft.SparkEntry.queries("chunk_embed_topk")(spark, sf) }
    println("[ab] probes rows = " + probes.count() + ", cands rows = " + cands.count())
    spark.stop()
  }
}
