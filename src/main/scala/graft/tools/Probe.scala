package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe main — rewritten per investigation. Current: round-6
  * interleaved A/B of the curation fusion variants and the electKeep
  * shareInput modes (shared-box noise is ±25%, so variants are timed
  * round-robin and compared on min AND median). */
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
    val h60 = graft.functions.Hashing.h60 _

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // the r05 sequential pipeline, reconstructed for same-epoch comparison
    def curateR05(): DataFrame = {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      val docs = graft.Tables.documents(spark, sf)
      val exactKept = graft.operators.Dedup.dropExactDuplicates(docs, "text", "doc_id")
      val nearKeepIds = graft.operators.Dedup.lshDedupKeep(exactKept, "text", "doc_id",
          numPerm = 64, bands = 8, shingleK = 1, hashFn = h60)
        .filter(col("keep")).select("doc_id")
      exactKept.join(nearKeepIds, Seq("doc_id"), "left_semi")
        .withColumn("quality", qualityScore(col("text")))
        .withColumn("lang_pred", langIdHeuristic(col("text")))
        .filter(col("quality") >= 0.3 && col("lang_pred") === "en")
        .select(col("doc_id"), col("lang_pred"), col("quality"),
          length(col("text")).cast("long").as("char_len"),
          wsTokenCount(col("text")).as("ws_tokens"),
          reTokenCount(col("text")).as("re_tokens"))
        .orderBy("doc_id")
    }
    import graft.operators.{Dedup, Similarity}
    val docs = graft.Tables.documents(spark, sf)
    val embs = graft.Tables.embeddings(spark, sf)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "curate_r05" -> (() => curateR05()),
      "simhash_share" -> (() => Dedup.simhashDedupKeep(docs, "text", "doc_id", hashFn = h60, shareInput = true)),
      "simhash_noshare" -> (() => Dedup.simhashDedupKeep(docs, "text", "doc_id", hashFn = h60, shareInput = false)),
      "embed_share" -> (() => Similarity.embeddingDedupKeep(embs, dim = 64, shareInput = true)),
      "embed_noshare" -> (() => Similarity.embeddingDedupKeep(embs, dim = 64, shareInput = false)),
      "minhash_share" -> (() => Dedup.lshDedupKeep(docs, "text", "doc_id",
        numPerm = 64, bands = 8, shingleK = 1, hashFn = h60)))

    graft.Tables.documents(spark, sf).count() // warm
    variants.foreach { case (_, f) => time(f()) } // warm codegen per variant
    val reps = 7
    val results = collection.mutable.Map[String, Vector[Double]]().withDefaultValue(Vector())
    for (_ <- 1 to reps; (n, f) <- variants) results(n) = results(n) :+ time(f())
    for ((n, _) <- variants) {
      val ts = results(n).sorted
      println(f"$n%-18s min=${ts.head}%.2f med=${ts(ts.size / 2)}%.2f all=${results(n).map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
