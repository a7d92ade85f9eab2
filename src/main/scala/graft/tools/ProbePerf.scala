package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe — rewritten per investigation. Current: A/B of the two
  * BucketedPairs size-discovery strategies (count-join vs window) on the two
  * LSH audit pipelines at sf0.1, repeated — single bench runs vary ±10%.
  */
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
    import graft.operators.{BucketedPairs, Dedup, Similarity}
    import org.apache.spark.sql.graft.{ColumnBridge, CosinePairsBounded, HyperplaneBuckets, JaccardPairsBounded}

    def time(name: String)(f: => Unit): Unit = {
      val reps = 7
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f med=${times.sorted.apply(reps / 2)}%.3f")
    }
    def run(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    // embedding LSH bucket frame (as embeddingNearDupLsh builds it)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.count()
    val planes = Similarity.hyperplanes(64, 16 * 4)
    val bucketsCol = ColumnBridge.column(HyperplaneBuckets(
      ColumnBridge.expression(col("v")), planes.toArray, 4))
    val embBucketed = e.select(col("vec_id"), col("v"),
      posexplode(bucketsCol).as(Seq("tbl", "bucket")))
    def embPairs(sub: DataFrame): DataFrame = {
      val pairs = ColumnBridge.column(CosinePairsBounded(
        ColumnBridge.expression(col("xs")), ColumnBridge.expression(col("cross")), 0.35))
      sub.select(explode(pairs).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.sim"))
        .dropDuplicates("id_a", "id_b")
    }
    time("emb countJoin") { run(embPairs(BucketedPairs.boundedSubBucketsCountJoin(
      embBucketed, Seq("tbl", "bucket"), col("vec_id"), col("v"), 2000))) }
    time("emb window") { run(embPairs(BucketedPairs.boundedSubBucketsWindow(
      embBucketed, Seq("tbl", "bucket"), col("vec_id"), col("v"), 2000))) }

    // minhash band-bucket frame (as nearDuplicatePairs builds it, gate params)
    val docs = graft.Tables.documents(spark, sf).filter(col("doc_id") < 500)
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 64, 1,
      graft.functions.Hashing.h60)
    val sets = sigs.select(col("doc_id"),
      array_distinct(transform(col("shingles"), s => graft.functions.Hashing.h60(s))).as("sset"))
    val mhBucketed = Dedup.lshBands(sigs, "doc_id", 64, 8).join(sets, Seq("doc_id"))
    def mhPairs(sub: DataFrame): DataFrame = {
      val pairs = ColumnBridge.column(JaccardPairsBounded(
        ColumnBridge.expression(col("xs")), ColumnBridge.expression(col("cross")), 0.9))
      sub.select(explode(pairs).as("p"))
        .select(col("p.id_a"), col("p.id_b"), col("p.jaccard"))
        .dropDuplicates("id_a", "id_b")
    }
    time("minhash countJoin") { run(mhPairs(BucketedPairs.boundedSubBucketsCountJoin(
      mhBucketed, Seq("band_idx", "band_key"), col("doc_id"), col("sset"), 5000))) }
    time("minhash window") { run(mhPairs(BucketedPairs.boundedSubBucketsWindow(
      mhBucketed, Seq("band_idx", "band_key"), col("doc_id"), col("sset"), 5000))) }
    spark.stop()
  }
}
