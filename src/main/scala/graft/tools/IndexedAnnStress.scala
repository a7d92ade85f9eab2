package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** On-disk IVF index sweep (round 7): `ivf_topk_indexed` is the real
  * 100 TB ANN path — a cluster-partitioned inverted-list table whose query
  * reads only its nprobe `cluster=` directories — but round 6 only put the
  * in-memory variant in the scale table. This measures, per amplification
  * factor: index build cost, directory-listing time as the CLUSTER COUNT
  * grows (replicas are re-labeled, so 8×/64×/256× → 80/640/2560 clusters),
  * query wall-clock (min-of-2), and actual bytes read vs the index's size
  * on disk — the partition-pruning fraction, measured instead of claimed.
  * Results → STRESS.md ("On-disk IVF index").
  */
object IndexedAnnStress {

  private class Input extends SparkListener {
    @volatile var bytesRead = 0L
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) bytesRead += m.inputMetrics.bytesRead
    }
  }

  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val in = new Input
    spark.sparkContext.addSparkListener(in)

    // k× the corpus with per-replica labels AND a per-replica vector nudge:
    // every replica set becomes its own genuine cluster, so the index's
    // partition count scales with the factor (the directory-listing axis)
    def corpus(k: Int): DataFrame =
      graft.Tables.embeddings(spark, sf)
        .select(col("*"), explode(sequence(lit(0L), lit(k - 1L))).as("rep"))
        .withColumn("vec_id", col("vec_id") * k + col("rep"))
        .withColumn("label", col("label") + lit(10) * col("rep").cast("int"))
        .withColumn("embedding",
          transform(col("embedding"), x => x + col("rep").cast("float") * lit(0.01f)))
        .drop("rep")

    def dirSize(p: String): Long = {
      val fs = graft.functions.FsUtils.fs(spark, p)
      fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
    }

    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "8,64,256")
      .split(",").map(_.trim.toInt).toSeq
    println("factor,vectors,clusters,train_sec,build_sec,listing_sec,query_sec_min2,bytes_read_mb,index_mb,probed_clusters")
    for (k <- factors) {
      val c = corpus(k).localCheckpoint(true) // amplification cost stays out of every timing
      val nVec = c.count()
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-ivfidx$k").toString
      val t0 = System.nanoTime()
      val cents = Similarity.centroidSeq(c)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Similarity.buildIndex(c, cents, s"$tmp/index")
      val tBuild = (System.nanoTime() - t1) / 1e9
      // cold relation resolution = the partition-discovery listing
      val t2 = System.nanoTime()
      spark.read.parquet(s"$tmp/index")
      val tList = (System.nanoTime() - t2) / 1e9
      val probeIds = (1L to 10L).map(_ * k)
      // probed-cluster diagnostic: the probes' nprobe nearest centroids,
      // computed driver-side from the (tiny) quantizer — same argmin the
      // query bakes into its expression
      val probeVecs = c.filter(col("vec_id").isin(probeIds: _*))
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](1))
      val probed = probeVecs.flatMap { v =>
        cents.sortBy { case (_, cv) =>
          v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }.take(4).map(_._1)
      }.distinct.length
      def q(): Unit =
        Similarity.ivfTopKIndexed(spark, s"$tmp/index", cents,
          probeIds, k = 10, nprobe = 4)
          .write.format("noop").mode("overwrite").save()
      // warm + measure: bytesRead for the SECOND (steady-state) run only
      val tA0 = System.nanoTime(); q(); val tA = (System.nanoTime() - tA0) / 1e9
      in.bytesRead = 0
      val tB0 = System.nanoTime(); q(); val tB = (System.nanoTime() - tB0) / 1e9
      val mb = in.bytesRead / 1e6
      val idxMb = dirSize(s"$tmp/index") / 1e6
      println(f"$k,$nVec,${cents.size},$tTrain%.2f,$tBuild%.2f,$tList%.2f,${math.min(tA, tB)}%.2f,$mb%.1f,$idxMb%.1f,$probed")
    }
    spark.stop()
  }
}
