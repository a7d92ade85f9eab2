package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Layout, Multimodal}

class LayoutSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("partitioned layout prunes non-matching tenant directories") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val orders = Tables.orders(spark, Sf0001)
    Layout.writePartitioned(orders, s"$tmp/orders", Seq("o_orderpriority"))
    val pruned = Layout.readPartitioned(spark, s"$tmp/orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderpriority"), s"expected partition pruning in:\n$plan")
    // pruned read returns exactly the filtered subset
    val expected = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("bucketed tables join with no Exchange in the plan") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '/tmp/graft-bkt-db'")
    val o = Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, Sf0001)
      .select(col("c_custkey"), col("c_name"))
    graft.operators.Layout.writeBucketed(o, "graft_bkt.orders_b", 8, Seq("o_custkey"))
    graft.operators.Layout.writeBucketed(c, "graft_bkt.cust_b", 8, Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("graft_bkt.orders_b")
        .join(spark.table("graft_bkt.cust_b"), col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join:\n$plan")
      // and it computes the same rows as the plain join
      val expected = o.join(c, col("o_custkey") === col("c_custkey")).count()
      assert(j.count() == expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt.orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_bkt.cust_b")
      spark.sql("DROP DATABASE IF EXISTS graft_bkt")
    }
  }

  test("saltedJoin is row-identical to the plain equi-join") {
    val orders = Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, Sf0001).select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("o_custkey"))
    val salted = Layout.saltedJoin(orders, cust, Seq("o_custkey"),
      numSalts = 8, saltFrom = col("o_orderkey"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoinHot (targeted) is row-identical to the plain equi-join") {
    val orders = Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, Sf0001).select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("o_custkey"))
    // hot list: the two most frequent custkeys in the slice (plus one absent
    // key — salting a key with no rows must be a no-op)
    val hot = orders.groupBy("o_custkey").count()
      .orderBy(col("count").desc, col("o_custkey")).limit(2)
      .collect().map(_.getLong(0)).toSeq :+ -1L
    val salted = Layout.saltedJoinHot(orders, cust, "o_custkey",
      numSalts = 8, saltFrom = col("o_orderkey"), hotKeys = hot)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("detectHotKeys finds exactly the planted hot keys from a sample") {
    // 60% of rows on key 7, 20% on key 13, the rest spread over 10k keys —
    // at hotShare=0.05 the detector must surface {7, 13} and nothing with
    // real mass (MG over-detection is allowed but bounded; nothing else
    // here clears the share test)
    val skewed = spark.range(100000).select(
      when(pmod(col("id"), lit(10)) < 6, lit(7L))
        .when(pmod(col("id"), lit(10)) < 8, lit(13L))
        .otherwise(pmod(xxhash64(col("id")), lit(10000)) + 100L).as("k"))
    val hot = Layout.detectHotKeys(skewed, "k",
      sampleFraction = 0.05, hotShare = 0.05)
    assert(hot.take(2).toSet == Set("7", "13"), s"detected: $hot")
    // a uniform key column detects nothing
    val uniform = spark.range(100000)
      .select(pmod(xxhash64(col("id")), lit(10000)).as("k"))
    assert(Layout.detectHotKeys(uniform, "k",
      sampleFraction = 0.05, hotShare = 0.05).isEmpty)
  }

  test("saltedJoinAuto is row-identical to the plain equi-join") {
    val orders = Tables.orders(spark, Sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, Sf0001).select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("o_custkey"))
    // sf0.001 custkeys are near-uniform → detector may return nothing
    // (plain-join path) — and a forced low threshold over-detects; BOTH
    // must stay row-identical
    for (share <- Seq(0.5, 0.001)) {
      val auto = Layout.saltedJoinAuto(orders, cust, "o_custkey",
        numSalts = 8, saltFrom = col("o_orderkey"),
        sampleFraction = 0.5, hotShare = share)
      assert(auto.count() == plain.count(), s"share=$share")
      assert(auto.exceptAll(plain).count() == 0, s"share=$share")
      assert(plain.exceptAll(auto).count() == 0, s"share=$share")
    }
  }

  test("compaction rewrites only fragmented partitions and keeps rows identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val dir = s"$tmp/t"
    // p=a fragmented (12 files), p=b already compact (1 file)
    (1 to 100).map(i => (i.toLong, "a")).toDF("id", "p")
      .repartition(12).write.partitionBy("p").parquet(dir)
    (101 to 110).map(i => (i.toLong, "b")).toDF("id", "p")
      .coalesce(1).write.mode("append").partitionBy("p").parquet(dir)
    def files(sub: String) = new java.io.File(s"$dir/p=$sub").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified())).toSet
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    val bFiles = files("b")
    assert(files("a").size > 8)
    val n = Layout.compactPartitions(spark, dir, maxFilesPerPartition = 8, targetFiles = 1)
    assert(n == 1, s"expected exactly the fragmented partition compacted, got $n")
    assert(files("a").size == 1)
    assert(files("b") == bFiles, "already-compact partition must be untouched")
    val after = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    assert(after == before)
    // crash recovery: orphan p=a into the sibling staging dir, re-run
    // restores it (staging is OUTSIDE the root so partition discovery
    // never sees half-compacted data)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir.compact.tmp"))
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/p=a"),
      new org.apache.hadoop.fs.Path(s"$dir.compact.tmp/p=a"))
    Layout.compactPartitions(spark, dir, maxFilesPerPartition = 8)
    val healed = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    assert(healed == before)
  }

  test("compaction reaches leaf partitions of multi-level tables") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    val dir = s"$tmp/t"
    (1 to 80).map(i => (i.toLong, "d1", if (i % 2 == 0) "x" else "y"))
      .toDF("id", "d", "t").repartition(10)
      .write.partitionBy("d", "t").parquet(dir)
    def nFiles(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles("d=d1/t=x") > 8)
    val before = spark.read.parquet(dir).as[(Long, String, String)].collect().sorted.toSeq
    val n = Layout.compactPartitions(spark, dir, maxFilesPerPartition = 8, targetFiles = 1)
    assert(n == 2, s"both fragmented leaves compacted, got $n")
    assert(nFiles("d=d1/t=x") == 1 && nFiles("d=d1/t=y") == 1)
    val after = spark.read.parquet(dir).as[(Long, String, String)].collect().sorted.toSeq
    assert(after == before)
  }

  test("frame sampling emits every Nth frame with deterministic hashes") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, Sf0001))
    val frames = Multimodal.sampleFrames(media, everyN = 4)
    val byDoc = frames.groupBy("doc_id").count()
      .join(Multimodal.extractMeta(media).select(col("doc_id"), col("n_frames")), Seq("doc_id"))
      .withColumn("expected", ceil(col("n_frames") / 4.0))
      .filter(col("count") =!= col("expected"))
    assert(byDoc.count() == 0)
    // deterministic: same input -> same hashes
    val a = frames.orderBy("doc_id", "frame_idx").as[(Long, Long, Long)].collect().toSeq
    val b = Multimodal.sampleFrames(media, everyN = 4)
      .orderBy("doc_id", "frame_idx").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("extractFeatures produces dense vectors consumable by Similarity") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, Sf0001))
    val feats = Multimodal.extractFeatures(media, dim = 16)
    assert(feats.select(size(col("embedding"))).distinct().as[Int].head() == 16)
    val top = graft.operators.Similarity.bruteForceTopK(feats, Seq(0L), 3).collect()
    assert(top.length == 3)
  }
}
