package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("bloom filter has no false negatives: every build key passes the probe test") {
    val build = spark.range(0, 2000).select(col("id").as("k"))
    val agg = udaf(new BloomJoin.BloomAgg(1 << 14, 5), org.apache.spark.sql.Encoders.scalaLong)
    val bloom = build.agg(agg(xxhash64(col("k"))).as("b"))
    val tested = build.crossJoin(broadcast(bloom))
      .filter(!BloomJoin.mightContain(col("b.bits"), xxhash64(col("k")), 5))
    assert(tested.count() == 0)
  }

  test("bloom filter prunes most non-members at the sized fpp") {
    val build = spark.range(0, 2000).select(col("id").as("k"))
    val agg = udaf(new BloomJoin.BloomAgg(1 << 17, 5), org.apache.spark.sql.Encoders.scalaLong)
    val bloom = build.agg(agg(xxhash64(col("k"))).as("b"))
    // disjoint probe range: everything that passes is a false positive
    val fp = spark.range(1000000, 1020000).select(col("id").as("k"))
      .crossJoin(broadcast(bloom))
      .filter(BloomJoin.mightContain(col("b.bits"), xxhash64(col("k")), 5))
      .count()
    // 2000 keys in 131072 bits with 5 probes → fpp well under 1%
    assert(fp < 200, s"false positives: $fp / 20000")
  }

  test("bloom build is partitioning-independent (bit-OR is order-free)") {
    val keys = spark.range(0, 5000).select(col("id").as("k"))
    val agg = udaf(new BloomJoin.BloomAgg(1 << 14, 5), org.apache.spark.sql.Encoders.scalaLong)
    val a = keys.repartition(1).agg(agg(xxhash64(col("k"))).as("b"))
      .select(col("b.bits")).as[Seq[Long]].head()
    val b = keys.repartition(13).agg(agg(xxhash64(col("k"))).as("b"))
      .select(col("b.bits")).as[Seq[Long]].head()
    assert(a == b)
  }

  test("sizedFor hits the target fpp on a disjoint probe set") {
    val n = 5000L
    val (m, k) = BloomJoin.sizedFor(n, 0.01)
    assert(m % 64 == 0 && m >= 9 * n) // ln(.01)/ln²2 ≈ 9.59 bits/key at 1% fpp
    val build = spark.range(0, n).select(col("id").as("k"))
    val agg = udaf(new BloomJoin.BloomAgg(m, k), org.apache.spark.sql.Encoders.scalaLong)
    val bloom = build.agg(agg(xxhash64(col("k"))).as("b"))
    val probes = 50000L
    val fp = spark.range(1000000, 1000000 + probes).select(col("id").as("k"))
      .crossJoin(broadcast(bloom))
      .filter(BloomJoin.mightContain(col("b.bits"), xxhash64(col("k")), k))
      .count()
    assert(fp < probes * 0.03, s"fpp ${fp.toDouble / probes} vs target 0.01")
  }

  test("bloomPrunedJoin equals the plain join exactly") {
    val probe = spark.range(0, 10000)
      .select(col("id").as("pk"), (col("id") % 7).as("v"))
    val build = spark.range(0, 10000).filter(col("id") % 5 === 0)
      .select(col("id").as("bk"))
    val pruned = BloomJoin.bloomPrunedJoin(probe, build, "pk", "bk")
      .select("pk", "v").orderBy("pk").collect()
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("pk", "v").orderBy("pk").collect()
    assert(pruned.sameElements(plain))
  }
}
