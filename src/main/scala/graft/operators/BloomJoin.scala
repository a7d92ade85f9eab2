package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomMightContain, BloomOps, ColumnBridge}
import graft.Tables

/** Bloom-pruned join: build a fixed-size Bloom filter over the build side's
  * join keys (one distributed aggregation — bit-OR is commutative and
  * associative, so it partial-aggregates map-side), broadcast the single
  * filter row, pre-filter the probe side with [[BloomMightContain]], then run
  * the exact join on the survivors.
  *
  * This is the scale story Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) implements for
  * selective broadcast joins, made explicit and guaranteed: at 100 TB the
  * build side may be far too large to broadcast as rows, but its Bloom
  * filter is FIXED-SIZE (here 1 Mbit = 128 KB regardless of key count), so
  * the probe side — the petabyte side — drops non-matching rows at the scan,
  * before the shuffle. A false-positive rate of p only costs p extra shuffle
  * volume; correctness is unaffected because the exact join still runs
  * (Bloom filters have no false negatives — BloomJoinSpec pins this).
  */
object BloomJoin {

  /** Word-packed filter bits as a product-encoded buffer (UnsafeArrayData on
    * the wire — no kryo; see TopK.TopKBuf for the measured rationale). */
  case class BloomBuf(bits: Array[Long])

  /** Builds an m-bit / k-probe Bloom filter from 64-bit key hashes. */
  class BloomAgg(numBits: Int, numHashes: Int) extends Aggregator[Long, BloomBuf, BloomBuf] {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a positive multiple of 64")

    override def zero: BloomBuf = BloomBuf(new Array[Long](numBits / 64))

    override def reduce(b: BloomBuf, hash: Long): BloomBuf = {
      var i = 0
      while (i < numHashes) {
        val idx = BloomOps.probeIndex(hash, i, numBits.toLong)
        b.bits((idx >>> 6).toInt) |= 1L << (idx & 63L)
        i += 1
      }
      b
    }

    override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
      var i = 0
      while (i < a.bits.length) { a.bits(i) |= b.bits(i); i += 1 }
      a
    }

    override def finish(r: BloomBuf): BloomBuf = r
    override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
    override def outputEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  }

  /** Standard Bloom sizing: bits and probe count for an expected key count
    * and target false-positive rate (m = -n·ln p / ln²2 rounded up to a
    * 64-bit word, k = m/n·ln 2). At 100 TB the build-side key count comes
    * from table stats or a first-pass count; fpp trades shuffle volume
    * (p extra probe rows survive) against filter size — 1e-2 keeps the
    * filter ~10 bits/key. */
  def sizedFor(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    // clamp in double BEFORE the long conversion (a huge expectedKeys·ln p
    // would overflow the toLong), and cap at 2^30 bits (128 MB, word-
    // aligned — Int.MaxValue/2 is NOT a multiple of 64 and would fail
    // BloomAgg's alignment require)
    val mRaw = math.min(-expectedKeys.toDouble * math.log(fpp) / (ln2 * ln2), (1L << 30).toDouble)
    val m = (((math.ceil(mRaw).toLong + 63) / 64) * 64).min(1L << 30).toInt
    val k = math.max(1, math.round(m.toDouble / expectedKeys * ln2).toInt)
    (m, k)
  }

  /** Probe-side membership test (codegen expression, no false negatives). */
  def mightContain(bits: Column, keyHash: Column, numHashes: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bits), ColumnBridge.expression(keyHash), numHashes))

  /** Generic bloom-pruned equi-join: `probe ⋈ build` on probe(`probeKey`) =
    * build(`buildKey`), with the probe side pre-filtered through a Bloom
    * filter of build keys. Result is EXACTLY the plain join's result.
    */
  def bloomPrunedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    // the equi-join below would match across numeric widths via implicit
    // cast, but xxhash64 hashes Int and Long DIFFERENTLY — mismatched key
    // types would silently fail every membership probe (false negatives).
    // Fail loudly instead; callers cast one side.
    require(probe.schema(probeKey).dataType == build.schema(buildKey).dataType,
      s"bloomPrunedJoin key types must match exactly (xxhash64 is not " +
        s"cast-stable): $probeKey is ${probe.schema(probeKey).dataType}, " +
        s"$buildKey is ${build.schema(buildKey).dataType}")
    val bloomUdaf = udaf(new BloomAgg(numBits, numHashes), Encoders.scalaLong)
    val bloomRow = build.agg(bloomUdaf(xxhash64(col(buildKey))).as("graft_bloom"))
    probe.crossJoin(broadcast(bloomRow))
      .filter(mightContain(col("graft_bloom.bits"), xxhash64(col(probeKey)), numHashes))
      .drop("graft_bloom")
      .join(build, col(probeKey) === col(buildKey))
  }

  /** [[bloomPrunedJoin]] with the filter SIZED for the build side's key
    * count (from table stats or a first-pass count) instead of the fixed
    * 1-Mbit default. The fixed default quietly saturates once the build
    * side outgrows ~100k keys — FPP → 1, the filter prunes nothing, and
    * the "pruned" join degrades to the plain join plus wasted hashing
    * (measured: the round-6 ScaleBench 64× amplification). At 100 TB,
    * sizing from stats is the difference between a bloom join and a no-op.
    */
  def bloomPrunedJoinSized(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val (m, k) = sizedFor(expectedKeys, fpp)
    bloomPrunedJoin(probe, build, probeKey, buildKey, numBits = m, numHashes = k)
  }

  /** Gate query: lineitem rows of URGENT orders, summarized by return flag.
    * The orders build side is re-derived for the bloom and the join (a bare
    * pushed-filter scan — cheaper than caching at this size); the lineitem
    * probe side is scanned once and pre-filtered before its shuffle.
    */
  def urgentLineitemSummary(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val probe = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
    bloomPrunedJoin(probe, dim, "l_orderkey", "o_orderkey")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("l_returnflag")
  }

  /** The bloom is invisible to results (exact join follows), so the oracle
    * is the plain join — any bloom defect that drops a row breaks the hash
    * compare. */
  val urgentLineitemSummarySql: String =
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |ROUND(SUM(l_quantity), 2) AS sum_qty,
      |ROUND(SUM(l_extendedprice), 2) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
