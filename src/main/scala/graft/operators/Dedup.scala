package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for LLM-pipeline data curation (charter
  * north-star; SURVEY.md §7.2 step 5): exact content-hash dedup, word-shingle
  * Jaccard, MinHash signatures + LSH banding for near-dup candidate
  * generation, and 64-bit SimHash fingerprints.
  *
  * Everything is built from codegen'd built-ins (`xxhash64`, higher-order
  * functions) — no UDFs, no driver-side loops. The LSH path is the 100 TB
  * design: signatures are one narrow row per doc, banding turns the O(n²)
  * pair problem into a groupBy on band keys, and only same-bucket pairs are
  * verified with the exact Jaccard.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * representative (minimum) doc id and the duplicate count.
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Distinct-on-content filter: keeps the min-id row per content hash. */
  def dropExactDuplicates(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val groups = exactGroups(docs, textCol, idCol).select(col("keep_id").as(idCol))
    docs.join(groups, Seq(idCol), "left_semi")
  }

  /** Word k-shingles as an array column: w₀‥wₖ₋₁, w₁‥wₖ, …  Docs shorter
    * than k words contribute their whole text as a single shingle so they
    * still participate in dedup.
    */
  def wordShingles(textCol: Column, k: Int): Column = {
    val words = split(textCol, " ", -1)
    val n = size(words)
    val grams = transform(
      sequence(lit(0), n - lit(k)),
      i => concat_ws(" ", (0 until k).map(j => element_at(words, (i + lit(j + 1)).cast("int"))): _*))
    when(n >= k, grams).otherwise(array(textCol))
  }

  /** Exact Jaccard similarity of two set-valued array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** Deterministic MinHash permutation parameters: hᵢ(x) = (aᵢ·x + bᵢ) mod P
    * over the low 32 bits of xxhash64(shingle). P > 2³², aᵢ < 2³¹ keeps the
    * product inside a long. Seeded — same params every run, every executor.
    */
  private val MersennePrime = 4294967311L // smallest prime > 2^32
  def permutations(numPerm: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPerm)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
                       rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature (array<long> of length numPerm) of a shingle array.
    * One nested higher-order expression: min over shingles of each permuted
    * hash — fully codegen, no UDF.
    */
  def minhashSignature(shingles: Column, perms: Seq[(Long, Long)]): Column = {
    val hashes = transform(shingles, s => pmod(xxhash64(s), lit(1L << 32)))
    val permArr = array(perms.map { case (a, b) => struct(lit(a).as("a"), lit(b).as("b")) }: _*)
    transform(permArr, p =>
      array_min(transform(hashes, x =>
        pmod(p.getField("a") * x + p.getField("b"), lit(MersennePrime)))))
  }

  /** docs → (id, shingles, sig). The narrow signature frame that feeds LSH. */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        numPerm: Int = 64, shingleK: Int = 3): DataFrame =
    docs.select(
      col(idCol),
      wordShingles(col(textCol), shingleK).as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), permutations(numPerm)))

  /** LSH banding: split the signature into `bands` bands of numPerm/bands
    * rows each; the band key is the hash of the slice. Same band key in any
    * band ⇒ candidate pair. Returns (band_idx, band_key, id) — grouping by
    * (band_idx, band_key) buckets the corpus.
    */
  def lshBands(sigs: DataFrame, idCol: String, numPerm: Int, bands: Int): DataFrame = {
    val rows = numPerm / bands
    val bandCols = (0 until bands).map { bi =>
      struct(lit(bi).as("band_idx"),
        xxhash64(concat_ws(",", (0 until rows).map(ri =>
          element_at(col("sig"), bi * rows + ri + 1)): _*)).as("band_key"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_key"))
  }

  /** Candidate pairs (id_a < id_b) that collide in at least one LSH band. */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
                        numPerm: Int, bands: Int): DataFrame = {
    val b = lshBands(sigs, idCol, numPerm, bands)
    val left = b.select(col("band_idx"), col("band_key"), col(idCol).as("id_a"))
    val right = b.select(col("band_idx"), col("band_key"), col(idCol).as("id_b"))
    left.join(right, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates verified with exact shingle
    * Jaccard ≥ threshold. The only joins are (a) band-key equi-joins and
    * (b) two id equi-joins to re-attach shingles — no cross product anywhere.
    */
  def nearDuplicatePairs(docs: DataFrame, textCol: String, idCol: String,
                         threshold: Double, numPerm: Int = 64, bands: Int = 16,
                         shingleK: Int = 3): DataFrame = {
    val sigs = minhashSignatures(docs, textCol, idCol, numPerm, shingleK)
    val cands = lshCandidatePairs(sigs, idCol, numPerm, bands)
    val sh = sigs.select(col(idCol), col("shingles"))
    cands
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("shingles", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("shingles", "sh_b"), Seq("id_b"))
      .withColumn("jaccard", round(jaccard(array_distinct(col("sh_a")), array_distinct(col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word tokens: bit i is set iff the sum over tokens
    * of ±1 (sign of bit i of xxhash64(token)) is ≥ 0. Near-dups have small
    * Hamming distance. Single pass over the tokens: the aggregate buffer is
    * the 64 per-bit counters; the finish step packs signs into one long.
    * Pure HOF expression (call_function for column-valued shift amounts).
    */
  def simhash(textCol: Column): Column = {
    val tokens = split(textCol, " ", -1)
    val hashes = transform(tokens, t => xxhash64(t))
    val bitIdx = sequence(lit(0), lit(63))
    aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bitIdx, (c, i) =>
        c + call_function("shiftright", h, i).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)),
      acc => aggregate(
        zip_with(acc, bitIdx, (c, i) =>
          when(c >= 0L, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
        lit(0L),
        (s, x) => s + x))
  }

  /** Hamming distance between two simhash longs (popcount of xor). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
