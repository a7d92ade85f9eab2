package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing.{h60, h60Sql}

/** Deterministic sampling / splitting / packing for training-data pipelines.
  *
  * All three operators key on the portable content hash [[h60]] of the
  * document id plus a purpose-specific salt, so:
  *  - assignments are STABLE: re-running the pipeline (or backfilling one
  *    partition of a 100 TB corpus) re-derives the identical split — no
  *    stored assignment table, no RNG state, no `rand()` (which is
  *    task-retry-unstable in Spark);
  *  - every operator is a narrow map (split) or a single keyed window
  *    (sample/pack) — no driver-side state, nothing collected.
  *
  * Salts keep the purposes independent: a doc's split bucket says nothing
  * about its sample rank (`:split` vs `:sample` streams are uncorrelated).
  */
object Sampling {

  /** 80/10/10 train/val/test assignment by hashed id. Stratification comes
    * free: the hash is independent of `source`/`lang`, so every stratum
    * splits ~80/10/10 (SamplingSpec pins per-source proportions). Purely
    * narrow — at 100 TB this is a zero-shuffle projection that fuses into
    * whatever scan follows it.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    // gate-sorted at the base scan (narrow pipeline) — see Tables.documentsById
    splitAssignOf(Tables.documentsById(spark, dir))

  /** The transform alone — stateless, streaming-safe (PrepStreamSpec). */
  def splitAssignOf(docs: DataFrame): DataFrame = {
    val b = pmod(h60(concat(col("doc_id").cast("string"), lit(":split"))), lit(100))
    docs.select(col("doc_id"), col("source"),
      when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
  }

  val splitAssignSql: String =
    s"""SELECT doc_id, source,
       |CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT doc_id, source,
       |      ${h60Sql("doc_id::VARCHAR || ':split'")} % 100 AS b FROM documents) t
       |ORDER BY doc_id""".stripMargin

  /** LEAKAGE-SAFE split: assign by hashed duplicate-CLUSTER id, not doc id.
    * [[splitAssignOf]] on a near-dup corpus leaks — two near-identical docs
    * hash independently, so ~1−(0.8²+0.1²+0.1²) ≈ 34% of near-dup pairs
    * straddle splits and the test set contains soft copies of training
    * docs. Hashing the component label (the cluster's min doc id, from
    * [[Components.componentLabels]]) sends every transitive duplicate
    * cluster to ONE split; singletons (component = own id) degenerate to
    * exactly [[splitAssignOf]]'s assignment stream (`:split` salt kept for
    * that reason). At 100 TB the labels are already materialized by the
    * dedup pass — this is then a narrow map over its output, same
    * zero-shuffle profile as the plain split.
    */
  def splitLeakageSafeOf(labels: DataFrame): DataFrame = {
    val b = pmod(h60(concat(col("component").cast("string"), lit(":split"))), lit(100))
    labels.select(col("doc_id"), col("component"),
      when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"))
  }

  /** Deterministic k-per-group sample: rank docs within each source by
    * hashed id and keep the first k. Equivalent to a uniform random sample
    * per stratum, but reproducible and mergeable (the rank-≤k property
    * survives re-partitioning; adding new docs only perturbs ranks near the
    * hash insertion points). One shuffle on `source`; the window sorts only
    * within groups. For very hot groups at 100 TB, the same contract runs as
    * a bounded [[TopK.TopKAgg]]-style aggregator (k smallest hashes) — the
    * window form is the readable default.
    */
  def samplePerSource(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        h60(concat(col("doc_id").cast("string"), lit(":sample"))).as("hk"))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select("source", "doc_id", "sample_rank")
      .orderBy("source", "sample_rank")
  }

  /** One (hash, id) candidate. */
  case class HashedId(hk: Long, doc_id: Long)

  /** Bounded ascending (hk, id) buffer, length ≤ k — same primitive-array
    * product-encoder shape as [[TopK.TopKBuf]]. */
  case class BottomKBuf(hks: Array[Long], ids: Array[Long])

  /** Keeps the k smallest (hk, doc_id) pairs per group — O(1) reject once
    * full, O(k) shift-insert, two-pointer merge. The aggregator counterpart
    * of the sample window: map-side combinable, so a hot group ships
    * partitions × k pairs instead of funneling every row into one window
    * task. */
  class BottomKAgg(k: Int) extends org.apache.spark.sql.expressions.Aggregator[HashedId, BottomKBuf, BottomKBuf] {
    private def less(h1: Long, i1: Long, h2: Long, i2: Long): Boolean =
      h1 < h2 || (h1 == h2 && i1 < i2)

    override def zero: BottomKBuf = BottomKBuf(Array.emptyLongArray, Array.emptyLongArray)

    override def reduce(b: BottomKBuf, x: HashedId): BottomKBuf = {
      val n = b.hks.length
      if (k == 0) b
      else if (n == k && !less(x.hk, x.doc_id, b.hks(n - 1), b.ids(n - 1))) b
      else {
        var pos = n
        while (pos > 0 && less(x.hk, x.doc_id, b.hks(pos - 1), b.ids(pos - 1))) pos -= 1
        val m = math.min(n + 1, k)
        val hks = new Array[Long](m); val ids = new Array[Long](m)
        System.arraycopy(b.hks, 0, hks, 0, pos)
        System.arraycopy(b.ids, 0, ids, 0, pos)
        hks(pos) = x.hk; ids(pos) = x.doc_id
        val tail = m - pos - 1
        if (tail > 0) {
          System.arraycopy(b.hks, pos, hks, pos + 1, tail)
          System.arraycopy(b.ids, pos, ids, pos + 1, tail)
        }
        BottomKBuf(hks, ids)
      }
    }

    override def merge(a: BottomKBuf, b: BottomKBuf): BottomKBuf = {
      if (b.hks.isEmpty) return a
      if (a.hks.isEmpty) return b
      val m = math.min(a.hks.length + b.hks.length, k)
      val hks = new Array[Long](m); val ids = new Array[Long](m)
      var ia = 0; var ib = 0; var o = 0
      while (o < m) {
        val takeA = ib >= b.hks.length ||
          (ia < a.hks.length && less(a.hks(ia), a.ids(ia), b.hks(ib), b.ids(ib)))
        if (takeA) { hks(o) = a.hks(ia); ids(o) = a.ids(ia); ia += 1 }
        else { hks(o) = b.hks(ib); ids(o) = b.ids(ib); ib += 1 }
        o += 1
      }
      BottomKBuf(hks, ids)
    }

    override def finish(r: BottomKBuf): BottomKBuf = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[BottomKBuf] =
      org.apache.spark.sql.Encoders.product[BottomKBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[BottomKBuf] =
      org.apache.spark.sql.Encoders.product[BottomKBuf]
  }

  /** [[samplePerSource]] via the bounded aggregator — identical contract
    * and oracle (the buffer's ascending position IS the sample rank), hot-
    * group-safe: partial buffers combine map-side before the group shuffle.
    */
  def samplePerSourceAgg(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val bk = udaf(new BottomKAgg(k), org.apache.spark.sql.Encoders.product[HashedId])
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        h60(concat(col("doc_id").cast("string"), lit(":sample"))).as("hk"))
      .groupBy(col("source"))
      .agg(bk(col("hk"), col("doc_id")).as("s"))
      .select(col("source"), posexplode(arrays_zip(col("s.hks"), col("s.ids"))).as(Seq("pos", "z")))
      .select(col("source"), col("z.ids").as("doc_id"),
        (col("pos") + 1).cast("long").as("sample_rank"))
      .orderBy("source", "sample_rank")
  }

  val samplePerSourceSql: String =
    s"""SELECT source, doc_id, sample_rank FROM (
       |  SELECT source, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY ${h60Sql("doc_id::VARCHAR || ':sample'")}, doc_id) AS sample_rank
       |  FROM documents) t
       |WHERE sample_rank <= 20 ORDER BY source, sample_rank""".stripMargin

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis–Spirakis
    * A-ES): each doc races with key `ln(u)/w` — `u` hash-uniform in (0,1],
    * `w` its token count — and the n largest keys win, which makes
    * inclusion probability proportional to token MASS, not doc count (the
    * corpus-mixing primitive: "give me ~n docs sampled by token budget").
    * RNG-free like [[splitAssign]]: the race key is re-derived per row from
    * [[h60]], so task retries and backfills reproduce the identical sample.
    *
    * Plan shape at 100 TB: narrow projection → TakeOrderedAndProject(n) —
    * no corpus-wide sort or window; each partition ships only its local
    * top-n. The rank window afterwards orders the n survivors (bounded by
    * construction). Key rounded to 4 (repo float rule) with doc_id
    * tie-break so the DuckDB oracle is exact.
    */
  def sampleWeighted(spark: SparkSession, dir: String, n: Int = 50): DataFrame =
    sampleWeightedOf(Tables.documents(spark, dir), n)

  /** The per-doc race keys (source, doc_id, n_tokens, wkey) — shared by
    * the batch sample and the streaming reservoir
    * ([[graft.streaming.ReservoirStream]]): a doc's key is a pure function
    * of its id and token count, which is what makes the streaming fold
    * equal the batch sample under ANY batch split or arrival order. */
  def weightedRaceKeys(docs: DataFrame): DataFrame = {
    val twoTo60 = 1152921504606846976.0 // 2^60, exactly representable
    docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .withColumn("wkey", round(
        log((h60(concat(col("doc_id").cast("string"), lit(":wsample"))) + 1).cast("double")
          / lit(twoTo60)) / col("n_tokens").cast("double"), 4))
  }

  /** Global top-n of a race-key frame, ranked — the shared tail of the
    * batch sample and the reservoir's queryable view. */
  def raceTopN(keys: DataFrame, n: Int): DataFrame =
    keys
      .orderBy(col("wkey").desc, col("doc_id"))
      .limit(n)
      .withColumn("sample_rank", row_number().over(
        Window.orderBy(col("wkey").desc, col("doc_id"))).cast("long"))
      .select("source", "doc_id", "n_tokens", "sample_rank")

  /** The transform alone — see [[sampleWeighted]]. */
  def sampleWeightedOf(docs: DataFrame, n: Int = 50): DataFrame =
    raceTopN(weightedRaceKeys(docs), n)

  /** Per-source weighted sample: k docs per source, token-mass-proportional
    * WITHIN each source — the mixture-building shape ("each source
    * contributes k docs, drawn by token budget"). Same race keys as
    * [[sampleWeighted]], ranked per group; one shuffle on `source`. For a
    * hot group, the same contract runs as a [[BottomKAgg]]-style bounded
    * aggregator over the order-preserving long bits of `-wkey` (positive
    * doubles compare identically as raw bits) — the window form is the
    * readable default, as with [[samplePerSource]].
    */
  def sampleWeightedPerSource(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    weightedRaceKeys(Tables.documents(spark, dir))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("wkey").desc, col("doc_id")))
        .cast("long"))
      .filter(col("sample_rank") <= k)
      .select("source", "doc_id", "n_tokens", "sample_rank")
      .orderBy("source", "sample_rank")

  val sampleWeightedPerSourceSql: String =
    s"""SELECT source, doc_id, n_tokens, sample_rank FROM (
       |  SELECT source, doc_id, n_tokens,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY wkey DESC, doc_id)
       |      AS sample_rank
       |  FROM (SELECT source, doc_id,
       |          CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
       |          ROUND(LN((${h60Sql("doc_id::VARCHAR || ':wsample'")} + 1)::DOUBLE
       |            / 1152921504606846976.0)
       |            / LEN(STR_SPLIT(text, ' ')), 4) AS wkey
       |        FROM documents) t) s
       |WHERE sample_rank <= 10 ORDER BY source, sample_rank""".stripMargin

  val sampleWeightedSql: String =
    s"""SELECT source, doc_id, n_tokens, sample_rank FROM (
       |  SELECT source, doc_id, n_tokens,
       |    ROW_NUMBER() OVER (ORDER BY wkey DESC, doc_id) AS sample_rank
       |  FROM (SELECT source, doc_id,
       |          CAST(LEN(STR_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
       |          ROUND(LN((${h60Sql("doc_id::VARCHAR || ':wsample'")} + 1)::DOUBLE
       |            / 1152921504606846976.0)
       |            / LEN(STR_SPLIT(text, ' ')), 4) AS wkey
       |        FROM documents) t) s
       |WHERE sample_rank <= 50 ORDER BY sample_rank""".stripMargin

  /** Centrality-weighted sample — the [[sampleWeighted]] A-ES race with
    * PageRank mass as the weight instead of token count: "sample ~n docs
    * proportional to graph importance", the curated-crawl shape (weight
    * what the link graph endorses, not what is merely long). Closes the
    * Centrality→Sampling loop end-to-end under one oracle: the race key is
    * `ln(u) / rank` with `rank = rank_micro × 1e-9` (the double rendering —
    * dividing by the raw micro-units would collapse every key to 0.0000
    * under the repo's round-4 float rule; the constant rescale preserves
    * the A-ES ordering exactly). Zero-rank docs (unreachable under PPR
    * semantics; impossible here where base mass is global, but the guard
    * keeps the composition safe for any rank source) are excluded — a
    * zero-weight doc must never win. Same RNG-free determinism and
    * TakeOrdered(n) plan shape as [[sampleWeighted]]. */
  def sampleByCentrality(spark: SparkSession, dir: String, n: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nodes = docs.select(col("doc_id").as("id"))
    val nDocs = docs.count()
    sampleByCentralityOf(
      Centrality.pageRank(nodes, Centrality.docEdges(docs, nDocs),
          Centrality.GateIterations, nKnown = Some(nDocs))
        .select(col("id").as("doc_id"), col("rank_micro")), n)
  }

  /** The race alone, over any (doc_id, rank_micro) weight frame. */
  def sampleByCentralityOf(pr: DataFrame, n: Int): DataFrame = {
    val twoTo60 = 1152921504606846976.0 // 2^60, exactly representable
    val keys = pr.filter(col("rank_micro") > 0L)
      .withColumn("wkey", round(
        log((h60(concat(col("doc_id").cast("string"), lit(":csample"))) + 1).cast("double")
          / lit(twoTo60))
          / (col("rank_micro").cast("double") * lit(1e-9)), 4))
    keys
      .orderBy(col("wkey").desc, col("doc_id"))
      .limit(n)
      .withColumn("sample_rank", row_number().over(
        Window.orderBy(col("wkey").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "rank_micro", "sample_rank")
  }

  def sampleByCentralitySql(n: Int = 50): String =
    s"""${Centrality.docPageRankCtes()},
       |pr AS (SELECT id AS doc_id, rank AS rank_micro
       |       FROM r${Centrality.GateIterations} WHERE rank > 0),
       |ck AS (SELECT doc_id, rank_micro,
       |         ROUND(LN((${h60Sql("doc_id::VARCHAR || ':csample'")} + 1)::DOUBLE
       |           / 1152921504606846976.0)
       |           / (rank_micro * 1e-9), 4) AS wkey
       |       FROM pr)
       |SELECT doc_id, rank_micro, sample_rank FROM (
       |  SELECT doc_id, rank_micro,
       |    ROW_NUMBER() OVER (ORDER BY wkey DESC, doc_id) AS sample_rank
       |  FROM ck) s
       |WHERE sample_rank <= $n ORDER BY sample_rank""".stripMargin

  /** Contiguous token-budget packing: docs ordered by id within each source,
    * pack boundary every `budget` tokens of running sum (a doc straddling a
    * boundary joins the pack its first token falls in, so packs can overrun
    * by at most one doc — the standard streaming-packer relaxation).
    *
    * This is the prefix-sum formulation: one shuffle+sort on `source`, no
    * sequential driver state — exact greedy packing ("reset when the NEXT
    * doc would overflow") needs running state per group and would run as
    * `flatMapGroups`, breaking codegen and map-side combine for a marginal
    * packing-density gain.
    */
  def packBlocks(spark: SparkSession, dir: String, budget: Int = 500): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .withColumn("run", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("run") - col("n_tokens")) / lit(budget.toDouble)).cast("long"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy("source", "pack_id")
  }

  /** EXACT greedy packing — the sequential-state escape hatch for the
    * semantics [[packBlocks]] relaxes: a doc opens a new pack iff adding it
    * would exceed the budget, so no pack ever overruns (docs larger than
    * the budget sit alone). Running state per group is not expressible as
    * a window; `flatMapSortedGroups` is the right Spark shape — one
    * shuffle on `source`, iterators arrive doc_id-sorted WITHOUT a
    * per-group sort buffer (the sort rides the exchange), and the fold is
    * O(1) state per group. This is the (c)-tier custom-operator path the
    * charter reserves for genuinely-sequential semantics; the DuckDB
    * oracle replicates the fold with a recursive CTE.
    */
  def packGreedy(spark: SparkSession, dir: String, budget: Int = 500): DataFrame =
    packGreedyOf(Tables.documents(spark, dir), budget)

  /** The transform alone — see [[packGreedy]]; SamplingSpec drives it with
    * a repartitioned input to pin partitioning-independence. */
  def packGreedyOf(docs: DataFrame, budget: Int = 500): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (src, it) =>
        var acc = 0L; var pack = 0L; var first = true
        it.map { case (_, id, n) =>
          if (first) { first = false; acc = n }
          else if (acc + n > budget) { pack += 1L; acc = n }
          else acc += n
          (src, pack, id, n)
        }
      }
      .toDF("source", "pack_id", "doc_id", "n_tokens")
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
      .orderBy("source", "pack_id")
  }

  /** End-to-end mixture build: per-source token-mass-weighted sample
    * ([[sampleWeightedPerSource]]) → exact greedy packing ([[packGreedyOf]])
    * of the sampled docs into token-budget blocks — the "draw a training
    * mixture and shard it into sequences" composition. The sample side is
    * a bounded per-group window; the packed side sees only k·sources docs,
    * joined back by a semi-join on ids (no text column rides the sample).
    */
  def mixturePipeline(spark: SparkSession, dir: String,
                      k: Int = 10, budget: Int = 500): DataFrame = {
    val ids = sampleWeightedPerSource(spark, dir, k).select("doc_id")
    packGreedyOf(Tables.documents(spark, dir).join(ids, Seq("doc_id"), "left_semi"),
      budget)
  }

  val mixturePipelineSql: String =
    s"""WITH RECURSIVE sampled AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY wkey DESC, doc_id)
       |        AS sample_rank
       |    FROM (SELECT source, doc_id,
       |            ROUND(LN((${h60Sql("doc_id::VARCHAR || ':wsample'")} + 1)::DOUBLE
       |              / 1152921504606846976.0)
       |              / LEN(STR_SPLIT(text, ' ')), 4) AS wkey
       |          FROM documents) a) b
       |  WHERE sample_rank <= 10),
       |t AS (
       |  SELECT source, doc_id, LEN(STR_SPLIT(text, ' ')) AS n_tokens,
       |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents WHERE doc_id IN (SELECT doc_id FROM sampled)),
       |r AS (
       |  SELECT source, doc_id, n_tokens, rn, n_tokens AS acc, 0 AS pack_id
       |  FROM t WHERE rn = 1
       |  UNION ALL
       |  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
       |    CASE WHEN r.acc + t.n_tokens > 500 THEN t.n_tokens ELSE r.acc + t.n_tokens END,
       |    CASE WHEN r.acc + t.n_tokens > 500 THEN r.pack_id + 1 ELSE r.pack_id END
       |  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1)
       |SELECT source, CAST(pack_id AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
       |FROM r GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin

  val packGreedySql: String =
    """WITH RECURSIVE t AS (
      |  SELECT source, doc_id, LEN(STR_SPLIT(text, ' ')) AS n_tokens,
      |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, n_tokens, rn, n_tokens AS acc, 0 AS pack_id
      |  FROM t WHERE rn = 1
      |  UNION ALL
      |  SELECT t.source, t.doc_id, t.n_tokens, t.rn,
      |    CASE WHEN r.acc + t.n_tokens > 500 THEN t.n_tokens ELSE r.acc + t.n_tokens END,
      |    CASE WHEN r.acc + t.n_tokens > 500 THEN r.pack_id + 1 ELSE r.pack_id END
      |  FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1)
      |SELECT source, CAST(pack_id AS BIGINT) AS pack_id, COUNT(*) AS n_docs,
      |       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
      |FROM r GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin

  /** Deterministic global training-order shuffle with balanced shards —
    * the export step after curation: every epoch-defining pipeline needs
    * the corpus in a REPRODUCIBLE pseudo-random order, sharded into
    * equal-mass files (readers stream shards sequentially; within-shard
    * order is part of the contract). Order key = hashed id (`:shuffle`
    * salt, independent of the `:split`/`:wsample` hash streams), shard =
    * key mod nShards, position = rank of the key within the shard.
    *
    * Scale shape: ONE hash-partitioned exchange on shard + a
    * within-partition sort (each shard is a sort-within-file, never a
    * global sort); hash uniformity makes shard sizes even to O(√n) —
    * SamplingSpec pins the balance bound. [[writeShuffled]] materializes
    * exactly this plan via repartition(shard) + sortWithinPartitions.
    */
  def shuffledExportAssignOf(docs: DataFrame, nShards: Int = 16): DataFrame = {
    val h = h60(concat(col("doc_id").cast("string"), lit(":shuffle")))
    import org.apache.spark.sql.expressions.Window
    docs.select(col("doc_id"), h.as("hkey"),
        pmod(h, lit(nShards.toLong)).cast("int").as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("hkey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  def shuffledExportAssign(spark: SparkSession, dir: String,
                           nShards: Int = 16): DataFrame =
    shuffledExportAssignOf(Tables.documents(spark, dir), nShards)
      .orderBy("doc_id")

  def shuffledExportAssignSql(nShards: Int = 16, src: String = "documents"): String =
    s"""SELECT doc_id, shard,
       |CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS BIGINT) AS pos
       |FROM (SELECT doc_id, ${h60Sql("doc_id::VARCHAR || ':shuffle'")} AS hkey,
       |      CAST(${h60Sql("doc_id::VARCHAR || ':shuffle'")} % $nShards AS INTEGER) AS shard
       |      FROM $src) t
       |ORDER BY doc_id""".stripMargin

  /** Materialize [[shuffledExportAssignOf]]'s order: one file per shard,
    * rows in (hkey, doc_id) order — `spark.read.parquet(dir)` under
    * `shard=` partition pruning replays any shard in training order. */
  def writeShuffled(docs: DataFrame, outDir: String, nShards: Int = 16): Unit = {
    val h = h60(concat(col("doc_id").cast("string"), lit(":shuffle")))
    docs.withColumn("hkey", h)
      .withColumn("shard", pmod(col("hkey"), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      // shard LEADS the sort: the dynamic-partition writer requires rows
      // ordered by partition columns and would otherwise insert its own
      // NON-STABLE sort on shard, scrambling the in-shard order — leading
      // with shard satisfies that requirement so the (hkey, id) order
      // survives into each file (SamplingSpec pins the replay)
      .sortWithinPartitions(col("shard"), col("hkey"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }

  val packBlocksSql: String =
    """WITH t AS (SELECT source, doc_id, LEN(STR_SPLIT(text, ' ')) AS n_tokens
      |           FROM documents),
      |r AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |        ROWS UNBOUNDED PRECEDING) AS run FROM t)
      |SELECT source, CAST(FLOOR((run - n_tokens) / 500.0) AS BIGINT) AS pack_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
      |FROM r GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin
}
