package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Link-graph centrality for corpus curation — the PageRank importance
  * signal web-corpus pipelines use to weight or filter crawled documents
  * (CCNet/RefinedWeb curate Common Crawl with graph centrality; Page et
  * al. 1999). The reference has no graph operator; this is charter
  * surface for the 100 TB pipeline, composing with [[Components]] (which
  * gives connectivity; this gives importance WITHIN a component).
  *
  * FIXED-POINT INTEGER arithmetic throughout: ranks are BIGINT micro-units
  * of `scale`, contributions are integer divisions, and the damping mix is
  * rational (dampNum/100). Floating-point PageRank is order-dependent
  * (double sums across partitions), so two runs of the same build can rank
  * documents differently at the margin; the integer form is EXACTLY
  * reproducible on any cluster, any partitioning, any engine — the same
  * reproducible-build property the rest of the gate relies on (and why
  * the oracle can hash-compare bitwise). The cost is ≤1 micro-unit of
  * floor-division leak per node per iteration, bounded and spec-pinned.
  *
  * Scale shape per iteration: ONE equi-join of edges against the rank
  * frame on src (broadcastable degree side rides the same join), ONE
  * hash aggregate on dst for the incoming sums, one keyless aggregate for
  * the dangling mass (a 1-row broadcast), and the node-frame left join to
  * apply the affine update — all co-keyed on node id, so a pre-partitioned
  * edge list reuses its exchange across iterations. The driver holds only
  * N and the iteration count; production loops with `localCheckpoint`
  * every few iterations to truncate lineage.
  */
object Centrality {

  /** `iterations` rounds of fixed-point PageRank over `edges` (src, dst —
    * deduped, self-loops dropped by the caller) on the node set `nodes`
    * (single column `id`; isolated and dangling nodes participate).
    * Returns (id, rank_micro, rank) with rank_micro in units of 1/scale
    * and rank its double rendering rounded to 9 (one deterministic
    * division per row — the only float op anywhere). */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 3,
               dampNum: Long = 85L, scale: Long = 1000000000L,
               nKnown: Option[Long] = None): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100)
    // Iterative algorithm ⇒ MATERIALIZE, don't unroll: without the eager
    // checkpoints each iteration's rank frame is re-planned by its three
    // consumers (contrib join, dangling aggregate, node join) — a 3^k
    // subtree blowup that re-scanned the source 57× at k=3 in the first
    // draft's executed plan. Checkpointed, every iteration reads the edge
    // list and the previous ranks exactly once (the GraphX cache
    // discipline); the superseded iteration's blocks are unpersisted as
    // soon as the next is materialized.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val n = nKnown.getOrElse(nodes.count())
    require(n > 0, "empty node set")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val base = (100L - dampNum) * scale / (100L * n)
    def rdd(df: DataFrame) =
      org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(df)
    var rank = nodes.select(col("id"), lit(scale / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val withDeg = rank.join(deg, rank("id") === deg("src"), "left")
        .select(col("id"), col("rank"), col("deg"))
      // incoming mass: per-edge integer share, summed exactly (longs)
      val contrib = e.join(withDeg.filter(col("deg").isNotNull),
          e("src") === withDeg("id"))
        .select(col("dst").as("id"), expr("rank div deg").as("share"))
        .groupBy("id").agg(sum("share").as("insum"))
      // dangling mass (nodes with no out-edge) — one 1-row broadcast
      val dang = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      val prev = rank
      rank = nodes.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          (lit(base) + expr(
            s"($dampNum * (coalesce(insum, 0L) + (dang div $n))) div 100")
          ).as("rank"))
        .localCheckpoint(true)
      rdd(prev).foreach(_.unpersist(blocking = false))
    }
    // the final rank frame is materialized — release the loop inputs
    // (leaving them cached would leak edge-list-sized blocks per call)
    rdd(e).foreach(_.unpersist(blocking = false))
    rdd(deg).foreach(_.unpersist(blocking = false))
    // double rendering by ONE IEEE multiply (no rounding function — both
    // engines produce identical bits for long × the same double constant)
    rank.select(col("id"), col("rank").as("rank_micro"),
      (col("rank").cast("double") * lit(1.0 / scale)).as("rank"))
  }

  /** Personalized (seed-set) PageRank — the topical-expansion variant
    * (Haveliwala 2002): teleport mass returns only to `seeds`, so rank
    * measures proximity to the seed set rather than global importance.
    * This is the "grow a domain corpus from a few trusted documents"
    * primitive (seed-based bootstrapping à la curated-crawl pipelines).
    * Same fixed-point integer arithmetic and checkpoint discipline as
    * [[pageRank]]; dangling mass teleports back to the seeds (the
    * standard PPR convention — mass never leaks to off-topic nodes).
    * Non-seed nodes with no incoming mass rank exactly 0 and keep the
    * output sparse-ish under top-k consumption. */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame,
                           seeds: DataFrame, iterations: Int = 3,
                           dampNum: Long = 85L,
                           scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= 100)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val s = seeds.select(col("id")).distinct().localCheckpoint(true)
    val nSeeds = s.count()
    require(nSeeds > 0, "empty seed set")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val seedBase = (100L - dampNum) * scale / (100L * nSeeds)
    def rdd(df: DataFrame) =
      org.apache.spark.sql.graft.DatasetInternals.checkpointedRdd(df)
    val seeded = nodes.select(col("id"))
      .join(s.withColumn("is_seed", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)
    var rank = seeded
      .select(col("id"),
        when(col("is_seed"), lit(scale / nSeeds)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val withDeg = rank.join(deg, rank("id") === deg("src"), "left")
        .select(col("id"), col("rank"), col("deg"))
      val contrib = e.join(withDeg.filter(col("deg").isNotNull),
          e("src") === withDeg("id"))
        .select(col("dst").as("id"), expr("rank div deg").as("share"))
        .groupBy("id").agg(sum("share").as("insum"))
      val dang = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0L)).as("dang"))
      val prev = rank
      rank = seeded
        .join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          (expr(s"($dampNum * coalesce(insum, 0L)) div 100") +
           when(col("is_seed"),
             lit(seedBase) + expr(s"($dampNum * (dang div $nSeeds)) div 100"))
             .otherwise(lit(0L))).as("rank"))
        .localCheckpoint(true)
      rdd(prev).foreach(_.unpersist(blocking = false))
    }
    Seq(e, s, deg, seeded).foreach(df =>
      rdd(df).foreach(_.unpersist(blocking = false)))
    rank.select(col("id"), col("rank").as("rank_micro"),
      (col("rank").cast("double") * lit(1.0 / scale)).as("rank"))
  }

  // ---- gate form: deterministic citation graph over documents --------------

  /** Deterministic pseudo-random link fixture: doc i cites (7i+1) mod N
    * (a bijection — keeps the graph connected-ish) and (i²+3) mod N (a
    * quadratic map, so in-degrees VARY: some docs are cited twice, some
    * never — a regular graph would make PageRank uniform and the gate
    * vacuous). doc_ids are contiguous 0..N−1 in the testdata; self-loops
    * dropped, deduped. Fixture-only arithmetic (i² needs i < 3e9). */
  private[graft] def docEdges(docs: DataFrame, n: Long): DataFrame = {
    val ids = docs.select(col("doc_id").as("src"))
    ids.select(col("src"), pmod(col("src") * 7 + 1, lit(n)).as("dst"))
      .unionByName(ids.select(col("src"),
        pmod(col("src") * col("src") + 3, lit(n)).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  val GateIterations = 3

  def docPageRank(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nodes = docs.select(col("doc_id").as("id"))
    val n = docs.count() // shared by the fixture and the rank init
    pageRank(nodes, docEdges(docs, n), GateIterations, nKnown = Some(n))
      .orderBy(col("rank_micro").desc, col("id"))
  }

  /** Gate seed predicate: every 97th doc (deterministic, ~1% of corpus). */
  val GateSeedMod = 97L

  def docPprGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nodes = docs.select(col("doc_id").as("id"))
    personalizedPageRank(nodes, docEdges(docs, docs.count()),
      nodes.filter(pmod(col("id"), lit(GateSeedMod)) === 0L), GateIterations)
      .orderBy(col("rank_micro").desc, col("id"))
  }

  /** The CTE prefix of [[docPageRankSql]] (nn/e/deg/r0..rK) — exposed so
    * composition oracles (e.g. centrality-weighted sampling) can extend
    * the SAME generated update rule with their own final select. */
  def docPageRankCtes(iterations: Int = GateIterations,
                      dampNum: Long = 85L, scale: Long = 1000000000L): String = {
    val iters = (1 to iterations).map { i =>
      val p = s"r${i - 1}"
      s""",
         |c$i AS (SELECT e.dst AS id, CAST(SUM($p.rank // deg.deg) AS BIGINT) AS insum
         |  FROM e JOIN $p ON e.src = $p.id JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst),
         |d$i AS (SELECT CAST(COALESCE(SUM($p.rank), 0) AS BIGINT) AS dang
         |  FROM $p LEFT JOIN deg ON $p.id = deg.src WHERE deg.src IS NULL),
         |r$i AS (SELECT $p.id,
         |    CAST((SELECT CAST(100 - $dampNum AS BIGINT) * $scale // (100 * n) FROM nn)
         |    + ($dampNum * (COALESCE(c$i.insum, 0) + (SELECT dang // n FROM d$i, nn))) // 100 AS BIGINT) AS rank
         |  FROM $p LEFT JOIN c$i ON $p.id = c$i.id)""".stripMargin
    }.mkString
    s"""WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |e AS (SELECT DISTINCT src, dst FROM (
       |  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * doc_id + 3) % (SELECT n FROM nn) FROM documents)
       |  WHERE src <> dst),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT doc_id AS id, (SELECT $scale // n FROM nn) AS rank FROM documents)$iters""".stripMargin
  }

  /** DuckDB oracle with the SAME integer arithmetic, iterations unrolled —
    * generated so the update rule exists once per engine, symmetrically. */
  def docPageRankSql(iterations: Int = GateIterations,
                     dampNum: Long = 85L, scale: Long = 1000000000L): String =
    s"""${docPageRankCtes(iterations, dampNum, scale)}
       |SELECT id, rank AS rank_micro,
       |  rank * ${1.0 / scale} AS rank
       |FROM r$iterations ORDER BY rank_micro DESC, id""".stripMargin

  /** DuckDB oracle for [[docPprGate]] — same unrolled integer update with
    * seed-only teleport (dangling mass returns to the seeds). */
  def docPprSql(iterations: Int = GateIterations, dampNum: Long = 85L,
                scale: Long = 1000000000L): String = {
    val iters = (1 to iterations).map { i =>
      val p = s"r${i - 1}"
      s""",
         |c$i AS (SELECT e.dst AS id, CAST(SUM($p.rank // deg.deg) AS BIGINT) AS insum
         |  FROM e JOIN $p ON e.src = $p.id JOIN deg ON e.src = deg.src
         |  GROUP BY e.dst),
         |d$i AS (SELECT CAST(COALESCE(SUM($p.rank), 0) AS BIGINT) AS dang
         |  FROM $p LEFT JOIN deg ON $p.id = deg.src WHERE deg.src IS NULL),
         |r$i AS (SELECT $p.id,
         |    CAST(($dampNum * COALESCE(c$i.insum, 0)) // 100
         |    + CASE WHEN $p.id % $GateSeedMod = 0 THEN
         |        (SELECT CAST(100 - $dampNum AS BIGINT) * $scale // (100 * n) FROM ns)
         |        + ($dampNum * (SELECT dang // n FROM d$i, ns)) // 100
         |      ELSE 0 END AS BIGINT) AS rank
         |  FROM $p LEFT JOIN c$i ON $p.id = c$i.id)""".stripMargin
    }.mkString
    s"""WITH nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
       |  WHERE doc_id % $GateSeedMod = 0),
       |e AS (SELECT DISTINCT src, dst FROM (
       |  SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id * doc_id + 3) % (SELECT n FROM nn) FROM documents)
       |  WHERE src <> dst),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT doc_id AS id,
       |  CASE WHEN doc_id % $GateSeedMod = 0 THEN (SELECT $scale // n FROM ns)
       |       ELSE 0 END AS rank FROM documents)$iters
       |SELECT id, rank AS rank_micro,
       |  rank * ${1.0 / scale} AS rank
       |FROM r$iterations ORDER BY rank_micro DESC, id""".stripMargin
  }
}
