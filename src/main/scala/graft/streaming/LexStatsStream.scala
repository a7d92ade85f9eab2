package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.functions.FsUtils
import graft.operators.TextAnalysis

/** Maintained lexical index — the inverted-index half of the retrieval
  * stack getting the same streamed maintenance the ANN tiers already have
  * ([[EmbeddingIndexStream]]). Document batches fold TWO state logs:
  *
  *  - `lexstats/batch=<id>` — [[TextAnalysis.lexStatsOf]] partials
  *    (per-term document frequency + ONE corpus row of token/doc totals).
  *    The sums are plain long addition over DISJOINT doc batches, so
  *    [[currentStats]] over the union corpus is BIT-IDENTICAL to the
  *    one-shot batch aggregate (spec-pinned).
  *  - `lexpost/batch=<id>/pbucket=<b>` — [[TextAnalysis.lexPostingsOf]]
  *    POSTING rows (term → doc_id, tf, dl), partitioned by term bucket so
  *    a query's read partition-prunes to its own terms' buckets. Disjoint
  *    doc batches contribute disjoint posting rows — the fold is a plain
  *    union.
  *
  * Serving ladder: [[bm25Topk]] (stats maintained, tf by corpus scan —
  * O(corpus) per query, kept as the migration form) and [[bm25TopkIndexed]]
  * (stats AND tf from the index — O(query-term postings) per query, the
  * scale path: the [[EmbeddingIndexStream]] nprobe-read treatment applied
  * to text). Both route the shared [[TextAnalysis.bm25ScoreExpr]] tree, so
  * served ≡ batch bitwise whenever the maintained state equals the
  * one-shot build (LexStatsStreamSpec pins all folds).
  *
  * Replay safety rides the [[StateLog]] discipline per log (COUNT folding
  * is not idempotent; posting re-union would double tf): each log's
  * `batch=` dir presence short-circuits a replay, compaction watermarks
  * are per-log (`foldmeta` / `foldmeta-lexpost`), interrupted temp-swaps
  * heal on access. A crash between the two logs' commits leaves one
  * committed and one not; the replay re-commits only the missing one.
  *
  * Per-batch cost: one explode→distinct→groupBy over the BATCH for stats
  * (map-side combined to batch-vocabulary rows) + one narrow HOF
  * projection and a bounded repartition-by-bucket for postings + the two
  * commit renames. Auto-compaction bounds both logs' dir counts; the
  * stats fold re-sums per term and the postings fold rewrites one file
  * per bucket — the standard segment-merge of a lexical index.
  *
  * Round 19: the index is no longer append-only — [[deleteDocs]] /
  * [[syncLexCorpus]] give it the delete/update lifecycle the vector index
  * grew in r16–18 (ceiling tombstones on postings, negative-addend
  * correction batches on stats; see the deletes section below), so the
  * whole serving ladder — ranked BM25, phrase, proximity, snippets,
  * facets — reads the LIVE corpus.
  */
object LexStatsStream {

  private def log(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "lexstats")

  private def postLog(spark: SparkSession, stateDir: String) =
    new StateLog(spark, stateDir, "lexpost", foldmetaName = "foldmeta-lexpost")

  private def emptyStats(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("term"),
      col("id").as("df"), col("id").as("dl"), col("id").as("nd"))

  private def emptyPostings(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").cast("string").as("term"),
      col("id").as("doc_id"), col("id").as("tf"), col("id").as("dl"),
      array().cast("array<int>").as("positions"),
      col("id").cast("int").as("pbucket"), col("id").as("src_batch"))

  /** Accumulated stat rows summed per term — for the union of all folded
    * batches, bit-identical to `TextAnalysis.lexStatsOf` over that union.
    * Vocabulary-sized; serving filters it to the query terms + the corpus
    * row before anything leaves the executors. */
  def currentStats(spark: SparkSession, stateDir: String): DataFrame =
    log(spark, stateDir).read(Seq("term", "df", "dl", "nd"), emptyStats(spark))
      .groupBy("term")
      .agg(sum("df").as("df"), sum("dl").as("dl"), sum("nd").as("nd"))

  /** The query terms' posting rows — partition-pruned to the terms'
    * [[TextAnalysis.termBucket]] dirs (the read opens only those buckets
    * across all batch dirs, the `cluster=` nprobe-read shape). */
  def currentPostings(spark: SparkSession, stateDir: String,
                      terms: Seq[String]): DataFrame =
    readPostings(spark, stateDir, terms,
      Seq("term", "doc_id", "tf", "dl", "pbucket"))

  /** [[currentPostings]] including the POSITIONS column (phrase reads);
    * kept separate so the BM25 path's parquet scan prunes positions away. */
  def currentPostingsWithPositions(spark: SparkSession, stateDir: String,
                                   terms: Seq[String]): DataFrame =
    readPostings(spark, stateDir, terms,
      Seq("term", "doc_id", "tf", "dl", "positions", "pbucket"))

  private def readPostings(spark: SparkSession, stateDir: String,
                           terms: Seq[String], cols: Seq[String]): DataFrame = {
    val nb = postingBuckets(spark, stateDir)
    val buckets = terms.map(TextAnalysis.termBucket(_, nb)).distinct
    val raw = postLog(spark, stateDir).readAll(emptyPostings(spark))
      .filter(col("pbucket").isin(buckets: _*) && col("term").isin(terms: _*))
    // tombstone exclusion BELOW everything the serving ladder builds on the
    // read: a deleted doc's postings (or an updated doc's superseded
    // generation) are gone the moment the tombstone batch commits, and the
    // exclusion join runs over the already-bucket-pruned candidate rows
    applyDocCeilings(raw, docTombstoneCeilings(spark, stateDir))
      .select(cols.map(col): _*)
      .drop("pbucket")
  }

  /** Highest batch id the last STATS compaction folded (−1 when never). */
  def foldedUpto(spark: SparkSession, stateDir: String): Long =
    log(spark, stateDir).foldedUpto()

  /** Distinct doc ids holding ≥ 1 posting row in the log, tombstones NOT
    * applied — the id-resolution read maintenance cascades compose (e.g.
    * [[PassageLex.deleteDocs]] resolving a parent document's chunk pids
    * before tombstoning them). Deliberately the RAW view: a cascade's
    * tombstone batch must recommit IDENTICAL content on a replay
    * (tombstoneDocRows overwrites its `batch=` dir), and a live-view
    * resolution would re-resolve EMPTY after its own first commit —
    * wiping the batch's tombstones and resurrecting every hidden pid
    * (caught by PassageLexSpec's replay test). The raw posting set only
    * shrinks at compaction's physical purge, by which point the purged
    * rows no longer need hiding. One postings scan at a one-column
    * projection (terms, positions and stats never leave the parquet
    * reader) — the same cost class as [[deleteDocs]]'s own
    * hidden-generation scan. */
  def postingDocIds(spark: SparkSession, stateDir: String): DataFrame =
    postLog(spark, stateDir).readAll(emptyPostings(spark))
      .select("doc_id").distinct()

  /** Fold one document micro-batch into both index logs. Returns true when
    * anything folded, false when the replay guards short-circuited both. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                 stateDir: String, autoCompactBatches: Int = 0): Boolean = {
    val lg = log(spark, stateDir)
    val pg = postLog(spark, stateDir)
    val statsNew = !lg.alreadyApplied(batchId)
    val postsNew = !pg.alreadyApplied(batchId)
    if (!statsNew && !postsNew) return false
    if (statsNew) {
      lg.commitBatch(TextAnalysis.lexStatsOf(batch), batchId, coalesce1 = false)
      lg.maybeAutoCompact(autoCompactBatches)(compactStats(spark, stateDir))
    }
    if (postsNew) {
      // src_batch: per-ROW ingest provenance as a data column (round 19) —
      // the `batch=` partition key carries it only until compactPostings
      // folds dirs into `batch=-1`; the data column survives the fold,
      // which is what batch-CEILING doc tombstones resolve against (update
      // = tombstone at ceiling batch−1 + same-batch re-ingest). A constant
      // column RLE-compresses to nothing. Bucketing follows the DIR's
      // count (round 20): after a rebucket, new ingests land in the
      // re-bucketed layout.
      pg.commitBatch(
        TextAnalysis.lexPostingsOf(batch, postingBuckets(spark, stateDir))
          .withColumn("src_batch", lit(batchId))
          .repartition(col("pbucket")),
        batchId, coalesce1 = false, partitionByCols = Seq("pbucket"))
      pg.maybeAutoCompact(autoCompactBatches)(compactPostings(spark, stateDir))
    }
    true
  }

  /** Fold the stats batch dirs into one `batch=-1` dir with exact summed
    * stats — the non-idempotent [[StateLog.compact]] discipline
    * (watermark first). Terms whose df cancelled to zero (every containing
    * doc deleted — the negative correction batches of [[deleteDocs]] /
    * [[syncLexCorpus]]) are dropped at fold: they contribute nothing to any
    * read, and keeping them would grow the stats table with the corpus's
    * whole historical vocabulary. */
  def compactStats(spark: SparkSession, stateDir: String): Unit =
    log(spark, stateDir).compact(
      _.groupBy("term").agg(sum("df").as("df"), sum("dl").as("dl"),
          sum("nd").as("nd"))
        .filter(col("df") =!= 0L || col("dl") =!= 0L || col("nd") =!= 0L))

  /** Fold the posting batch dirs into one `batch=-1` dir, one file per
    * bucket (the union is lossless — disjoint doc batches — but the fold
    * still watermarks: a replay of a folded batch would re-UNION its
    * rows and double tf at read). The fold PURGES tombstone-hidden
    * generations physically (surviving rows keep src_batch, so ceilings
    * stay resolvable after the per-batch dirs are gone); the tombstone
    * dirs themselves stay armed — the stats log may still hold un-folded
    * correction batches, and readers pay a no-op join in the meantime.
    * Retire via [[clearDocTombstones]] in the maintenance window. */
  def compactPostings(spark: SparkSession, stateDir: String): Unit = {
    val ceilings = docTombstoneCeilings(spark, stateDir)
    // the fold swaps the WHOLE log dir — a re-bucketed log's .bucketmeta
    // must ride into the new dir or the count would silently revert to
    // the default while the data stays re-bucketed (pruning misses)
    val nb = postingBuckets(spark, stateDir)
    postLog(spark, stateDir).compact(
      raw => applyDocCeilings(raw.drop("batch"), ceilings)
        .repartition(col("pbucket")),
      coalesce1 = false, partitionByCols = Seq("pbucket"),
      // write the meta UNCONDITIONALLY (review finding, r20 s2): the
      // earlier nb != default guard dropped a legitimately-written meta
      // equal to the current default, so a later change of the LexBuckets
      // constant would silently reinterpret the dir's rows under the new
      // default — the exact silent-term-miss class the meta prevents
      beforeSwap = tmp => writeBucketMeta(spark, tmp, nb))
  }

  /** Fold both logs. */
  def compactState(spark: SparkSession, stateDir: String): Unit = {
    compactStats(spark, stateDir)
    compactPostings(spark, stateDir)
  }

  // --- bucket-split (round 20, verdict r19 item 8) ---------------------------
  //
  // The 64-way termBucket layout is fixed at ingest; at true web vocabulary
  // each bucket's posting files grow without bound and every pruned read
  // pays bucket-bytes ∝ vocab/64. rebucketPostings is the recluster
  // analogue for text: rewrite the postings log under a new bucket count
  // (the published sizing rule from the image-ANN sweep applies here too:
  // buckets ∝ √vocab splits per-bucket bytes and dir fan-out evenly).
  // The bucket count travels INSIDE the swapped log dir (`.bucketmeta`,
  // dot-file — invisible to partition discovery) so ONE rename carries
  // data + count: a separately-committed count would open a window where
  // readers prune the new layout with the old hash — silent term misses,
  // not an error. Readers and writers both resolve the dir's count through
  // [[postingBuckets]]; a dir that has never been re-bucketed carries no
  // meta and defaults to [[TextAnalysis.LexBuckets]].

  private val BucketMetaName = ".bucketmeta"

  /** Per-JVM memo of each dir's bucket count (review finding, r20 s2):
    * the count is immutable between [[rebucketPostings]] calls (single-
    * writer maintenance contract), but every serve and ingest resolved it
    * with a swap-heal listing + an FS open — two extra driver round trips
    * per query on a remote filesystem. First resolution per dir still
    * pays the heal; the rebucket verb updates the memo inside its own
    * call, keeping it coherent for this JVM's single writer. */
  private val bucketCountMemo =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  /** The postings log's bucket count — co-located meta, else the global
    * default. Heals any interrupted rebucket swap FIRST (on the uncached
    * resolution) so the count can never be read from a half-swapped dir. */
  def postingBuckets(spark: SparkSession, stateDir: String): Int =
    bucketCountMemo.getOrElseUpdate(stateDir, {
      val pg = postLog(spark, stateDir)
      pg.recoverSwaps()
      val p = new Path(s"${pg.logPath}/$BucketMetaName")
      val fs = FsUtils.fs(spark, stateDir)
      if (!fs.exists(p)) TextAnalysis.LexBuckets
      else {
        val in = fs.open(p)
        try {
          val line = new java.io.BufferedReader(
            new java.io.InputStreamReader(in,
              java.nio.charset.StandardCharsets.UTF_8)).readLine()
          // fail with the file named, not a bare NPE/NumberFormatException
          // (review finding, r20 s2): an empty or truncated meta means the
          // dir's layout is unknowable — refuse loudly
          require(line != null && line.trim.nonEmpty,
            s"empty $BucketMetaName at $p: the postings log's bucket " +
              "count is unknowable - restore the meta (or delete it if " +
              "the dir is known to carry the default layout)")
          try line.trim.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"malformed $BucketMetaName at $p: '${line.trim}' is not a " +
                "bucket count")
          }
        } finally in.close()
      }
    })

  /** RE-BUCKET the postings log under `newBuckets` — the maintenance verb
    * that keeps per-bucket file sizes bounded as the vocabulary grows.
    * One deterministic fold (the [[compactPostings]] machinery with the
    * bucket hash swapped): tombstone-hidden generations purge on the way
    * through, the fold watermarks (a replay of a folded batch would
    * re-union under the OLD hash), and the new count commits inside the
    * same dir rename as the re-bucketed data. Requires the maintenance
    * window (single writer — same contract as every compaction here).
    * Subsequent ingests bucket by the new count ([[applyBatch]] /
    * [[syncLexCorpus]] resolve it per dir); stats are untouched (bucket
    * layout is a postings-side physical concern). */
  def rebucketPostings(spark: SparkSession, stateDir: String,
                       newBuckets: Int): Unit = {
    require(newBuckets > 0, s"newBuckets must be positive, got $newBuckets")
    val ceilings = docTombstoneCeilings(spark, stateDir)
    postLog(spark, stateDir).compact(
      raw => applyDocCeilings(raw.drop("batch"), ceilings)
        .withColumn("pbucket",
          pmod(crc32(col("term").cast("binary")), lit(newBuckets.toLong))
            .cast("int"))
        .repartition(col("pbucket")),
      coalesce1 = false, partitionByCols = Seq("pbucket"),
      beforeSwap = tmp => writeBucketMeta(spark, tmp, newBuckets),
      force = true) // a fully-compacted log must still be re-bucketable
    bucketCountMemo.put(stateDir, newBuckets) // keep the memo coherent
  }

  private def writeBucketMeta(spark: SparkSession, dir: String,
                              n: Int): Unit = {
    val fs = FsUtils.fs(spark, dir)
    val out = fs.create(new Path(s"$dir/$BucketMetaName"), true)
    try out.write(s"$n\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // --- deletes + in-place updates (round 19) --------------------------------
  //
  // A corpus churns: opt-outs and PII scrubs REMOVE documents, re-ingests
  // EDIT them — and an append-only lexical index keeps serving the stale
  // postings and inflated df/dl/nd forever (the round-18 verdict's top
  // structural gap; the vector index solved exactly this lifecycle in
  // r16–18, `EmbeddingIndexStream`). The two halves get two mechanisms:
  //
  //  - POSTINGS are per-row state, so they take the ceiling-tombstone
  //    treatment verbatim: (doc_id, ceiling) rows under `.lextomb/batch=<id>`
  //    (a dot-dir, invisible to every log's partition discovery) mean "hide
  //    this doc's posting rows ingested in batches ≤ ceiling". Readers
  //    compose the exclusion BELOW the serving ladder ([[readPostings]]),
  //    an update (tombstone at batch−1 + same-batch re-ingest) leaves the
  //    fresh generation visible, and [[compactPostings]] purges hidden
  //    generations physically at fold.
  //  - STATS are an ADDITIVE aggregate (df/dl/nd sums), so deletes are
  //    NEGATIVE ADDENDS, not exclusions: each maintenance batch commits a
  //    correction batch (per-term df −1 per hidden generation's posting
  //    row, corpus dl/nd minus the hidden generations' totals) into the
  //    SAME stats log, and [[currentStats]] stays a plain sum — stats are
  //    exact the moment the correction commits, with no read-time join.
  //    The correction is exact by construction: a generation's posting rows
  //    are exactly the distinct terms [[TextAnalysis.lexStatsOf]] counted
  //    when it was ingested.
  //
  // Batch-id discipline: maintenance ids share the logs' id space with
  // ingest batches, so they must come from the same MONOTONE counter
  // (`maxBatchId + 1` in the maintenance window — the round-18
  // EmbeddingIndexStream contract: a backdated ceiling would fail to hide
  // later ingests, a reused id would be silently skipped as a replay).
  // Double-subtraction safety: the correction in [[deleteDocs]] covers only
  // generations NEWLY hidden by this call (live under the previous
  // ceilings ∧ hidden by the new one), so re-deleting an already-deleted
  // doc is a no-op, and the whole verb is replay-idempotent per batch id
  // via the stats log's own guard.

  private def tombPath(stateDir: String) = s"$stateDir/.lextomb"

  private def emptyDocTombstones(spark: SparkSession): DataFrame =
    spark.range(0).select(col("id").as("doc_id"), col("id").as("ceiling"))

  private def rawDocTombstones(spark: SparkSession, stateDir: String): DataFrame = {
    val path = tombPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new Path(path))) emptyDocTombstones(spark)
    else
      try spark.read.parquet(path).select("doc_id", "ceiling")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
          emptyDocTombstones(spark)
      }
  }

  /** Per-doc exclusion ceilings: (doc_id, ts_batch = max ceiling over the
    * doc's tombstones). A posting row with src_batch > ts_batch is a LATER
    * generation and stays live. */
  def docTombstoneCeilings(spark: SparkSession, stateDir: String): DataFrame =
    rawDocTombstones(spark, stateDir)
      .groupBy("doc_id").agg(max("ceiling").as("ts_batch"))

  private val MixedLayoutMsg =
    "mixed pre/post-r19 postings layouts in one log (NULL src_batch row " +
    "under an armed tombstone): ceiling resolution is undefined for rows " +
    "without ingest provenance - fold the old-layout dirs with the " +
    "pre-r19 code before arming doc tombstones"

  /** Ceiling exclusion on posting rows — keep rows whose ingest batch is
    * ABOVE their doc's tombstone ceiling (or whose doc has no tombstone).
    * A pre-round-19 layout (no per-row src_batch provenance) degrades to
    * doc-level exclusion — exactly the semantics its all-generations
    * tombstones meant. A MIXED log (old and new batch dirs → schema-union
    * NULL src_batch on the old rows) fails LOUD the moment a tombstoned
    * doc's null-provenance row is read — silently hiding it would
    * overstate deletions while [[newlyHidden]] under-corrects stats (the
    * round-19 advisory): the raise_error fires only on (tombstone-matched
    * ∧ src_batch NULL) rows, costing nothing on clean layouts. */
  private def applyDocCeilings(rows: DataFrame, ceilings: DataFrame): DataFrame =
    if (!rows.columns.contains("src_batch"))
      rows.join(ceilings.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    else
      rows.join(ceilings, Seq("doc_id"), "left")
        .filter(col("ts_batch").isNull ||
          when(col("src_batch").isNull, raise_error(lit(MixedLayoutMsg)))
            .otherwise(col("src_batch")) > col("ts_batch"))
        .drop("ts_batch")

  /** Commit one batch of (doc_id, ceiling) tombstone rows. USER-invoked,
    * not stream-replayed, so the write lands in a hidden tmp dir and the
    * RENAME is the commit point (the [[EmbeddingIndexStream.tombstoneRows]]
    * discipline); idempotent per batchId. */
  def tombstoneDocRows(spark: SparkSession, rows: DataFrame, batchId: Long,
                       stateDir: String): Unit = {
    val base = tombPath(stateDir)
    val fs = FsUtils.fs(spark, base)
    val tmp = new Path(base, s".tmp-batch-$batchId")
    val dst = new Path(base, s"batch=$batchId")
    rows.select(col("doc_id").cast("long").as("doc_id"),
        col("ceiling").cast("long").as("ceiling")).distinct()
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(tmp.toString)
    FsUtils.replaceDir(fs, tmp, dst)
    spark.catalog.refreshByPath(base)
  }

  /** The hidden-generation view the correction batches subtract: posting
    * rows of `ids` that are live under the CURRENT ceilings and hidden by
    * `newCeiling` — computed BEFORE the new tombstone commits. One postings
    * scan per maintenance batch (a doc's postings are scattered across the
    * term buckets — the standard cost of deleting from an inverted index;
    * [[syncLexCorpus]] avoids it when the old text is at hand). Emits one
    * row per (term, doc, generation) plus a `gen`/`gdl` pair for the
    * corpus-row arithmetic. */
  private def newlyHidden(spark: SparkSession, stateDir: String,
                          ids: DataFrame, newCeiling: Long): DataFrame = {
    val raw = postLog(spark, stateDir).readAll(emptyPostings(spark))
      .join(ids, Seq("doc_id"), "left_semi")
    val live = applyDocCeilings(raw, docTombstoneCeilings(spark, stateDir))
    val withGen =
      if (live.columns.contains("src_batch"))
        // guard BEFORE the ceiling filter: a mixed-layout NULL src_batch
        // row would silently fall out of `<= newCeiling` here, so the
        // correction batch would omit it while the tombstone hides it —
        // permanent df/dl/nd overstatement with no error (round-19
        // advisory). This is the maintenance-time twin of the
        // applyDocCeilings read-time guard (which needs a PRIOR tombstone
        // to fire; on the first-ever delete of a mixed log only this one
        // can catch it).
        live.withColumn("gen",
            when(col("src_batch").isNull, raise_error(lit(MixedLayoutMsg)))
              .otherwise(col("src_batch")))
          .filter(col("gen") <= newCeiling)
      else if (live.columns.contains("batch")) // degrade: partition id
        live.withColumn("gen", col("batch"))
      else live.withColumn("gen", lit(-1L))
    withGen.select("term", "doc_id", "tf", "dl", "gen")
  }

  /** Negated [[TextAnalysis.lexStatsOf]]-shaped correction rows for a set
    * of hidden posting generations. */
  private def negStatsOf(hidden: DataFrame): DataFrame = {
    val negTerm = hidden.groupBy("term").agg((-count(lit(1))).as("df"))
      .select(col("term"), col("df"), lit(0L).as("dl"), lit(0L).as("nd"))
    val gens = hidden.select("doc_id", "gen", "dl").distinct()
    val negCorpus = gens.agg(
        (-coalesce(sum("dl"), lit(0L))).as("dl"), (-count(lit(1))).as("nd"))
      .select(lit(TextAnalysis.LexCorpusRow).as("term"), lit(0L).as("df"),
        col("dl"), col("nd"))
    negTerm.unionByName(negCorpus)
  }

  /** DELETE documents from the maintained index (first column of `ids` is
    * taken as the doc id): commits a negative stats correction batch for
    * the generations this call newly hides, then the ceiling tombstones.
    * From that instant [[currentStats]] equals the one-shot aggregate over
    * the live corpus and every posting read excludes the docs. Idempotent
    * per batchId (stats guard + deterministic tombstone overwrite); a crash
    * between the two commits heals on the replay.
    *
    * @param ceiling hide the docs' rows ingested in batches ≤ this
    *   (defaults to `batchId` — a plain delete). An update passes
    *   `batchId − 1` so its own same-batch re-ingest survives. */
  def deleteDocs(spark: SparkSession, ids: DataFrame, batchId: Long,
                 stateDir: String, ceiling: Option[Long] = None): Unit = {
    val lg = log(spark, stateDir)
    val ceil = ceiling.getOrElse(batchId)
    val idsN = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
    if (!lg.alreadyApplied(batchId))
      lg.commitBatch(negStatsOf(newlyHidden(spark, stateDir, idsN, ceil)),
        batchId)
    tombstoneDocRows(spark,
      idsN.select(col("doc_id"), lit(ceil).as("ceiling")), batchId, stateDir)
  }

  /** One-call corpus→index synchronization — [[EmbeddingIndexStream
    * .syncWithCorpus]] for the lexical index, ONE maintenance batch id
    * covering all three verbs over (doc_id, text) snapshots:
    *
    *  - ADDED docs (new-only ids) are ingested — positive stats + postings;
    *  - REMOVED docs (old-only ids) are deleted — negative stats (from the
    *    OLD text, O(changed docs), no postings scan) + ceiling-`batchId`
    *    tombstones;
    *  - CHANGED docs (both snapshots, different text) are UPDATED in place:
    *    the new text rides the same ingest (src_batch = batchId), the old
    *    text's stats are subtracted, and a ceiling-`batchId − 1` tombstone
    *    hides every older posting generation while the fresh one survives.
    *
    * The old-text negation is exact because [[TextAnalysis.lexStatsOf]] is
    * deterministic on text: it cancels precisely what the doc's ingest
    * added — PROVIDED the old snapshot is what the index serves (the
    * snapshot-diff contract: one live generation per doc, updates always
    * through this verb, never bare re-ingests). Replay-idempotent per
    * batchId: both logs' guards + the deterministic tombstone overwrite —
    * every commit's content derives from the SNAPSHOTS, never from current
    * state, so a replay recommits identical state in any crash window.
    *
    * Commit ORDER (round-19 review): tombstones → postings → stats.
    * Every order leaves some transient crash window; this one picks the
    * benign ones — after tombstones alone, a changed doc is temporarily
    * ABSENT (clean under-serve; the old generation is hidden, the new not
    * yet committed); after postings, reads serve exactly v2 with one-batch-
    * stale corpus stats. The rejected order (postings before tombstones)
    * would instead serve BOTH generations of a changed doc — tf
    * double-counted in every read until the tombstone lands. (deleteDocs
    * keeps its own stats-FIRST order: its correction is computed from
    * pre-tombstone state, so committing the tombstone first would make a
    * replay recompute an empty correction.) */
  def syncLexCorpus(spark: SparkSession, stateDir: String,
                    oldDocs: DataFrame, newDocs: DataFrame, batchId: Long,
                    autoCompactBatches: Int = 0): Unit = {
    val lg = log(spark, stateDir)
    val pg = postLog(spark, stateDir)
    val oldD = oldDocs.select(col("doc_id"), col("text"))
    val newD = newDocs.select(col("doc_id"), col("text"))
    val added = newD.join(oldD.select("doc_id"), Seq("doc_id"), "left_anti")
    val removed = oldD.join(newD.select("doc_id"), Seq("doc_id"), "left_anti")
    val changedNew = newD.alias("n").join(oldD.alias("o"), Seq("doc_id"))
      .filter(col("n.text") =!= col("o.text"))
      .select(col("doc_id"), col("n.text").as("text"))
    val changedOld = oldD.join(changedNew.select("doc_id"),
      Seq("doc_id"), "left_semi")
    val appends = added.unionByName(changedNew)
    val retired = removed.unionByName(changedOld)
    tombstoneDocRows(spark,
      removed.select(col("doc_id"), lit(batchId).as("ceiling"))
        .unionByName(changedNew.select(col("doc_id"),
          lit(batchId - 1L).as("ceiling"))),
      batchId, stateDir)
    if (!pg.alreadyApplied(batchId)) {
      pg.commitBatch(
        TextAnalysis.lexPostingsOf(appends, postingBuckets(spark, stateDir))
          .withColumn("src_batch", lit(batchId))
          .repartition(col("pbucket")),
        batchId, coalesce1 = false, partitionByCols = Seq("pbucket"))
      pg.maybeAutoCompact(autoCompactBatches)(compactPostings(spark, stateDir))
    }
    if (!lg.alreadyApplied(batchId)) {
      // negation from the OLD TEXT (the snapshots are at hand), with the
      // same gen/dl shape negStatsOf consumes — one narrow pass over the
      // retired docs, never a postings scan
      val hidden = TextAnalysis.lexPostingsOf(retired)
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          lit(-1L).as("gen"))
      lg.commitBatch(
        TextAnalysis.lexStatsOf(appends).unionByName(negStatsOf(hidden)),
        batchId, coalesce1 = false)
      lg.maybeAutoCompact(autoCompactBatches)(compactStats(spark, stateDir))
    }
  }

  // --- as-of reads (round 19): point-in-time over the lexical logs ----------
  //
  // The vector index grew as-of reads in r17; the lexical index's logs
  // carry the same provenance, so the same partition-filtered read works:
  // stats batches ≤ B (CORRECTIONS INCLUDED — a delete committed ≤ B is
  // visible, a later one is not, and the sum is exact because corrections
  // are plain addends), posting rows with src_batch ≤ B, tombstones
  // committed in batches ≤ B. Compaction coarsens history exactly like the
  // vector side: the stats fold collapses the per-batch addends and the
  // postings fold purges hidden generations, so an as-of read predating
  // the folded horizon is not reconstructible — size compaction windows to
  // the as-of horizon you need (the shared StateLog caveat).

  private def docTombstoneCeilingsAsOf(spark: SparkSession, stateDir: String,
                                       asOfBatch: Long): DataFrame = {
    val raw = rawDocTombstonesWithBatch(spark, stateDir)
    (if (raw.columns.contains("batch")) raw.filter(col("batch") <= asOfBatch)
     else raw)
      .groupBy("doc_id").agg(max("ceiling").as("ts_batch"))
  }

  private def rawDocTombstonesWithBatch(spark: SparkSession,
                                        stateDir: String): DataFrame = {
    val path = tombPath(stateDir)
    if (!FsUtils.fs(spark, path).exists(new Path(path))) emptyDocTombstones(spark)
    else
      try spark.read.parquet(path)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
          emptyDocTombstones(spark)
      }
  }

  /** Stats as they stood at `asOfBatch`: the per-term sum over stat batches
    * ≤ B — ingests AND corrections, both plain addends (exact while the
    * batch dirs predate compaction). */
  def currentStatsAsOf(spark: SparkSession, stateDir: String,
                       asOfBatch: Long): DataFrame =
    log(spark, stateDir)
      .read(Seq("term", "df", "dl", "nd"), emptyStats(spark),
        uptoBatch = asOfBatch)
      .groupBy("term")
      .agg(sum("df").as("df"), sum("dl").as("dl"), sum("nd").as("nd"))

  private def readPostingsAsOf(spark: SparkSession, stateDir: String,
                               terms: Seq[String], cols: Seq[String],
                               asOfBatch: Long): DataFrame = {
    val nb = postingBuckets(spark, stateDir)
    val buckets = terms.map(TextAnalysis.termBucket(_, nb)).distinct
    val raw0 = postLog(spark, stateDir).readAll(emptyPostings(spark))
      .filter(col("pbucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val raw1 = if (raw0.columns.contains("batch"))
      raw0.filter(col("batch") <= asOfBatch) else raw0 // partition prune
    val raw = if (raw1.columns.contains("src_batch"))
      raw1.filter(col("src_batch") <= asOfBatch) else raw1 // exact bound
    applyDocCeilings(raw, docTombstoneCeilingsAsOf(spark, stateDir, asOfBatch))
      .select(cols.map(col): _*)
      .drop("pbucket")
  }

  /** Fail-loud horizon check for point-in-time reads (round-19 verdict
    * item 7): compaction collapses per-batch stats addends and physically
    * purges hidden posting generations, so an as-of cut BELOW either
    * log's folded watermark would silently serve the folded floor —
    * corrections that committed after B but before the fold are baked in,
    * purged generations unrecoverable. Refuse instead; size compaction
    * windows to the as-of horizon you need (the shared StateLog caveat,
    * now mechanical rather than prose). */
  private def requireAsOfReachable(spark: SparkSession, stateDir: String,
                                   asOfBatch: Long): Unit = {
    val statsFold = log(spark, stateDir).foldedUpto()
    val postFold = postLog(spark, stateDir).foldedUpto()
    val horizon = math.max(statsFold, postFold)
    require(asOfBatch >= horizon,
      s"as-of batch $asOfBatch predates the folded horizon $horizon " +
        s"(stats folded upto $statsFold, postings upto $postFold) at " +
        s"$stateDir: compaction collapsed per-batch history below it, so " +
        "the point-in-time view is not reconstructible")
  }

  /** BM25 served from the index AS IT STOOD at `asOfBatch` — reproduce
    * yesterday's ranking, audit what a delete removed: both stats and the
    * query terms' postings bounded to batches ≤ B, tombstones committed
    * ≤ B applied (with their own ceilings — the point-in-time twin of
    * [[bm25TopkIndexed]]). Refuses below the folded horizon. */
  def bm25TopkIndexedAsOf(spark: SparkSession, stateDir: String,
                          asOfBatch: Long,
                          terms: Seq[String] = TextAnalysis.Bm25Terms,
                          k: Int = 20): DataFrame = {
    requireAsOfReachable(spark, stateDir, asOfBatch)
    TextAnalysis.bm25TopkIndexed(
      readPostingsAsOf(spark, stateDir, terms,
        Seq("term", "doc_id", "tf", "dl", "pbucket"), asOfBatch),
      currentStatsAsOf(spark, stateDir, asOfBatch), terms, k)
  }

  /** Phrase query at a point in time — the same bounded read under the
    * positional columns (proximity/snippets/facets ride the identical
    * seam through their own entry points if needed). Refuses below the
    * folded horizon. */
  def phraseMatchAsOf(spark: SparkSession, stateDir: String, asOfBatch: Long,
                      phrase: Seq[String] = TextAnalysis.PhraseTerms): DataFrame = {
    requireAsOfReachable(spark, stateDir, asOfBatch)
    TextAnalysis.phraseMatchOf(
      readPostingsAsOf(spark, stateDir, phrase,
        Seq("term", "doc_id", "tf", "dl", "positions", "pbucket"), asOfBatch),
      phrase)
  }

  /** Retire the tombstone dirs. ONLY safe once every tombstoned doc's
    * hidden generations are physically purged from every postings dir a
    * read can open — i.e. after a full [[compactPostings]] in the
    * maintenance window (the stats corrections are rows, not exclusions,
    * and need no retirement). */
  def clearDocTombstones(spark: SparkSession, stateDir: String): Unit = {
    val fs = FsUtils.fs(spark, stateDir)
    val p = new Path(tombPath(stateDir))
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** BM25 served from the maintained stats, tf by corpus scan — the
    * per-query read path while a corpus table is still at hand. */
  def bm25Topk(spark: SparkSession, stateDir: String, docs: DataFrame,
               terms: Seq[String] = TextAnalysis.Bm25Terms,
               k: Int = 20): DataFrame =
    TextAnalysis.bm25TopkServed(docs, currentStats(spark, stateDir), terms, k)

  /** BM25 served ENTIRELY from the maintained index (stats + postings) —
    * no corpus access; cost is O(postings of the query terms). */
  def bm25TopkIndexed(spark: SparkSession, stateDir: String,
                      terms: Seq[String] = TextAnalysis.Bm25Terms,
                      k: Int = 20): DataFrame =
    TextAnalysis.bm25TopkIndexed(
      currentPostings(spark, stateDir, terms),
      currentStats(spark, stateDir), terms, k)

  /** ALL query sets' indexed ranked lists in one batched read (round 21
    * opt): one stats lookup + one postings aggregate over the union of
    * the sets' terms — the hybrid fusion lexical leg without a per-query
    * stats job + postings pass ([[TextAnalysis.bm25RankedPerQueryIndexedBatch]];
    * posting buckets pruned to the union's [[TextAnalysis.termBucket]]s). */
  def bm25RankedPerQueryIndexed(spark: SparkSession, stateDir: String,
                                querySets: Seq[(Long, Seq[String])],
                                l: Int): DataFrame =
    TextAnalysis.bm25RankedPerQueryIndexedBatch(
      currentPostings(spark, stateDir, querySets.flatMap(_._2).distinct),
      currentStats(spark, stateDir), querySets, l)

  /** Phrase query served from the POSITIONAL postings — no corpus access;
    * reads only the phrase terms' buckets. */
  def phraseMatch(spark: SparkSession, stateDir: String,
                  phrase: Seq[String] = TextAnalysis.PhraseTerms): DataFrame =
    TextAnalysis.phraseMatchOf(
      currentPostingsWithPositions(spark, stateDir, phrase), phrase)

  /** Proximity (NEAR/k) query served from the positional postings — no
    * corpus access; reads only the two terms' buckets. */
  def proximityMatch(spark: SparkSession, stateDir: String,
                     termA: String = TextAnalysis.PhraseTerms(0),
                     termB: String = TextAnalysis.PhraseTerms(1),
                     maxDist: Int = TextAnalysis.ProximityDist): DataFrame =
    TextAnalysis.proximityMatchOf(
      currentPostingsWithPositions(spark, stateDir, Seq(termA, termB)),
      termA, termB, maxDist)

  /** Search-result SNIPPETS served off the index: the indexed BM25 top-k
    * chooses the ids (postings only), then ONLY those k rows are read from
    * the row store for the best-window extraction — the serving shape
    * where the corpus-sized table is touched for exactly k point reads. */
  def snippets(spark: SparkSession, stateDir: String, docs: DataFrame,
               terms: Seq[String] = TextAnalysis.Bm25Terms, k: Int = 5,
               window: Int = TextAnalysis.SnippetWindow): DataFrame = {
    // ≤ k ids collected driver-side (bounded by construction) and pushed
    // as an In predicate: the row-store read is a PushedFilters point
    // lookup (row-group stats pruning on a doc_id-sorted layout), not a
    // corpus-wide semi-join — the scale-correct serving plan
    val topIds = bm25TopkIndexed(spark, stateDir, terms, k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    TextAnalysis.snippetWindows(
      docs.filter(col("doc_id").isin(topIds: _*)).select("doc_id", "text"),
      terms, window)
  }

  /** Per-facet match counts served off the index: candidate ids from the
    * query terms' postings, one semi-join to a slim dim projection. */
  def facetCounts(spark: SparkSession, stateDir: String, dims: DataFrame,
                  terms: Seq[String] = TextAnalysis.Bm25Terms,
                  facets: Seq[String] = Seq("lang", "source")): DataFrame =
    TextAnalysis.facetCountsOf(
      currentPostings(spark, stateDir, terms).select("doc_id").distinct(),
      dims, facets)

  /** "More like this" (round 19) — the classic relevance-feedback verb:
    * the seed document's top TF-IDF terms become the query, served off the
    * maintained index. Serving shape: ONE point read of the seed row
    * (In-pushdown), O(seed's distinct terms) stat lookups for the TF-IDF
    * election (df from the maintained stats — no corpus df scan), ≤ nTerms
    * driver rows collected IN RANK ORDER (the BM25 component summation
    * order both engines replay), then the standard O(query-term postings)
    * indexed BM25 with the seed itself excluded BELOW the top-k. */
  def moreLikeThis(spark: SparkSession, stateDir: String, docs: DataFrame,
                   seedDoc: Long = 0L, nTerms: Int = 3, k: Int = 20): DataFrame = {
    val stats = currentStats(spark, stateDir)
    val corpus = stats.filter(col("term") === TextAnalysis.LexCorpusRow)
      .agg(sum("nd").as("nd")).head()
    // empty index / missing corpus sentinel → sum(nd) is a NULL cell; read
    // it and getLong NPEs before the seed-doc require below can explain
    // anything (round-19 advisory) — fail with the real cause instead
    require(!corpus.isNullAt(0),
      s"more-like-this over an empty lexical index at $stateDir " +
        "(no corpus sentinel row in the stats log)")
    val n = corpus.getLong(0).toDouble
    val seedTf = docs.filter(col("doc_id") === seedDoc)
      .select(explode(split(col("text"), " ", -1)).as("term"))
      .groupBy("term").agg(count(lit(1)).cast("double").as("tf"))
    val terms = seedTf.join(stats.filter(col("term") =!= TextAnalysis.LexCorpusRow)
        .groupBy("term").agg(sum("df").as("df")), Seq("term"))
      .select(col("term"),
        round(col("tf") *
          org.apache.spark.sql.functions.log(lit(n) / col("df").cast("double")),
          4).as("score"))
      .orderBy(col("score").desc, col("term"))
      .limit(nTerms)
      .collect().map(_.getString(0)).toSeq // ≤ nTerms rows, rank-ordered
    require(terms.nonEmpty,
      s"more-like-this seed doc $seedDoc not found (or empty) in the corpus")
    TextAnalysis.bm25TopkIndexed(
      currentPostings(spark, stateDir, terms)
        .filter(col("doc_id") =!= seedDoc), // excluded BELOW the top-k
      stats, terms, k)
  }

  /** File-source wrapper: document parquet drops → maintained stats +
    * postings under `stateDir`. */
  def runFileStream(spark: SparkSession, inDir: String, stateDir: String,
                    checkpointDir: String, schemaFrom: DataFrame,
                    autoCompactBatches: Int = 16): StreamingQuery =
    spark.readStream
      .schema(schemaFrom.schema)
      .parquet(inDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, stateDir,
          autoCompactBatches = autoCompactBatches)
        ()
      }
      .start()
}
