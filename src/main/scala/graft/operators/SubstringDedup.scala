package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hashing.{h60, h60Sql}

/** Repeated-substring deduplication (the ExactSubstr side of Lee et al.
  * 2021, "Deduplicating Training Data Makes Language Models Better"):
  * find every span of `L` consecutive words whose exact token sequence
  * occurs MORE THAN ONCE in the corpus (across documents or repeated
  * within one), and per document report the duplicated-span starts, the
  * covered-token count, and the text with covered tokens REMOVED — the
  * paper's cut semantics, not a whole-doc drop.
  *
  * Distributed design (vs the paper's single-node suffix array): the
  * corpus's L-gram stream is hashed ([[graft.functions.Hashing.h60]] on
  * the gate for oracle portability; xxhash64 in production via `hashFn`)
  * and duplicate detection happens on the 60-bit gram hash — a
  * hash-identical approximation of sequence-identity with ~2⁻⁶⁰
  * per-pair false-positive rate, the standard trade for making this a
  * linear shuffle problem instead of a global suffix sort.
  *
  * Scale shape (3 linear shuffles, no pair or span materialization
  * beyond per-doc arrays):
  *  1. gram stream → groupBy(gram hash) COUNT — map-side combinable, so
  *     the only gh exchange carries partial counts, never the raw stream;
  *     the duplicated-hash set semi-joins the stream back (broadcast while
  *     it fits, shuffle beyond — see the in-method exchange note).
  *  2. duplicated occurrences → groupBy(doc_id) collect sorted start
  *     positions — per-doc state bounded by document length (documents
  *     are the pipeline's bounded unit of work, same contract as every
  *     per-doc HOF here).
  *  3. one narrow left join back to the base scan; coverage and the cut
  *     text are per-row HOFs over (tokens, starts).
  *
  * The 100 TB cost center is shuffle 1: one (doc_id, pos, hash) row per
  * corpus token — the same order of volume a distributed suffix-array
  * build moves, with none of its global-sort coordination.
  */
object SubstringDedup {

  /** Per-document repeated-span report over `docs(idCol, textCol)`.
    * Documents shorter than L words generate no grams (they can never
    * contain an L-token span; exact dedup owns whole-short-doc copies). */
  def repeatedSpans(docs: DataFrame, textCol: String, idCol: String,
                    L: Int = 5,
                    hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                      xxhash64(_)): DataFrame = {
    // Exchange economics of the diamond (aggregate + semi-join over one
    // gram stream): the duplicate-count aggregate partial-aggregates
    // map-side, so its gh exchange carries ≤ distinct-grams-per-partition
    // rows, NOT the raw stream; the occurrence probe side re-derives grams
    // narrowly (split+shingle+hash CPU, no shuffle) and — while the
    // duplicated-hash set fits the broadcast threshold — joins with ZERO
    // exchange of the raw stream. A forced shared raw-gram exchange (the
    // electKeep pattern) was tried and REJECTED here: Catalyst pulls the
    // repartition above the broadcast semi-join, and trading the partial
    // aggregate's compression for a raw-stream shuffle is a loss whenever
    // duplicate hashes are rarer than grams. Beyond broadcast scale the
    // semi-join degrades to shuffle on gh — the plan a distributed
    // suffix-array equivalent pays anyway.
    val grams = gramStream(docs, textCol, idCol, L, hashFn)
    val dupHashes = grams.groupBy("gh")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).select("gh")
    spansAgainst(docs, dupHashes, textCol, idCol, L, hashFn,
      "n_dup_spans", "covered_tokens", "dup_ratio")
  }

  /** Gram stream of `docs`: one (idCol, pos, gh) row per L-word window.
    * Shared by the batch operator, [[contaminationSpans]], and the
    * incremental stream ([[graft.streaming.SubstringDedupStream]]). */
  private[graft] def gramStream(docs: DataFrame, textCol: String, idCol: String,
                                L: Int,
                                hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    val ws = split(col(textCol), " ", -1)
    docs.filter(size(ws) >= L)
      .select(col(idCol), posexplode(Dedup.wordShingles(col(textCol), L)))
      .select(col(idCol), col("pos"), hashFn(col("col")).as("gh"))
  }

  /** Span report of `docs` against an arbitrary flagged-hash set (column
    * `gh`): occurrences of flagged grams → per-doc sorted starts →
    * [[coverageReport]]. `broadcastFlags` hints the membership join for
    * known-small sets (the contamination case). */
  private[graft] def spansAgainst(docs: DataFrame, flaggedHashes: DataFrame,
                                  textCol: String, idCol: String, L: Int,
                                  hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                                  spansCol: String, coveredCol: String, ratioCol: String,
                                  broadcastFlags: Boolean = false): DataFrame = {
    val flags = if (broadcastFlags) broadcast(flaggedHashes) else flaggedHashes
    val starts = gramStream(docs, textCol, idCol, L, hashFn)
      .join(flags, Seq("gh"), "left_semi")
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    coverageReport(docs, starts, textCol, idCol, L, spansCol, coveredCol, ratioCol)
  }

  /** Shared span-coverage tail: left-join per-doc sorted span `starts`
    * back to the base scan, compute interval-union coverage and the cut
    * text via HOFs.
    *
    * O(n_tokens + n_spans) per row (round 14; was O(n_tokens × n_spans)):
    * because `starts` is SORTED and every span has fixed length L, the
    * uncovered token ranges are exactly the gaps between consecutive
    * starts that exceed L — one `zip_with` over (starts, starts-shifted)
    * with sentinels -L (virtual span ending at 0) and n (virtual start at
    * the end) yields each gap as a token slice; `flatten` concatenates
    * them in order. The r13 form re-scanned the whole starts array per
    * token (`exists`), which went quadratic exactly when dedup matters
    * most — a fully-covered doc (every position a span start, the
    * amplified-corpus profile measured in PLANS.md round 14: dup
    * occurrences grow 100× under 10× amplification). Covered-token count
    * falls out as n − |uncovered| — no second pass. */
  private[graft] def coverageReport(docs: DataFrame, starts: DataFrame,
                             textCol: String, idCol: String, L: Int,
                             spansCol: String, coveredCol: String,
                             ratioCol: String): DataFrame =
    docs.join(starts, Seq(idCol), "left")
      .select(col(idCol), col(textCol).as("__text"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col(idCol),
        graft.functions.ExprUtils.bindOnce(split(col("__text"), " ", -1)) { toks =>
          val n = size(toks)
          // sentinel-padded starts: virtual span at -L (covers nothing,
          // ends at 0) and virtual start at n close the first/last gap
          val all = concat(array(lit(-L)), col("starts"), array(n))
          val m = size(all)
          // gap after span at `cur` before next start `nxt`:
          // tokens [cur+L, nxt) — empty (slice len 0) when spans overlap
          // or touch; slice start is 1-based
          val uncoveredToks = flatten(zip_with(
            slice(all, lit(1), m - 1), slice(all, lit(2), m - 1),
            (cur, nxt) => slice(toks, cur + L + 1,
              greatest(nxt - cur - L, lit(0)))))
          val covered = (n - size(uncoveredToks)).cast("long")
          struct(
            n.cast("long").as("n_tokens"),
            size(col("starts")).cast("long").as(spansCol),
            covered.as(coveredCol),
            round(covered.cast("double") / n, 4).as(ratioCol),
            array_join(uncoveredToks, " ").as("cleaned_text"))
        }.as("s"))
      .select(col(idCol), col("s.n_tokens").as("n_tokens"),
        col(s"s.$spansCol").as(spansCol),
        col(s"s.$coveredCol").as(coveredCol),
        col(s"s.$ratioCol").as(ratioCol),
        col("s.cleaned_text").as("cleaned_text"))

  /** Span-level decontamination (the cut refinement of
    * [[Prep.decontaminateAgainst]]'s whole-doc drop): mark every L-token
    * span of a TRAINING doc whose gram appears in the BENCHMARK gram set,
    * report coverage, and cut exactly the contaminated spans — modern
    * decontamination keeps the clean remainder of a touched doc instead of
    * discarding it. Same shapes as [[repeatedSpans]], except duplicate
    * detection is replaced by a membership join against the (small,
    * broadcast) benchmark hash set — no corpus-wide aggregate at all, so
    * the ONLY shuffle is the per-doc start collection.
    */
  def contaminationSpans(trainDocs: DataFrame, benchHashes: DataFrame,
                         textCol: String, idCol: String, L: Int = 3,
                         hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                           h60): DataFrame =
    spansAgainst(trainDocs, benchHashes.select(col("sh").as("gh")),
      textCol, idCol, L, hashFn,
      "n_contam_spans", "contam_tokens", "contam_ratio", broadcastFlags = true)

  /** Gate wrapper: bench = the [[Prep.isBenchDoc]] slice (decontaminate's
    * convention, k=3 grams), train = the rest; h60 end-to-end. */
  def contaminationSpansGate(spark: SparkSession, dir: String, L: Int = 3): DataFrame = {
    val docs = Tables.fanOut(Tables.documents(spark, dir)) // r20 opt: span/gram pass off the 1-task scan
    contaminationSpans(docs.filter(!Prep.isBenchDoc),
      Prep.benchShingleHashes(docs.filter(Prep.isBenchDoc), L, h60),
      "text", "doc_id", L, h60)
      .orderBy("doc_id")
  }

  /** DuckDB replay: bench gram-hash set from the same slice, membership
    * (not multiplicity) drives the spans, same coverage/cut lambdas. */
  def contaminationSpansSql(L: Int = 3): String = {
    val ws = "STR_SPLIT(text, ' ')"
    val coveredFilter =
      s"i -> LEN(list_filter(starts, s -> i >= s AND i < s + $L)) > 0"
    val uncoveredFilter =
      s"i -> LEN(list_filter(starts, s -> i >= s AND i < s + $L)) = 0"
    // benchmark shingles use wordShingles' n<k contract ([text] for short
    // docs) — mirror it; training grams only exist for n >= L
    val benchGrams =
      s"""CASE WHEN LEN($ws) >= $L
         | THEN list_transform(range(0, LEN($ws) - $L + 1),
         |   i -> array_to_string(($ws)[i+1:i+$L], ' '))
         | ELSE [text] END""".stripMargin.replace("\n", "")
    s"""WITH bench AS (SELECT DISTINCT ${h60Sql("g")} AS sh FROM (
       |    SELECT UNNEST($benchGrams) AS g FROM documents WHERE doc_id % 10 = 0)),
       |w AS (SELECT doc_id, $ws AS ws FROM documents WHERE doc_id % 10 <> 0),
       |g AS (SELECT doc_id, i AS pos,
       |        ${h60Sql("array_to_string(ws[i+1:i+" + L + "], ' ')")} AS sh
       |      FROM (SELECT doc_id, ws, UNNEST(range(0, LEN(ws) - $L + 1)) AS i
       |            FROM w WHERE LEN(ws) >= $L)),
       |o AS (SELECT doc_id, pos FROM g JOIN bench USING (sh)),
       |st AS (SELECT doc_id, list_sort(list(pos)) AS starts FROM o GROUP BY doc_id),
       |f AS (SELECT w.doc_id, ws, LEN(ws) AS n,
       |        COALESCE(starts, CAST([] AS BIGINT[])) AS starts
       |      FROM w LEFT JOIN st USING (doc_id))
       |SELECT doc_id,
       |CAST(n AS BIGINT) AS n_tokens,
       |CAST(LEN(starts) AS BIGINT) AS n_contam_spans,
       |CAST(LEN(list_filter(range(0, n), $coveredFilter)) AS BIGINT) AS contam_tokens,
       |ROUND(CAST(LEN(list_filter(range(0, n), $coveredFilter)) AS DOUBLE) / n, 4) AS contam_ratio,
       |COALESCE(array_to_string(list_transform(
       |  list_filter(range(0, n), $uncoveredFilter), i -> ws[i+1]), ' '), '') AS cleaned_text
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Gate wrapper: h60 hash (exact DuckDB oracle), sorted by doc_id. */
  def repeatedSpansGate(spark: SparkSession, dir: String, L: Int = 5): DataFrame =
    repeatedSpans(Tables.fanOut(Tables.documents(spark, dir)), "text", "doc_id", L, h60) // r20 opt
      .orderBy("doc_id")

  /** DuckDB replay: same grams (word L-windows joined by one space), same
    * h60 hashes, same coverage/cut HOFs. */
  def repeatedSpansSql(L: Int = 5): String = {
    val ws = "STR_SPLIT(text, ' ')"
    val coveredFilter =
      s"i -> LEN(list_filter(starts, s -> i >= s AND i < s + $L)) > 0"
    val uncoveredFilter =
      s"i -> LEN(list_filter(starts, s -> i >= s AND i < s + $L)) = 0"
    s"""WITH w AS (SELECT doc_id, $ws AS ws FROM documents),
       |g AS (SELECT doc_id, i AS pos,
       |        ${h60Sql("array_to_string(ws[i+1:i+" + L + "], ' ')")} AS gh
       |      FROM (SELECT doc_id, ws, UNNEST(range(0, LEN(ws) - $L + 1)) AS i
       |            FROM w WHERE LEN(ws) >= $L)),
       |d AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) > 1),
       |o AS (SELECT doc_id, pos FROM g JOIN d USING (gh)),
       |st AS (SELECT doc_id, list_sort(list(pos)) AS starts FROM o GROUP BY doc_id),
       |f AS (SELECT w.doc_id, ws, LEN(ws) AS n,
       |        COALESCE(starts, CAST([] AS BIGINT[])) AS starts
       |      FROM w LEFT JOIN st USING (doc_id))
       |SELECT doc_id,
       |CAST(n AS BIGINT) AS n_tokens,
       |CAST(LEN(starts) AS BIGINT) AS n_dup_spans,
       |CAST(LEN(list_filter(range(0, n), $coveredFilter)) AS BIGINT) AS covered_tokens,
       |ROUND(CAST(LEN(list_filter(range(0, n), $coveredFilter)) AS DOUBLE) / n, 4) AS dup_ratio,
       |COALESCE(array_to_string(list_transform(
       |  list_filter(range(0, n), $uncoveredFilter), i -> ws[i+1]), ' '), '') AS cleaned_text
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
