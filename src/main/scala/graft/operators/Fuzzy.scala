package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (spell-tolerant) term lookup — the query-understanding verb of the
  * retrieval stack: a misspelled query term resolves to the vocabulary
  * terms within edit distance 1, ranked by (distance, df desc, term). The
  * algorithm is the public SymSpell shape (Garbe): candidate generation by
  * DELETION NEIGHBORHOOD — two strings within edit distance 1 must share a
  * member of each other's {self} ∪ {one-char-deletions} sets — then an
  * EXACT Levenshtein verify on the (tiny) candidate set. Generation is a
  * pure equi-join, verification a per-candidate scalar; no pairwise
  * vocab × query scan anywhere.
  *
  * Scale shape: the variant table is O(Σ term length) over the VOCABULARY —
  * the bounded object of the lexical stack (the capped-vocab machinery owns
  * its 100 TB story), never the corpus; the join shuffles short variant
  * strings; `levenshtein` (identical classic-DP semantics on both engines,
  * exact integers) runs only on join survivors. A transposition like
  * `scna`→`scan` IS generated as a candidate (shared deletion variants) and
  * then correctly REJECTED by the verify (classic Levenshtein = 2) — the
  * two stages are both load-bearing, and the gate fixture includes that
  * case.
  */
object Fuzzy {

  /** Gate query terms: one deletion, one substitution, one insertion, one
    * TRANSPOSITION (candidate generated, verify must reject), one exact
    * hit — all against the fixture vocabulary. */
  val GateQueryTerms: Seq[String] =
    Seq("dupp", "joln", "qury", "scna", "sort", "vectr")
  final val GateMaxEd = 1

  /** {self} ∪ one-char-deletion variants, deduplicated. */
  private def variantsExpr(t: Column): Column =
    array_union(
      array(t),
      transform(sequence(lit(0), length(t) - 1),
        i => concat(t.substr(lit(1), i), t.substr(i + lit(2), length(t)))))

  /** Resolve `queryTerms` against a (term, df) vocabulary. Output:
    * (query_term, term, dist, df), ranked (dist, df desc, term) per query —
    * an unmatched query term yields no rows (the caller's miss signal). */
  def termLookup(vocab: DataFrame, queryTerms: Seq[String],
                 maxEd: Int = GateMaxEd): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val v = vocab.select(col("term"), col("df"))
      .select(col("term"), col("df"),
        explode(variantsExpr(col("term"))).as("variant"))
    val q = queryTerms.toDF("query_term")
      .select(col("query_term"),
        explode(variantsExpr(col("query_term"))).as("variant"))
    q.join(v, Seq("variant"))
      .select("query_term", "term", "df").distinct()
      .withColumn("dist",
        levenshtein(col("query_term"), col("term")).cast("long"))
      .filter(col("dist") <= maxEd)
      .orderBy(col("query_term"), col("dist"), col("df").desc, col("term"))
  }

  /** The gate composition: vocabulary = the MAINTAINED lexical-index stats
    * (term rows, corpus sentinel excluded) — fuzzy lookup is a serving-path
    * verb and reads the index, not the corpus. */
  def gate(spark: org.apache.spark.sql.SparkSession, statsDir: String): DataFrame =
    termLookup(
      graft.streaming.LexStatsStream.currentStats(spark, statsDir)
        .filter(col("term") =!= TextAnalysis.LexCorpusRow && col("df") > 0)
        .select("term", "df"),
      GateQueryTerms)

  /** Misspelled query terms for the corrected-retrieval composition —
    * each resolves to a distinct vocabulary correction; SORTED, because
    * the election collects in query-term order and the BM25 expression
    * tree sums components in that order (the rank-ordered-summation
    * contract the oracle replays). */
  val CorrectedQueryTerms: Seq[String] = Seq("dupp", "qury", "vectr")

  /** FUZZY → CORRECTED RETRIEVAL (round 20, verdict r19 item 4): the
    * query-understanding composition end to end — each misspelled query
    * term resolves to its BEST vocabulary correction (the [[termLookup]]
    * ranking (dist, df desc, term) cut to one row per term), and the
    * corrected terms serve the standard indexed BM25 off the maintained
    * postings. Serving shape: the SymSpell candidate join over the
    * vocabulary, ≤ |queryTerms| driver rows collected in query-term
    * order, then the O(corrected-term postings) indexed read — the
    * corpus is never scanned. Election is DATA-DEPENDENT, so the oracle
    * replays it from first principles and sums the per-term BM25
    * components in the same rank order (the more_like_this discipline). */
  def correctedBm25(spark: org.apache.spark.sql.SparkSession, statsDir: String,
                    queryTerms: Seq[String] = CorrectedQueryTerms,
                    maxEd: Int = GateMaxEd, k: Int = 20): DataFrame = {
    val stats = graft.streaming.LexStatsStream.currentStats(spark, statsDir)
    val vocab = stats
      .filter(col("term") =!= TextAnalysis.LexCorpusRow && col("df") > 0)
      .select("term", "df")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("query_term")
      .orderBy(col("dist"), col("df").desc, col("term"))
    val elected = termLookup(vocab, queryTerms, maxEd)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .orderBy("query_term")
      .select("query_term", "term")
      .collect() // ≤ |queryTerms| rows, query-term rank order
    require(elected.length == queryTerms.size,
      s"unresolvable query terms (no vocabulary correction within " +
        s"edit distance $maxEd): " +
        (queryTerms.toSet -- elected.map(_.getString(0))).mkString(", "))
    val terms = elected.map(_.getString(1)).toSeq
    require(terms.distinct.size == terms.size,
      s"two query terms elected the same correction (${terms.mkString(",")})" +
        " - the summation-order contract needs distinct terms")
    TextAnalysis.bm25TopkIndexed(
      graft.streaming.LexStatsStream.currentPostings(spark, statsDir, terms),
      stats, terms, k)
  }

  /** [[correctedBm25]]'s DuckDB replica: the [[gateSql]] CTE chain (vocab →
    * deletion neighborhood → exact-Levenshtein verify) cut to the best
    * correction per query term, chained into the BM25 chain with
    * DATA-DEPENDENT terms — per-term components in the exact
    * bm25ScoreExpr association, summed in query-term rank order
    * (`list_sum(list(c ORDER BY rank))`, the more_like_this precedent). */
  def correctedBm25Sql(queryTerms: Seq[String] = CorrectedQueryTerms,
                       maxEd: Int = GateMaxEd, k: Int = 20,
                       docsRel: String = "documents",
                       prelude: String = ""): String = {
    val qlist = queryTerms.map(t => s"'$t'").mkString(", ")
    val k1 = TextAnalysis.Bm25K1
    val b = TextAnalysis.Bm25B
    s"""WITH ${prelude}vocab AS (
       |  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM (SELECT DISTINCT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS t
       |        FROM $docsRel) GROUP BY t),
       |vv AS (
       |  SELECT term, df,
       |    UNNEST(list_append(list_transform(range(0, LEN(term)),
       |      i -> substr(term, 1, i) || substr(term, i + 2)), term)) AS variant
       |  FROM vocab),
       |qv AS (
       |  SELECT query_term,
       |    UNNEST(list_append(list_transform(range(0, LEN(query_term)),
       |      i -> substr(query_term, 1, i) || substr(query_term, i + 2)), query_term)) AS variant
       |  FROM (SELECT UNNEST([$qlist]) AS query_term)),
       |m AS (SELECT DISTINCT query_term, term, df FROM qv JOIN vv USING (variant)),
       |best AS (SELECT query_term, term FROM (
       |  SELECT query_term, term, ROW_NUMBER() OVER (PARTITION BY query_term
       |    ORDER BY levenshtein(query_term, term), df DESC, term) AS rn
       |  FROM m WHERE levenshtein(query_term, term) <= $maxEd) WHERE rn = 1),
       |q AS (SELECT term, ROW_NUMBER() OVER (ORDER BY query_term) AS rank FROM best),
       |t AS (SELECT doc_id, CAST(LEN(STR_SPLIT(text, ' ')) AS DOUBLE) AS dl, text FROM $docsRel),
       |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM t),
       |dfq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS dfc
       |        FROM (SELECT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS term FROM $docsRel)
       |        GROUP BY term),
       |comp AS (SELECT t.doc_id, q.rank,
       |    LN((s.n - d.dfc + 0.5) / (d.dfc + 0.5) + 1.0)
       |      * (CAST(LEN(LIST_FILTER(STR_SPLIT(t.text, ' '), x -> x = q.term)) AS DOUBLE) * ${k1 + 1.0})
       |      / (CAST(LEN(LIST_FILTER(STR_SPLIT(t.text, ' '), x -> x = q.term)) AS DOUBLE)
       |         + $k1 * (1.0 - $b + $b * t.dl / s.avgdl)) AS c,
       |    LEN(LIST_FILTER(STR_SPLIT(t.text, ' '), x -> x = q.term)) AS tfi
       |  FROM t, s, q JOIN dfq d USING (term)),
       |sc AS (SELECT doc_id, ROUND(list_sum(list(c ORDER BY rank)), 4) AS bm25,
       |       SUM(tfi) AS anytf FROM comp GROUP BY doc_id)
       |SELECT doc_id, bm25 FROM sc WHERE anytf > 0
       |ORDER BY bm25 DESC, doc_id LIMIT $k""".stripMargin
  }

  /** DuckDB replica: vocabulary from first principles (token group-by),
    * the same {self} ∪ deletions neighborhood, the same exact-Levenshtein
    * verify (both engines implement classic DP edit distance). */
  def gateSql(queryTerms: Seq[String] = GateQueryTerms,
              maxEd: Int = GateMaxEd, docsRel: String = "documents",
              prelude: String = ""): String = {
    val qlist = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH ${prelude}vocab AS (
       |  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM (SELECT DISTINCT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS t
       |        FROM $docsRel) GROUP BY t),
       |vv AS (
       |  SELECT term, df,
       |    UNNEST(list_append(list_transform(range(0, LEN(term)),
       |      i -> substr(term, 1, i) || substr(term, i + 2)), term)) AS variant
       |  FROM vocab),
       |qv AS (
       |  SELECT query_term,
       |    UNNEST(list_append(list_transform(range(0, LEN(query_term)),
       |      i -> substr(query_term, 1, i) || substr(query_term, i + 2)), query_term)) AS variant
       |  FROM (SELECT UNNEST([$qlist]) AS query_term)),
       |m AS (SELECT DISTINCT query_term, term, df FROM qv JOIN vv USING (variant))
       |SELECT query_term, term,
       |  CAST(levenshtein(query_term, term) AS BIGINT) AS dist, df
       |FROM m WHERE levenshtein(query_term, term) <= $maxEd
       |ORDER BY query_term, dist, df DESC, term""".stripMargin
  }
}
