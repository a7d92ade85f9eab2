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

  /** DuckDB replica: vocabulary from first principles (token group-by),
    * the same {self} ∪ deletions neighborhood, the same exact-Levenshtein
    * verify (both engines implement classic DP edit distance). */
  def gateSql(queryTerms: Seq[String] = GateQueryTerms,
              maxEd: Int = GateMaxEd): String = {
    val qlist = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""WITH vocab AS (
       |  SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM (SELECT DISTINCT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS t
       |        FROM documents) GROUP BY t),
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
