package graft

import graft.functions.Hashing.h60Sql
import graft.operators.{Dedup, Similarity}

/** DuckDB oracle SQL for the operator pipelines built on the portable
  * [[graft.functions.Hashing.h60]] hash — MinHash/LSH dedup, SimHash,
  * winnowing, multimodal stubs, hyperplane LSH, IVF. Each string replicates
  * its Spark pipeline end-to-end with DuckDB list lambdas
  * (`list_transform` / `list_min` / `list_filter` / `range`), converting the
  * round-1 rows-only checks into exact hash-compared gate rows.
  *
  * Seeded constants (MinHash permutations, LSH hyperplanes) are interpolated
  * as SQL literals from the same Scala generators the Spark side uses —
  * one source of truth for both engines.
  */
object PortableOracles {

  /** MinHash permutation parameters as a DuckDB list literal [[a,b],...]. */
  private val permsLit: String =
    Dedup.permutations(64).map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")

  /** Shared minhash CTE chain over `src(doc_id, text)` — word-level
    * (shingleK=1) signatures, 64 perms, 8 bands of 8 rows. Band keys join on
    * the signature SLICES directly (band-key hashing is a compaction whose
    * equality is equivalent to slice equality). */
  private def minhashCtes(src: String): String =
    s"""base AS (SELECT doc_id, list_transform(STR_SPLIT(text, ' '),
       |           s -> ${h60Sql("s")} % 4294967296) AS h32 FROM $src),
       |sigs AS (SELECT doc_id, list_transform($permsLit,
       |           p -> list_min(list_transform(h32, x -> (p[1]*x + p[2]) % 4294967311))) AS sig
       |         FROM base),
       |banded AS (SELECT doc_id, bi, sig[bi*8+1 : bi*8+8] AS bs
       |           FROM sigs CROSS JOIN (SELECT unnest(range(0, 8)) AS bi))""".stripMargin

  val minhashDedupKeepSql: String =
    s"""WITH ${minhashCtes("documents")},
       |bmin AS (SELECT bi, bs, MIN(doc_id) AS bucket_min FROM banded GROUP BY bi, bs)
       |SELECT b.doc_id, MIN(m.bucket_min) AS rep_id,
       |       MIN(m.bucket_min) = b.doc_id AS keep
       |FROM banded b JOIN bmin m ON b.bi = m.bi AND b.bs = m.bs
       |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin

  val minhashNearDupSql: String =
    s"""WITH docs0 AS (SELECT * FROM documents WHERE doc_id < 500),
       |${minhashCtes("docs0")},
       |sets AS (SELECT doc_id, list_distinct(list_transform(STR_SPLIT(text, ' '),
       |           s -> ${h60Sql("s")})) AS sset FROM docs0),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM banded a JOIN banded b ON a.bi = b.bi AND a.bs = b.bs
       |         WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, jaccard FROM (
       |  SELECT id_a, id_b,
       |    ROUND(CAST(LEN(LIST_INTERSECT(sa.sset, sb.sset)) AS DOUBLE)
       |          / CAST(LEN(LIST_DISTINCT(sa.sset || sb.sset)) AS DOUBLE), 4) AS jaccard
       |  FROM cand JOIN sets sa ON sa.doc_id = cand.id_a
       |            JOIN sets sb ON sb.doc_id = cand.id_b) t
       |WHERE jaccard >= 0.9 ORDER BY id_a, id_b""".stripMargin

  /** Transitive duplicate clusters over the same verified minhash pair
    * graph as [[minhashNearDupSql]]: recursive-CTE transitive closure →
    * min reachable id per node (both edge directions seeded, so every
    * non-singleton node reaches its component minimum), singletons label
    * themselves. Mirrors `Components.componentLabels` (whose large-star/
    * small-star fixpoint provably lands on the same component minima). */
  private def clusterCtes: String =
    s"""WITH RECURSIVE docs0 AS (SELECT * FROM documents WHERE doc_id < 500),
       |${minhashCtes("docs0")},
       |sets AS (SELECT doc_id, list_distinct(list_transform(STR_SPLIT(text, ' '),
       |           s -> ${h60Sql("s")})) AS sset FROM docs0),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM banded a JOIN banded b ON a.bi = b.bi AND a.bs = b.bs
       |         WHERE a.doc_id < b.doc_id),
       |p AS (SELECT id_a, id_b FROM (
       |  SELECT id_a, id_b,
       |    ROUND(CAST(LEN(LIST_INTERSECT(sa.sset, sb.sset)) AS DOUBLE)
       |          / CAST(LEN(LIST_DISTINCT(sa.sset || sb.sset)) AS DOUBLE), 4) AS jaccard
       |  FROM cand JOIN sets sa ON sa.doc_id = cand.id_a
       |            JOIN sets sb ON sb.doc_id = cand.id_b) t
       |  WHERE jaccard >= 0.9),
       |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
       |comp AS (SELECT a AS doc_id, MIN(b) AS m FROM reach GROUP BY a),
       |labels AS (SELECT d.doc_id,
       |  CAST(COALESCE(LEAST(comp.m, d.doc_id), d.doc_id) AS BIGINT) AS component
       |FROM docs0 d LEFT JOIN comp USING (doc_id))""".stripMargin

  val dedupClustersSql: String =
    s"""$clusterCtes
       |SELECT doc_id, component FROM labels ORDER BY doc_id""".stripMargin

  /** [[dedupClustersSql]]'s labels + quality-elected representatives
    * (mirrors `Curation.bestRepKeepOf`): highest quality per component
    * keeps, ties to min doc_id. */
  val bestRepKeepSql: String =
    s"""$clusterCtes,
       |q AS (SELECT doc_id, ${graft.operators.TextAnalysis.qualityExprSql} AS quality FROM docs0),
       |j AS (SELECT l.doc_id, l.component, q.quality FROM labels l JOIN q USING (doc_id)),
       |r AS (SELECT doc_id, component, quality,
       |      ROW_NUMBER() OVER (PARTITION BY component ORDER BY quality DESC, doc_id) AS rn FROM j),
       |win AS (SELECT component, doc_id AS keep_id FROM r WHERE rn = 1)
       |SELECT j.doc_id, j.component, j.quality, j.doc_id = win.keep_id AS keep
       |FROM j JOIN win USING (component) ORDER BY doc_id""".stripMargin

  /** [[dedupClustersSql]]'s labels + the split CASE keyed on the COMPONENT
    * (mirrors `Sampling.splitLeakageSafeOf`): every transitive near-dup
    * cluster lands in one split. */
  val splitLeakageSafeSql: String =
    s"""$clusterCtes
       |SELECT doc_id, component,
       |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT doc_id, component,
       |      ${h60Sql("component::VARCHAR || ':split'")} % 100 AS b FROM labels) t
       |ORDER BY doc_id""".stripMargin

  /** SimHash fingerprint CTE over `src`: h60 token hashes → 64-way sign
    * count. Bits 60–63 of h60 are structurally 0 ⇒ those fingerprint bits
    * are 0 (sum = -n < 0), so the loop covers bits 0–59 only. */
  private def simhashFpExpr(hashListCol: String): String =
    s"""CAST(list_sum(list_transform(range(0, 60),
       |    i -> CASE WHEN 2 * len(list_filter($hashListCol, x -> (x >> i) & 1 = 1)) >= len($hashListCol)
       |              THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT)""".stripMargin

  val simhashNearDupSql: String =
    s"""WITH docs0 AS (SELECT * FROM documents WHERE doc_id < 500),
       |${simhashFpCtes("docs0")},
       |banded AS (SELECT doc_id, bi, (f >> (bi*8)) & 255 AS bk
       |           FROM fp CROSS JOIN (SELECT unnest(range(0, 8)) AS bi)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |         FROM banded a JOIN banded b ON a.bi = b.bi AND a.bk = b.bk
       |         WHERE a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT id_a, id_b, CAST(bit_count(xor(fa.f, fb.f)) AS BIGINT) AS hamming
       |  FROM cand JOIN fp fa ON fa.doc_id = cand.id_a
       |            JOIN fp fb ON fb.doc_id = cand.id_b) t
       |WHERE hamming <= 7 ORDER BY id_a, id_b""".stripMargin

  /** Shared simhash fingerprint CTE chain over `src(doc_id, text)` —
    * h60 token hashes → 64-way sign count (fp bits ≥ 60 structurally 0, so
    * arithmetic shifts match Spark's). Ends in `fp(doc_id, f)`. */
  private def simhashFpCtes(src: String): String =
    s"""hs AS (SELECT doc_id, list_transform(STR_SPLIT(text, ' '),
       |         s -> ${h60Sql("s")}) AS hl FROM $src),
       |fp AS (SELECT doc_id, ${simhashFpExpr("hl")} AS f FROM hs)""".stripMargin

  /** Mirror of [[graft.operators.Dedup.simhashDedupKeep]] over the full
    * corpus: band-bucket min-id election on the h60 simhash fingerprint
    * (the minhashDedupKeepSql pattern over simhash bands). */
  val simhashDedupKeepSql: String =
    s"""WITH ${simhashFpCtes("documents")},
       |banded AS (SELECT doc_id, bi, (f >> (bi*8)) & 255 AS bk
       |           FROM fp CROSS JOIN (SELECT unnest(range(0, 8)) AS bi)),
       |bmin AS (SELECT bi, bk, MIN(doc_id) AS bucket_min
       |         FROM banded GROUP BY bi, bk)
       |SELECT b.doc_id, MIN(m.bucket_min) AS rep_id,
       |       MIN(m.bucket_min) = b.doc_id AS keep
       |FROM banded b JOIN bmin m ON b.bi = m.bi AND b.bk = m.bk
       |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin

  private val wordsExpr = "STR_SPLIT(text, ' ')"
  /** 3-word shingles with the whole-text fallback for short docs —
    * [[Dedup.wordShingles]] k=3. Shared with the decontamination oracle
    * ([[graft.operators.Prep.decontaminateSql]]). */
  private[graft] val shingles3Expr: String =
    s"""CASE WHEN LEN($wordsExpr) >= 3
       | THEN list_transform(range(0, LEN($wordsExpr) - 2),
       |   i -> $wordsExpr[i+1] || ' ' || $wordsExpr[i+2] || ' ' || $wordsExpr[i+3])
       | ELSE [text] END""".stripMargin.replace("\n", "")

  val docFingerprintSql: String =
    s"""WITH g AS (SELECT doc_id, list_transform($shingles3Expr, s -> ${h60Sql("s")}) AS gh,
       |             list_transform($wordsExpr, s -> ${h60Sql("s")}) AS th
       |           FROM documents),
       |f AS (SELECT doc_id, ${simhashFpExpr("th")} AS simhash_fp,
       |  list_sort(list_distinct(list_transform(range(0, GREATEST(LEN(gh) - 4, 0) + 1),
       |    i -> list_min(gh[i+1 : i+4])))) AS mins
       |  FROM g)
       |SELECT d.doc_id, ${h60Sql("d.text")} AS content_fp, f.simhash_fp,
       |       array_to_string(f.mins, '-') AS winnow_fp
       |FROM documents d JOIN f ON f.doc_id = d.doc_id ORDER BY d.doc_id""".stripMargin

  val multimodalFramesSql: String =
    s"""WITH m AS (SELECT doc_id, MD5(text) AS fp,
       |             CAST(1 + OCTET_LENGTH(ENCODE(text)) % 24 AS BIGINT) AS n_frames
       |           FROM documents),
       |x AS (SELECT doc_id, fp, unnest(range(0, n_frames, 4)) AS frame_idx FROM m)
       |SELECT doc_id, frame_idx,
       |  ${h60Sql("fp || '-' || doc_id::VARCHAR || '-' || frame_idx::VARCHAR")} AS frame_hash
       |FROM x ORDER BY doc_id, frame_idx""".stripMargin

  val multimodalFeaturesTopkSql: String = {
    val feat =
      s"""list_transform(range(0, 16), i -> CAST(CAST(
         |${h60Sql("MD5(text) || '-' || i::VARCHAR")} % 2000 AS DOUBLE)/1000.0 - 1.0 AS REAL))""".stripMargin.replace("\n", "")
    s"""WITH f AS (SELECT doc_id AS vec_id, CAST($feat AS DOUBLE[]) AS emb FROM documents)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |  (ROUND(LIST_COSINE_SIMILARITY(a.emb, b.emb), 4) + 0.0) AS sim,
       |  ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |    ORDER BY ROUND(LIST_COSINE_SIMILARITY(a.emb, b.emb), 4) DESC, b.vec_id) AS rn
       |  FROM f a JOIN f b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id IN (0, 1, 2)) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin
  }

  val curationPipelineSql: String = {
    import graft.operators.TextAnalysis.{langExprSql, qualityExprSql}
    s"""WITH exact_kept AS (
       |  SELECT d.* FROM documents d
       |  WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY MD5(text))),
       |${minhashCtes("exact_kept")},
       |bmin AS (SELECT bi, bs, MIN(doc_id) AS bucket_min FROM banded GROUP BY bi, bs),
       |kept AS (SELECT b.doc_id FROM banded b JOIN bmin m ON b.bi = m.bi AND b.bs = m.bs
       |         GROUP BY b.doc_id HAVING MIN(m.bucket_min) = b.doc_id)
       |SELECT doc_id, lang_pred, quality, char_len, ws_tokens, re_tokens FROM (
       |  SELECT d.doc_id, $langExprSql AS lang_pred, $qualityExprSql AS quality,
       |         LENGTH(text) AS char_len, LEN(STR_SPLIT(text, ' ')) AS ws_tokens,
       |         LEN(REGEXP_EXTRACT_ALL(text, '[a-z0-9]+')) AS re_tokens
       |  FROM exact_kept d JOIN kept USING (doc_id)) t
       |WHERE quality >= 0.3 AND lang_pred = 'en' ORDER BY doc_id""".stripMargin
  }

  /** Hyperplane matrix (the same seeded [[Similarity.hyperplanes]] the Spark
    * side bakes into HyperplaneBuckets) as a DOUBLE[][] literal — %.17g
    * round-trips doubles exactly. Built by concatenation at runtime (a
    * single ~100 KB literal would blow the JVM constant-pool limit). */
  private def planesLit: String =
    Similarity.hyperplanes(64, 64)
      .map(_.map(d => String.format(java.util.Locale.ROOT, "%.17g", Double.box(d))).mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  val embeddingNearDupLshSql: String =
    s"""WITH $hyperplaneBucketCtes,
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       |         FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket
       |         WHERE a.vec_id < b2.vec_id)
       |SELECT id_a, id_b, sim FROM (
       |  SELECT id_a, id_b, (ROUND(LIST_COSINE_SIMILARITY(ea.v, eb.v), 4) + 0.0) AS sim
       |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
       |            JOIN e eb ON eb.vec_id = cand.id_b) t
       |WHERE sim >= 0.35 ORDER BY id_a, id_b""".stripMargin

  /** Bucket CTE shared by the hyperplane-LSH oracles: every (vec_id, tbl,
    * bucket) assignment from the same seeded planes the Spark side bakes
    * into HyperplaneBuckets. */
  private def hyperplaneBucketCtes: String =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |pl AS (SELECT $planesLit AS ps),
       |b AS (SELECT vec_id, v, tbl,
       |  CAST(list_sum(list_transform(range(0, 4), i ->
       |    CASE WHEN list_dot_product(v, ps[tbl*4 + i + 1]) >= 0
       |         THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS bucket
       |  FROM e, pl, (SELECT unnest(range(0, 16)) AS tbl) t)""".stripMargin

  /** Mirror of [[graft.operators.Similarity.embeddingDedupKeep]]: bucket-min
    * election + per-vector min over its buckets (the minhashDedupKeepSql
    * pattern over hyperplane buckets). */
  val embeddingDedupKeepSql: String =
    s"""WITH $hyperplaneBucketCtes,
       |bmin AS (SELECT tbl, bucket, MIN(vec_id) AS bucket_min
       |         FROM b GROUP BY tbl, bucket)
       |SELECT b.vec_id, MIN(m.bucket_min) AS rep_id,
       |       MIN(m.bucket_min) = b.vec_id AS keep
       |FROM b JOIN bmin m ON b.tbl = m.tbl AND b.bucket = m.bucket
       |GROUP BY b.vec_id ORDER BY vec_id""".stripMargin

  /** LSH pair-recall replica (`lsh_pair_eval`): pred = the
    * [[embeddingNearDupLshSql]] chain bounded to ids < 300, truth = exact
    * all-pairs at the same threshold/bound, reduced to exact counts + two
    * single divisions. Verified-LSH precision is structurally 1.0; the
    * measured number is band RECALL. */
  val lshPairEvalSql: String =
    s"""WITH $hyperplaneBucketCtes,
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       |         FROM b a JOIN b b2 ON a.tbl = b2.tbl AND a.bucket = b2.bucket
       |         WHERE a.vec_id < b2.vec_id),
       |pred AS (SELECT id_a, id_b FROM (
       |  SELECT id_a, id_b, (ROUND(LIST_COSINE_SIMILARITY(ea.v, eb.v), 4) + 0.0) AS sim
       |  FROM cand JOIN e ea ON ea.vec_id = cand.id_a
       |            JOIN e eb ON eb.vec_id = cand.id_b) t
       |  WHERE sim >= 0.35 AND id_a < 300 AND id_b < 300),
       |truth AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM embeddings a JOIN embeddings b
       |    ON a.vec_id < b.vec_id AND a.vec_id < 300 AND b.vec_id < 300
       |  WHERE ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
       |    CAST(b.embedding AS DOUBLE[])), 4) >= 0.35),
       |hit AS (SELECT p.id_a FROM pred p
       |        JOIN truth t ON p.id_a = t.id_a AND p.id_b = t.id_b),
       |c AS (SELECT (SELECT COUNT(*) FROM truth) AS n_true,
       |             (SELECT COUNT(*) FROM pred) AS n_pred,
       |             (SELECT COUNT(*) FROM hit) AS n_hit)
       |SELECT n_true, n_pred, n_hit,
       |  (ROUND(CASE WHEN n_pred = 0 THEN 0.0
       |     ELSE CAST(n_hit AS DOUBLE) / CAST(n_pred AS DOUBLE) END, 4) + 0.0) AS precision,
       |  (ROUND(CASE WHEN n_true = 0 THEN 0.0
       |     ELSE CAST(n_hit AS DOUBLE) / CAST(n_true AS DOUBLE) END, 4) + 0.0) AS recall
       |FROM c""".stripMargin

  /** Shared IVF-replica prefix: per-label mean centroids, squared-L2
    * distances, argmin assignment (d, then cluster id as tie-break — the
    * lexicographic struct-min rule). Centroid means differ from Spark's in
    * final ulps (summation order), which cannot flip an argmin whose
    * cluster gaps are ~1e-2. Reused by [[annIvfTopkSql]] and
    * [[clusterSampleSql]]. */
  private val ivfAssignCtes: String =
    s"""e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cm AS (SELECT label, i, AVG(v[i]) AS m
       |       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY label, i),
       |cent AS (SELECT label AS cluster, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |dists AS (SELECT e.vec_id, e.v, cent.cluster,
       |            list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |          FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id, v, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists) WHERE rn = 1)""".stripMargin

  /** Full IVF replica: the shared assignment prefix + nprobe=3 probe lists
    * and round-4 cosine top-3. */
  val annIvfTopkSql: String =
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** [[annIvfTopkSql]] with the candidate side semi-joined to the filtered
    * metadata table (lang='en') BEFORE the per-probe top-k — the
    * filtered-vector-search mirror of
    * [[graft.operators.Similarity.ivfTopKFiltered]]. Probes need not pass
    * the filter; k fills from the filtered pool. */
  val annIvfTopkFilteredSql: String =
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  JOIN documents doc ON doc.doc_id = a.vec_id AND doc.lang = 'en'
       |  WHERE p.query_id <> a.vec_id) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** [[annIvfTopkSql]] with the tombstone predicate on the candidate side
    * (vec_id % 10 <> 3) — the delete-aware live view's mirror. Probes stay
    * unfiltered: a deleted probe still queries. */
  val annIvfTopkLiveSql: String =
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id AND a.vec_id % 10 <> 3) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** [[annIvfTopkSql]] with the AS-OF candidate predicate: visible = even
    * ids (ingested in batch 0) minus ids %10==2 (tombstoned at batch 0);
    * the batch-1 ingest (odd ids) and the batch-1 delete (%10==4) are
    * both invisible as of batch 0. Probes stay unfiltered. */
  val annIvfTopkAsofSql: String =
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id
       |    AND a.vec_id % 2 = 0 AND a.vec_id % 10 <> 2) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** Synced-index replica (`ann_ivf_topk_synced`): the quantizer stays
    * trained on v1 (the full embeddings table — frozen serving quantizer),
    * while the CANDIDATE set is v2 = v1 minus ids %7==0 plus re-keyed
    * (+1e6) copies of ids %11==0 — exactly the membership
    * `EmbeddingIndexStream.syncWithCorpus` produces. Probes come from v1
    * (a removed probe still queries; its re-keyed clone may appear). */
  val annIvfTopkSyncedSql: String =
    s"""WITH e0 AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cm AS (SELECT label, i, AVG(v[i]) AS m
       |       FROM e0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY label, i),
       |cent AS (SELECT label AS cluster, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |e2 AS (SELECT vec_id, v FROM e0 WHERE vec_id % 7 <> 0
       |       UNION ALL
       |       SELECT vec_id + 1000000 AS vec_id, v FROM e0 WHERE vec_id % 11 = 0),
       |d2 AS (SELECT e2.vec_id, e2.v, cent.cluster,
       |         list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |       FROM e2 CROSS JOIN cent),
       |assign AS (SELECT vec_id, v, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM d2) WHERE rn = 1),
       |dp AS (SELECT e0.vec_id, e0.v, cent.cluster,
       |         list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |       FROM e0 CROSS JOIN cent WHERE e0.vec_id IN (0, 1, 2, 3, 4)),
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dp) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** In-place-update replica (`ann_ivf_topk_updated`): the quantizer stays
    * trained on v1 (frozen serving quantizer) while ids %13==0 have their
    * embedding REVERSED in v2 — the re-embedded-corpus rollout
    * `EmbeddingIndexStream.syncWithCorpus` now executes as same-id
    * update (append@B + ceiling B−1 tombstone). The LIVE view serves v2
    * (each vector assigned by its own — possibly reversed — value); the
    * AS-OF batch-0 view still serves v1 (the update batch and its
    * tombstone are both invisible at that point in time). Probes query
    * with their v1 vectors in both views. list_reverse moves elements
    * without arithmetic, so both engines score identical vectors. */
  val annIvfTopkUpdatedSql: String =
    s"""WITH $ivfAssignCtes,
       |v2 AS (SELECT vec_id, CASE WHEN vec_id % 13 = 0 THEN list_reverse(v) ELSE v END AS v FROM e),
       |d2 AS (SELECT v2.vec_id, v2.v, cent.cluster,
       |         list_sum(list_transform(range(1, 65), k -> (v2.v[k] - c[k]) * (v2.v[k] - c[k]))) AS d
       |       FROM v2 CROSS JOIN cent),
       |assign2 AS (SELECT vec_id, v, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM d2) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3),
       |live AS (SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign2 a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) t WHERE rn <= 3),
       |asofv AS (SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) t WHERE rn <= 3)
       |SELECT view, query_id, cand_id, sim FROM (
       |  SELECT 'live' AS view, * FROM live UNION ALL SELECT 'asof0' AS view, * FROM asofv)
       |ORDER BY view, query_id, sim DESC, cand_id""".stripMargin

  /** `ann_ivf_topk_updated_pqr`: the LIVE half of [[annIvfTopkUpdatedSql]]
    * standalone — the in-place update composed with the RESIDUAL tier
    * (pool from ceiling-scoped codes, exact rerank against the
    * ceiling-resolved exact dir restores exact scores, so the exact-IVF
    * replica over the UPDATED candidate set applies verbatim — the same
    * containment contract as the other scoped rerank rows). */
  val annIvfTopkUpdatedPqrSql: String =
    s"""WITH $ivfAssignCtes,
       |v2 AS (SELECT vec_id, CASE WHEN vec_id % 13 = 0 THEN list_reverse(v) ELSE v END AS v FROM e),
       |d2 AS (SELECT v2.vec_id, v2.v, cent.cluster,
       |         list_sum(list_transform(range(1, 65), k -> (v2.v[k] - c[k]) * (v2.v[k] - c[k]))) AS d
       |       FROM v2 CROSS JOIN cent),
       |assign2 AS (SELECT vec_id, v, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM d2) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign2 a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** Reclustered-index replica (`ann_ivf_topk_reclustered`): TWO
    * deterministic Lloyd iterations over the full live set, seeded from
    * the per-label means — exactly
    * [[graft.streaming.EmbeddingIndexStream.reclusterIndex]]'s
    * `recenterStep` at iters = 2. The means are DECIMAL(27,18)-summed then
    * divided in double on BOTH engines (the order-independent mean the
    * Spark side computes), an empty cell keeps its previous centroid
    * (COALESCE over the LEFT join), ties assign to the lowest cluster id.
    * The query then probes the RE-ASSIGNED layout with the retrained
    * quantizer — the whole recluster lifecycle verb, oracle-gated instead
    * of spec-only. Final scores come from exact candidate vectors, so
    * last-ulp mean differences (double→decimal cast rounding) cannot move
    * anything but an argmin whose gaps are ~1e-2. */
  val annIvfTopkReclusteredSql: String = {
    def lloydRound(n: Int, prevAssign: String, prevCent: String): String =
      s"""m$n AS (SELECT cluster, i, CAST(SUM(CAST(v[i] AS DECIMAL(27,18))) AS DOUBLE) / COUNT(*) AS m
         |       FROM $prevAssign CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY cluster, i),
         |cent$n AS (SELECT p.cluster, COALESCE(n.c, p.c) AS c FROM $prevCent p
         |          LEFT JOIN (SELECT cluster, list(m ORDER BY i) AS c FROM m$n GROUP BY cluster) n
         |          USING (cluster)),
         |d${n + 1} AS (SELECT e.vec_id, e.v, cent$n.cluster,
         |         list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
         |       FROM e CROSS JOIN cent$n),
         |a${n + 1} AS (SELECT vec_id, v, cluster FROM (
         |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
         |         FROM d${n + 1}) WHERE rn = 1)""".stripMargin
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cm AS (SELECT label, i, AVG(v[i]) AS m
       |       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY label, i),
       |cent0 AS (SELECT label AS cluster, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |d1 AS (SELECT e.vec_id, e.v, cent0.cluster,
       |         list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |       FROM e CROSS JOIN cent0),
       |a1 AS (SELECT vec_id, v, cluster FROM (
       |         SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |         FROM d1) WHERE rn = 1),
       |${lloydRound(1, "a1", "cent0")},
       |${lloydRound(2, "a2", "cent1")},
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM d3 WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN a3 a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.clusterSampleOf]]: the shared
    * assignment prefix, per-cluster sizes, the salted-h60 within-cluster
    * race, quota = ⌈√n_c⌉. */
  val clusterSampleSql: String =
    s"""WITH $ivfAssignCtes,
       |cnt AS (SELECT cluster, COUNT(*) AS n_c FROM assign GROUP BY cluster),
       |rk AS (SELECT vec_id, cluster,
       |         ROW_NUMBER() OVER (PARTITION BY cluster
       |           ORDER BY ${graft.functions.Hashing.h60Sql("vec_id::VARCHAR || ':csample'")}, vec_id) AS rk
       |       FROM assign)
       |SELECT r.vec_id, CAST(r.cluster AS BIGINT) AS cluster, c.n_c,
       |CAST(CEIL(SQRT(c.n_c)) AS BIGINT) AS quota, r.rk
       |FROM rk r JOIN cnt c USING (cluster)
       |WHERE r.rk <= CEIL(SQRT(c.n_c)) ORDER BY vec_id""".stripMargin

  /** [[annIvfTopkSql]]'s chain with int8 max-abs quantization on BOTH sides
    * and the integer cosine (mirrors `Similarity.ivfTopKIndexedQuantized` /
    * `CosineI8`): quantized values are small exact integers carried in
    * doubles, so dot and norms are exact on both engines and
    * `dot / SQRT(na·nb)` is bit-identical IEEE arithmetic. Assignment stays
    * full-precision (identical list membership to the exact index);
    * zero-norm candidates drop via `na·nb > 0` (the kernel's NaN rule). */
  val annIvfTopkQuantizedSql: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cm AS (SELECT label, i, AVG(v[i]) AS m
       |       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY label, i),
       |cent AS (SELECT label AS cluster, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |dists AS (SELECT e.vec_id, e.v, cent.cluster,
       |            list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |          FROM e CROSS JOIN cent),
       |q AS (SELECT vec_id,
       |        CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
       |             ELSE list_transform(v, x -> ROUND(x * 127.0 / mx)) END AS qv
       |      FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e)),
       |assign AS (SELECT vec_id, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT query_id, cand_id, sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
       |  FROM (
       |    SELECT p.query_id, a.vec_id AS cand_id,
       |      (ROUND(list_sum(list_transform(range(1, 65), k -> pq.qv[k] * cq.qv[k]))
       |        / SQRT(list_sum(list_transform(pq.qv, x -> x * x))
       |             * list_sum(list_transform(cq.qv, x -> x * x))), 4) + 0.0) AS sim
       |    FROM probes p JOIN assign a ON a.cluster = p.cluster
       |         JOIN q pq ON pq.vec_id = p.query_id
       |         JOIN q cq ON cq.vec_id = a.vec_id
       |    WHERE p.query_id <> a.vec_id
       |      AND list_sum(list_transform(pq.qv, x -> x * x)) > 0
       |      AND list_sum(list_transform(cq.qv, x -> x * x)) > 0) s) t
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** Two-stage rerank replica (`Similarity.ivfTopKQuantizedRerank`): the
    * [[annIvfTopkQuantizedSql]] chain widened to a pool of poolMult·k = 12
    * int8 candidates per probe, then rescored with EXACT cosine against the
    * full-precision vectors and cut to top-3. The oracle replays the actual
    * two-stage semantics (pool race int8, rerank exact, both tie-broken on
    * cand_id) — it does not assume the pool contains the true top-3. */
  val annIvfTopkRerankSql: String =
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cm AS (SELECT label, i, AVG(v[i]) AS m
       |       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY label, i),
       |cent AS (SELECT label AS cluster, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |dists AS (SELECT e.vec_id, e.v, cent.cluster,
       |            list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |          FROM e CROSS JOIN cent),
       |q AS (SELECT vec_id,
       |        CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
       |             ELSE list_transform(v, x -> ROUND(x * 127.0 / mx)) END AS qv
       |      FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e)),
       |assign AS (SELECT vec_id, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3),
       |pool AS (SELECT query_id, cand_id FROM (
       |  SELECT query_id, cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
       |  FROM (
       |    SELECT p.query_id, a.vec_id AS cand_id,
       |      (ROUND(list_sum(list_transform(range(1, 65), k -> pq.qv[k] * cq.qv[k]))
       |        / SQRT(list_sum(list_transform(pq.qv, x -> x * x))
       |             * list_sum(list_transform(cq.qv, x -> x * x))), 4) + 0.0) AS sim
       |    FROM probes p JOIN assign a ON a.cluster = p.cluster
       |         JOIN q pq ON pq.vec_id = p.query_id
       |         JOIN q cq ON cq.vec_id = a.vec_id
       |    WHERE p.query_id <> a.vec_id
       |      AND list_sum(list_transform(pq.qv, x -> x * x)) > 0
       |      AND list_sum(list_transform(cq.qv, x -> x * x)) > 0) s) t
       |  WHERE rn <= 12)
       |SELECT query_id, cand_id, sim FROM (
       |  SELECT pl.query_id, pl.cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(eq.v, ec.v), 4) + 0.0) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY pl.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(eq.v, ec.v), 4) DESC, pl.cand_id) AS rn
       |  FROM pool pl JOIN e eq ON eq.vec_id = pl.query_id
       |       JOIN e ec ON ec.vec_id = pl.cand_id
       |  WHERE NOT ISNAN(LIST_COSINE_SIMILARITY(eq.v, ec.v))) t2
       |WHERE rn <= 3 ORDER BY query_id, sim DESC, cand_id""".stripMargin

  /** Retrieval-evaluation replica (`Retrieval.retrievalEvalGate`): the IVF
    * retriever's top-3 (the annIvfTopkSql core) LEFT-joined against
    * brute-force exact top-3 ground truth, reduced per query to recall@k /
    * MRR / fixed-point nDCG. The DCG weights are integer literals
    * interpolated from the same [[graft.operators.Retrieval.dcgWeightsFp]]
    * the Spark side uses — the per-query DCG sum is exact Long arithmetic
    * on both engines (double sums of ≥3 terms are order-dependent;
    * integer sums are not). */
  val retrievalEvalSql: String = {
    import graft.operators.Retrieval
    val k = 3
    val w = Retrieval.dcgWeightsFp(k)
    val wLit = w.mkString("[", ",", "]")
    val idcg = w.sum
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3),
       |approx AS (SELECT query_id, cand_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) ar WHERE rn <= $k),
       |exact AS (SELECT query_id, cand_id FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) DESC, b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id IN (0, 1, 2, 3, 4)) ex WHERE rn <= $k),
       |hits AS (SELECT a.query_id, a.rank,
       |  CASE WHEN e.cand_id IS NULL THEN 0 ELSE 1 END AS hit,
       |  ($wLit)[a.rank] AS wt
       |  FROM approx a LEFT JOIN exact e
       |    ON e.query_id = a.query_id AND e.cand_id = a.cand_id)
       |SELECT query_id,
       |  CAST(SUM(hit) AS BIGINT) AS n_hits,
       |  (ROUND(CAST(SUM(hit) AS DOUBLE) / CAST($k AS DOUBLE), 4) + 0.0) AS recall,
       |  (ROUND(COALESCE(CAST(1 AS DOUBLE) / MIN(CASE WHEN hit = 1 THEN rank END), 0.0), 6) + 0.0) AS mrr,
       |  (ROUND(CAST(SUM(CASE WHEN hit = 1 THEN wt ELSE 0 END) AS DOUBLE)
       |    / CAST($idcg AS DOUBLE), 4) + 0.0) AS ndcg
       |FROM hits GROUP BY query_id ORDER BY query_id""".stripMargin
  }

  /** [[retrievalEvalSql]]'s QUANTIZED twin (`retrieval_eval_quantized`):
    * the approx side is the int8 retriever's top-3 (the
    * [[annIvfTopkQuantizedSql]] chain — max-abs quantization on both
    * sides, exact integer cosine), the truth side brute-force exact top-3
    * — so the row IS the int8 tier's measured recall, oracle-verified
    * (the STRESS.md recall claims as a queryable metric). */
  val retrievalEvalQuantizedSql: String = {
    import graft.operators.Retrieval
    val k = 3
    val w = Retrieval.dcgWeightsFp(k)
    val wLit = w.mkString("[", ",", "]")
    val idcg = w.sum
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cm AS (SELECT label, i, AVG(v[i]) AS m
       |       FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i) GROUP BY label, i),
       |cent AS (SELECT label AS cluster, list(m ORDER BY i) AS c FROM cm GROUP BY label),
       |dists AS (SELECT e.vec_id, e.v, cent.cluster,
       |            list_sum(list_transform(range(1, 65), k -> (v[k] - c[k]) * (v[k] - c[k]))) AS d
       |          FROM e CROSS JOIN cent),
       |q AS (SELECT vec_id,
       |        CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
       |             ELSE list_transform(v, x -> ROUND(x * 127.0 / mx)) END AS qv
       |      FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e)),
       |assign AS (SELECT vec_id, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3),
       |approx AS (SELECT query_id, cand_id, rn AS rank FROM (
       |  SELECT query_id, cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, cand_id) AS rn
       |  FROM (
       |    SELECT p.query_id, a.vec_id AS cand_id,
       |      (ROUND(list_sum(list_transform(range(1, 65), k -> pq.qv[k] * cq.qv[k]))
       |        / SQRT(list_sum(list_transform(pq.qv, x -> x * x))
       |             * list_sum(list_transform(cq.qv, x -> x * x))), 4) + 0.0) AS sim
       |    FROM probes p JOIN assign a ON a.cluster = p.cluster
       |         JOIN q pq ON pq.vec_id = p.query_id
       |         JOIN q cq ON cq.vec_id = a.vec_id
       |    WHERE p.query_id <> a.vec_id
       |      AND list_sum(list_transform(pq.qv, x -> x * x)) > 0
       |      AND list_sum(list_transform(cq.qv, x -> x * x)) > 0) s) t
       |  WHERE rn <= $k),
       |exact AS (SELECT query_id, cand_id FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) DESC, b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id IN (0, 1, 2, 3, 4)) ex WHERE rn <= $k),
       |hits AS (SELECT a.query_id, a.rank,
       |  CASE WHEN x.cand_id IS NULL THEN 0 ELSE 1 END AS hit,
       |  ($wLit)[a.rank] AS wt
       |  FROM approx a LEFT JOIN exact x
       |    ON x.query_id = a.query_id AND x.cand_id = a.cand_id)
       |SELECT query_id,
       |  CAST(SUM(hit) AS BIGINT) AS n_hits,
       |  (ROUND(CAST(SUM(hit) AS DOUBLE) / CAST($k AS DOUBLE), 4) + 0.0) AS recall,
       |  (ROUND(COALESCE(CAST(1 AS DOUBLE) / MIN(CASE WHEN hit = 1 THEN rank END), 0.0), 6) + 0.0) AS mrr,
       |  (ROUND(CAST(SUM(CASE WHEN hit = 1 THEN wt ELSE 0 END) AS DOUBLE)
       |    / CAST($idcg AS DOUBLE), 4) + 0.0) AS ndcg
       |FROM hits GROUP BY query_id ORDER BY query_id""".stripMargin
  }

  /** MMR re-ranking replica (`Retrieval.mmrRerankGate`): the greedy
    * selection unrolled into k chained pick/state CTE pairs (k is a fixed
    * gate parameter, so no recursion is needed): pool = the IVF replica's
    * top-10 per probe carrying the candidate vectors; psim = the pool
    * self-join's rounded cosines; each stage picks the per-query argmax of
    * λ·rel − (1−λ)·COALESCE(maxsim, 0) with cand_id ties and folds the
    * pick's similarities into the survivors' maxsim. Every float the
    * stages compare comes from the shared round-4 kernel, so the argmax
    * inputs are identical on both engines. */
  val mmrRerankSql: String = {
    import graft.operators.Retrieval
    val k = Retrieval.MmrK
    val L = Retrieval.HybridL
    val probeIdsIn = Retrieval.HybridTermSets.map(_._1).mkString(", ")
    // λ interpolated from the ONE Scala constant the Spark side uses —
    // editing Retrieval.MmrLambda can no longer silently diverge the oracle
    val scoreSql =
      s"${Retrieval.MmrLambda} * rel - ${1.0 - Retrieval.MmrLambda} * COALESCE(maxsim, 0.0)"
    val stages = (1 to k).map { n =>
      val prev = s"st${n - 1}"
      val pick =
        s"""pick$n AS (SELECT query_id, cand_id,
           |  (ROUND($scoreSql, 6) + 0.0) AS mmr,
           |  CAST($n AS BIGINT) AS rank FROM (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |    ORDER BY $scoreSql DESC, cand_id) AS rn
           |  FROM $prev) p WHERE rn = 1)""".stripMargin
      val st = if (n == k) "" else
        s""",
           |st$n AS (SELECT s.query_id, s.cand_id, s.rel,
           |  CASE WHEN ps.sim IS NULL THEN s.maxsim
           |       WHEN s.maxsim IS NULL THEN ps.sim
           |       ELSE GREATEST(s.maxsim, ps.sim) END AS maxsim
           |  FROM $prev s
           |  JOIN pick$n p ON p.query_id = s.query_id AND s.cand_id <> p.cand_id
           |  LEFT JOIN psim ps ON ps.query_id = s.query_id
           |    AND ps.a = s.cand_id AND ps.b = p.cand_id)""".stripMargin
      pick + st
    }.mkString(",\n")
    val picksUnion = (1 to k).map(n => s"SELECT * FROM pick$n").mkString(" UNION ALL ")
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN ($probeIdsIn)) WHERE rn <= 3),
       |pool AS (SELECT query_id, cand_id, rel, cv FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    (ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) + 0.0) AS rel, a.v AS cv,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) pr WHERE rn <= $L),
       |psim AS (SELECT p1.query_id, p1.cand_id AS a, p2.cand_id AS b,
       |  (ROUND(LIST_COSINE_SIMILARITY(p1.cv, p2.cv), 4) + 0.0) AS sim
       |  FROM pool p1 JOIN pool p2
       |    ON p1.query_id = p2.query_id AND p1.cand_id <> p2.cand_id),
       |st0 AS (SELECT query_id, cand_id, rel, CAST(NULL AS DOUBLE) AS maxsim FROM pool),
       |$stages
       |SELECT query_id, cand_id, mmr, rank FROM ($picksUnion) allp
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Hybrid-retrieval replica (`Retrieval.hybridTopkRrf`): the
    * [[ivfAssignCtes]] dense ranks (probe ids 0/1/2, rounded cosine,
    * top-10) full-outer-joined with per-query BM25 ranks (one tf pass over
    * the UNION of the term sets — the bm25TopkSql chain — then per-query
    * score sums), fused with EXACT scaled-integer RRF: rrf_num =
    * Σ lcm/(60+rank), lcm = lcm(61..70) interpolated from the same
    * [[graft.operators.Retrieval.rrfLcm]] the Spark side uses — integer
    * division is exact on both engines, zero float hazard in the fused
    * score. */
  val hybridTopkRrfSql: String = {
    import graft.operators.Retrieval
    val querySets = Retrieval.HybridTermSets
    val terms = querySets.flatMap(_._2).distinct
    val lcm = Retrieval.rrfLcm(Retrieval.RrfC, Retrieval.HybridL)
    val probeIdsIn = querySets.map(_._1).mkString(", ")
    val tfCols = graft.operators.TextAnalysis.bm25SqlTfCols(terms)
    val dfCols = graft.operators.TextAnalysis.bm25SqlDfCols(terms.size)
    val tIdx = terms.zipWithIndex.toMap
    // the ONE shared fragment builder (TextAnalysis) — nothing to drift
    def scoreSql(qts: Seq[String]): String =
      qts.map(t => graft.operators.TextAnalysis.bm25SqlScoreTerm(tIdx(t)))
        .mkString(" + ")
    val lexBranches = querySets.map { case (qid, qts) =>
      s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, ROUND(${scoreSql(qts)}, 4) AS s FROM t, st"
    }.mkString("\n|  UNION ALL ")
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN ($probeIdsIn)) WHERE rn <= 3),
       |dense AS (SELECT query_id, cand_id AS doc_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) dr WHERE rn <= ${Retrieval.HybridL}),
       |t AS (
       |  SELECT doc_id,
       |    CAST(LEN(STR_SPLIT(text, ' ')) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, $dfCols FROM t),
       |lexs AS (
       |  $lexBranches),
       |lex AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rank
       |  FROM lexs WHERE s > 0) lr WHERE rank <= ${Retrieval.HybridL}),
       |fused AS (SELECT
       |    COALESCE(l.query_id, d.query_id) AS query_id,
       |    COALESCE(l.doc_id, d.doc_id) AS doc_id,
       |    COALESCE($lcm // (${Retrieval.RrfC} + l.rank), 0)
       |      + COALESCE($lcm // (${Retrieval.RrfC} + d.rank), 0) AS rrf_num
       |  FROM lex l FULL OUTER JOIN dense d
       |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
       |SELECT query_id, doc_id, CAST(rrf_num AS BIGINT) AS rrf_num, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_num DESC, doc_id) AS rank FROM fused) f
       |WHERE rank <= ${Retrieval.HybridK} ORDER BY query_id, rank""".stripMargin
  }

  /** Three-retriever hybrid replica (`hybrid_topk_rrf3`): the
    * [[hybridTopkRrfSql]] lexical + dense-exact lists joined by a THIRD
    * ranked list — the int8 quantized retriever (the
    * [[annIvfTopkQuantizedSql]] scoring chain at depth 10) — fused with
    * the N-list exact integer form: per-rank numerators lcm/(c+rank) are
    * BIGINT literals interpolated from the same
    * [[graft.operators.Retrieval.rrfNumerators]] the Spark side uses, the
    * fused score a pure integer SUM over the unioned lists (no division
    * runs on either engine). */
  val hybridTopkRrf3Sql: String = {
    import graft.operators.Retrieval
    val querySets = Retrieval.HybridTermSets
    val terms = querySets.flatMap(_._2).distinct
    val L = Retrieval.HybridL
    val nums = Retrieval.rrfNumerators(Retrieval.RrfC, L)
    val numsLit = nums.mkString("[", ",", "]")
    val probeIdsIn = querySets.map(_._1).mkString(", ")
    val tfCols = graft.operators.TextAnalysis.bm25SqlTfCols(terms)
    val dfCols = graft.operators.TextAnalysis.bm25SqlDfCols(terms.size)
    val tIdx = terms.zipWithIndex.toMap
    // the ONE shared fragment builder (TextAnalysis) — nothing to drift
    def scoreSql(qts: Seq[String]): String =
      qts.map(t => graft.operators.TextAnalysis.bm25SqlScoreTerm(tIdx(t)))
        .mkString(" + ")
    val lexBranches = querySets.map { case (qid, qts) =>
      s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, ROUND(${scoreSql(qts)}, 4) AS s FROM t, st"
    }.mkString("\n|  UNION ALL ")
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN ($probeIdsIn)) WHERE rn <= 3),
       |dense AS (SELECT query_id, cand_id AS doc_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) dr WHERE rn <= $L),
       |q AS (SELECT vec_id,
       |        CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
       |             ELSE list_transform(v, x -> ROUND(x * 127.0 / mx)) END AS qv
       |      FROM (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e)),
       |quant AS (SELECT query_id, cand_id AS doc_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY (ROUND(list_sum(list_transform(range(1, 65), k -> pq.qv[k] * cq.qv[k]))
       |        / SQRT(list_sum(list_transform(pq.qv, x -> x * x))
       |             * list_sum(list_transform(cq.qv, x -> x * x))), 4) + 0.0) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |       JOIN q pq ON pq.vec_id = p.query_id
       |       JOIN q cq ON cq.vec_id = a.vec_id
       |  WHERE p.query_id <> a.vec_id
       |    AND list_sum(list_transform(pq.qv, x -> x * x)) > 0
       |    AND list_sum(list_transform(cq.qv, x -> x * x)) > 0) qr WHERE rn <= $L),
       |t AS (
       |  SELECT doc_id,
       |    CAST(LEN(STR_SPLIT(text, ' ')) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, $dfCols FROM t),
       |lexs AS (
       |  $lexBranches),
       |lex AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rank
       |  FROM lexs WHERE s > 0) lr WHERE rank <= $L),
       |fused AS (SELECT query_id, doc_id, CAST(SUM(num) AS BIGINT) AS rrf_num FROM (
       |    SELECT query_id, doc_id, ($numsLit)[rank] AS num FROM lex
       |    UNION ALL SELECT query_id, doc_id, ($numsLit)[rank] AS num FROM dense
       |    UNION ALL SELECT query_id, doc_id, ($numsLit)[rank] AS num FROM quant) u
       |  GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, rrf_num, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_num DESC, doc_id) AS rank FROM fused) f
       |WHERE rank <= ${Retrieval.HybridK} ORDER BY query_id, rank""".stripMargin
  }

  /** Proximity-fused hybrid replica (`hybrid_topk_prox`, round 19): the
    * [[hybridTopkRrf3Sql]] lexical + dense-exact lists joined by a
    * PROXIMITY ranked list — each query's term pair ranks co-occurrence
    * docs by (min token distance asc, doc_id asc), replayed from
    * first-principles token positions (the proximityMatchSql nested-min) —
    * fused with the same N-list exact-integer RRF (BIGINT numerators
    * interpolated from [[graft.operators.Retrieval.rrfNumerators]]). */
  val hybridTopkProxSql: String = {
    import graft.operators.Retrieval
    val querySets = Retrieval.HybridTermSets
    val terms = querySets.flatMap(_._2).distinct
    val L = Retrieval.HybridL
    val nums = Retrieval.rrfNumerators(Retrieval.RrfC, L)
    val numsLit = nums.mkString("[", ",", "]")
    val probeIdsIn = querySets.map(_._1).mkString(", ")
    val tfCols = graft.operators.TextAnalysis.bm25SqlTfCols(terms)
    val dfCols = graft.operators.TextAnalysis.bm25SqlDfCols(terms.size)
    val tIdx = terms.zipWithIndex.toMap
    def scoreSql(qts: Seq[String]): String =
      qts.map(t => graft.operators.TextAnalysis.bm25SqlScoreTerm(tIdx(t)))
        .mkString(" + ")
    val lexBranches = querySets.map { case (qid, qts) =>
      s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, ROUND(${scoreSql(qts)}, 4) AS s FROM t, st"
    }.mkString("\n|  UNION ALL ")
    val proxBranches = querySets.map { case (qid, qts) =>
      val (ta, tb) = (qts(0), qts(1))
      s"""SELECT CAST($qid AS BIGINT) AS query_id, doc_id,
         |    list_min(list_transform(pa, a -> list_min(list_transform(pb, b -> abs(a - b))))) AS min_dist
         |  FROM (SELECT doc_id,
         |    LIST_FILTER(range(0, LEN(toks)), p -> toks[p+1] = '$ta') AS pa,
         |    LIST_FILTER(range(0, LEN(toks)), p -> toks[p+1] = '$tb') AS pb FROM tok)
         |  WHERE LEN(pa) > 0 AND LEN(pb) > 0""".stripMargin
    }.mkString("\n|  UNION ALL ")
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN ($probeIdsIn)) WHERE rn <= 3),
       |dense AS (SELECT query_id, cand_id AS doc_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id) dr WHERE rn <= $L),
       |tok AS (SELECT doc_id, STR_SPLIT(text, ' ') AS toks FROM documents),
       |proxs AS (
       |  $proxBranches),
       |prox AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY min_dist, doc_id) AS rank
       |  FROM proxs) pr WHERE rank <= $L),
       |t AS (
       |  SELECT doc_id,
       |    CAST(LEN(STR_SPLIT(text, ' ')) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, $dfCols FROM t),
       |lexs AS (
       |  $lexBranches),
       |lex AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rank
       |  FROM lexs WHERE s > 0) lr WHERE rank <= $L),
       |fused AS (SELECT query_id, doc_id, CAST(SUM(num) AS BIGINT) AS rrf_num FROM (
       |    SELECT query_id, doc_id, ($numsLit)[rank] AS num FROM lex
       |    UNION ALL SELECT query_id, doc_id, ($numsLit)[rank] AS num FROM dense
       |    UNION ALL SELECT query_id, doc_id, ($numsLit)[rank] AS num FROM prox) u
       |  GROUP BY query_id, doc_id)
       |SELECT query_id, doc_id, rrf_num, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_num DESC, doc_id) AS rank FROM fused) f
       |WHERE rank <= ${Retrieval.HybridK} ORDER BY query_id, rank""".stripMargin
  }

  /** LIVE-composed hybrid replica (`hybrid_topk_live`, round 20 — verdict
    * r19 item 3): the [[hybridTopkRrfSql]] chain with BOTH legs cut to the
    * live sets — the lexical BM25 branches run over the v2 view (the
    * churned corpus the compacted lexical index serves) and the dense IVF
    * candidates carry the tombstone predicate `vec_id % 10 <> 3` (the
    * [[retrievalEvalLiveSql]] live-read form). Fused with the same exact
    * scaled-integer RRF (lcm interpolated, integer division exact on both
    * engines) — one row proving the SERVING STACK, not each index alone,
    * is lifecycle-consistent.
    *
    * LAZY: this is the one oracle here whose prelude reads a TextAnalysis
    * VAL (lexLiveV2Cte — interpolated, so not a compile-time constant);
    * TextAnalysis's own init references PortableOracles, and an eager val
    * would read an empty prelude through the partially-initialized object
    * (the round-18 k1-zeroing cycle, caught again this round as a missing
    * v2 CTE). Evaluation at gate time sees both objects complete. */
  lazy val hybridTopkLiveSql: String = {
    import graft.operators.Retrieval
    val querySets = Retrieval.HybridTermSets
    val terms = querySets.flatMap(_._2).distinct
    val lcm = Retrieval.rrfLcm(Retrieval.RrfC, Retrieval.HybridL)
    val probeIdsIn = querySets.map(_._1).mkString(", ")
    val tfCols = graft.operators.TextAnalysis.bm25SqlTfCols(terms)
    val dfCols = graft.operators.TextAnalysis.bm25SqlDfCols(terms.size)
    val tIdx = terms.zipWithIndex.toMap
    def scoreSql(qts: Seq[String]): String =
      qts.map(t => graft.operators.TextAnalysis.bm25SqlScoreTerm(tIdx(t)))
        .mkString(" + ")
    val lexBranches = querySets.map { case (qid, qts) =>
      s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, ROUND(${scoreSql(qts)}, 4) AS s FROM t, st"
    }.mkString("\n|  UNION ALL ")
    s"""WITH ${graft.operators.TextAnalysis.lexLiveV2Cte}$ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN ($probeIdsIn)) WHERE rn <= 3),
       |dense AS (SELECT query_id, cand_id AS doc_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id AND a.vec_id % 10 <> 3) dr
       |  WHERE rn <= ${Retrieval.HybridL}),
       |t AS (
       |  SELECT doc_id,
       |    CAST(LEN(STR_SPLIT(text, ' ')) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM v2),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl, $dfCols FROM t),
       |lexs AS (
       |  $lexBranches),
       |lex AS (SELECT query_id, doc_id, rank FROM (
       |  SELECT query_id, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rank
       |  FROM lexs WHERE s > 0) lr WHERE rank <= ${Retrieval.HybridL}),
       |fused AS (SELECT
       |    COALESCE(l.query_id, d.query_id) AS query_id,
       |    COALESCE(l.doc_id, d.doc_id) AS doc_id,
       |    COALESCE($lcm // (${Retrieval.RrfC} + l.rank), 0)
       |      + COALESCE($lcm // (${Retrieval.RrfC} + d.rank), 0) AS rrf_num
       |  FROM lex l FULL OUTER JOIN dense d
       |    ON l.query_id = d.query_id AND l.doc_id = d.doc_id)
       |SELECT query_id, doc_id, CAST(rrf_num AS BIGINT) AS rrf_num, rank FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY rrf_num DESC, doc_id) AS rank FROM fused) f
       |WHERE rank <= ${Retrieval.HybridK} ORDER BY query_id, rank""".stripMargin
  }

  /** Live-tier retrieval-quality replica (`retrieval_eval_live`): the
    * delete path's recall self-measured at k=10 — approx = the live IVF
    * read (nprobe 3, candidate predicate vec_id % 10 <> 3, the
    * annIvfTopkLiveSql chain), truth = brute-force exact top-10 over the
    * SAME live candidate set (probes keep querying from the full table —
    * a deleted probe still queries), reduced with the shared fixed-point
    * recall/MRR/nDCG arithmetic at k=10 weights. */
  val retrievalEvalLiveSql: String = {
    import graft.operators.Retrieval
    val k = 10
    val w = Retrieval.dcgWeightsFp(k)
    val wLit = w.mkString("[", ",", "]")
    val idcg = w.sum
    s"""WITH $ivfAssignCtes,
       |probes AS (SELECT vec_id AS query_id, v AS qv, cluster FROM (
       |             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
       |             FROM dists WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 3),
       |approx AS (SELECT query_id, cand_id, rn AS rank FROM (
       |  SELECT p.query_id, a.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY p.query_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(p.qv, a.v), 4) DESC, a.vec_id) AS rn
       |  FROM probes p JOIN assign a ON a.cluster = p.cluster
       |  WHERE p.query_id <> a.vec_id AND a.vec_id % 10 <> 3) ar WHERE rn <= $k),
       |exact AS (SELECT query_id, cand_id FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
       |    ROW_NUMBER() OVER (PARTITION BY a.vec_id
       |      ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) DESC, b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id IN (0, 1, 2, 3, 4) AND b.vec_id % 10 <> 3) ex WHERE rn <= $k),
       |hits AS (SELECT a.query_id, a.rank,
       |  CASE WHEN e.cand_id IS NULL THEN 0 ELSE 1 END AS hit,
       |  ($wLit)[a.rank] AS wt
       |  FROM approx a LEFT JOIN exact e
       |    ON e.query_id = a.query_id AND e.cand_id = a.cand_id)
       |SELECT query_id,
       |  CAST(SUM(hit) AS BIGINT) AS n_hits,
       |  (ROUND(CAST(SUM(hit) AS DOUBLE) / CAST($k AS DOUBLE), 4) + 0.0) AS recall,
       |  (ROUND(COALESCE(CAST(1 AS DOUBLE) / MIN(CASE WHEN hit = 1 THEN rank END), 0.0), 6) + 0.0) AS mrr,
       |  (ROUND(CAST(SUM(CASE WHEN hit = 1 THEN wt ELSE 0 END) AS DOUBLE)
       |    / CAST($idcg AS DOUBLE), 4) + 0.0) AS ndcg
       |FROM hits GROUP BY query_id ORDER BY query_id""".stripMargin
  }
}
