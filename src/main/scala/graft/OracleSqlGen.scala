package graft

import graft.functions.CrossHash
import graft.functions.CrossHash._
import graft.operators.Similarity

/** Machine-generated DuckDB oracle SQL for the hash-family queries
  * (MinHash-LSH, SimHash, SRP-LSH KNN, IVF KNN, RRF fusion, embed-KNN).
  *
  * These pipelines are deterministic end-to-end once token/gram hashing uses
  * the CrossHash md5 family, but their transcription needs per-seed constants,
  * per-table hyperplane literals, and N-way band joins — so the SQL is built
  * programmatically from the SAME constants the Spark operators embed
  * (CrossHash.mixers, Similarity.srpPlanes). Floating-point folds use the
  * DuckDB `list_reduce(list_transform(...))` left-to-right idiom, proven
  * bit-exact against Spark's `aggregate` fold by the green knn_brute_force /
  * embedding_cosine_pairs oracles.
  */
object OracleSqlGen {

  /** plantedDocs twin (SparkEntry.plantedDocs): originals + near-dup copies. */
  private val planted =
    """u AS (SELECT doc_id, text FROM documents
      |     UNION ALL SELECT doc_id + 20000, text || ' extra' FROM documents WHERE doc_id < 50)""".stripMargin

  /** Deterministic cosine between two DOUBLE-castable list columns, matching
    * Similarity.cosine's left-to-right folds. */
  private def cos(a: String, b: String, dim: Int): String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(generate_series(1, $dim), " +
        s"i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (p, q) -> p + q)"
    s"(${dot(a, b)} / (SQRT(${dot(a, a)}) * SQRT(${dot(b, b)})))"
  }

  /** CTE chain shared by the MinHash oracles: corpus CTE (must define `u`)
    * → normalize → shingle → hash → 32-slot signatures → banded candidate
    * self-joins → estimate prefilter → exact-jaccard verified `dup` pairs.
    * The twin of Dedup.minhashCore. */
  private def minhashCtes(corpus: String, k: Int, numHashes: Int, bands: Int,
      threshold: Double): String = {
    val rpb = numHashes / bands
    val shingle =
      s"list_transform(generate_series(1, GREATEST(length(nrm) - ${k - 1}, 1)), i -> substr(nrm, i, $k))"
    val mins = (0 until numHashes).map(s => s"MIN(${duckMix("gu", s)}) AS h$s").mkString(", ")
    val bandJoins = (0 until bands).map { b =>
      val conds = (b * rpb until (b + 1) * rpb).map(s => s"l.h$s = r.h$s").mkString(" AND ")
      s"SELECT l.id AS id1, r.id AS id2 FROM sig l JOIN sig r ON $conds AND l.id < r.id"
    }.mkString("\n  UNION\n  ")
    val inter = "len(list_intersect(a.sh, b.sh))"
    val est = (0 until numHashes)
      .map(s => s"(CASE WHEN sl.h$s = sr.h$s THEN 1 ELSE 0 END)").mkString(" + ")
    val estMin = math.max(0.0, threshold - 0.15)
    s"""$corpus,
n AS MATERIALIZED (SELECT doc_id AS id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nrm FROM u),
g AS MATERIALIZED (SELECT id, UNNEST($shingle) AS gram FROM n),
gu AS MATERIALIZED (SELECT id, ${duckU64("gram")} AS gu FROM g),
sig AS MATERIALIZED (SELECT id, $mins FROM gu GROUP BY id),
cand AS MATERIALIZED ($bandJoins),
pref AS MATERIALIZED (SELECT id1, id2 FROM cand JOIN sig sl ON sl.id = cand.id1 JOIN sig sr ON sr.id = cand.id2
  WHERE CAST($est AS DOUBLE) / $numHashes >= $estMin),
sh AS MATERIALIZED (SELECT id, list_distinct($shingle) AS sh FROM n),
dup AS MATERIALIZED (SELECT id1, id2 FROM pref JOIN sh a ON a.id = pref.id1 JOIN sh b ON b.id = pref.id2
  WHERE CAST($inter AS DOUBLE) / CAST(len(a.sh) + len(b.sh) - $inter AS DOUBLE) >= $threshold)"""
  }

  /** Dedup.minhashLsh(plantedDocs, k=5, numHashes=32, bands=8, threshold=0.7). */
  def dedupMinhashLsh(k: Int, numHashes: Int, bands: Int, threshold: Double): String =
    s"""WITH ${minhashCtes(planted, k, numHashes, bands, threshold)},
nb AS (SELECT id, MIN(nbr) AS mn FROM
  (SELECT id1 AS id, id2 AS nbr FROM dup UNION ALL SELECT id2, id1 FROM dup) GROUP BY id)
SELECT n.id AS id, LEAST(COALESCE(nb.mn, n.id), n.id) AS rep_id,
  LEAST(COALESCE(nb.mn, n.id), n.id) <> n.id AS is_dup
FROM n LEFT JOIN nb ON nb.id = n.id"""

  /** plantedChainDocs twin (SparkEntry.plantedChainDocs): originals + a
    * first-generation near-dup (96-char md5 tail) + a second generation
    * (192-char tail). Near-average docs yield a~b and b~c above threshold
    * with a~c below it — the transitive-closure case. */
  private val plantedChain = {
    def tail(parts: String*) =
      parts.map(p => s"md5(CAST(doc_id AS VARCHAR) || '$p')").mkString(" || ")
    s"""u AS (SELECT doc_id, text FROM documents
      |     UNION ALL SELECT doc_id + 20000, text || ' ' || ${tail("a1", "a2", "a3")}
      |       FROM documents WHERE doc_id < 50
      |     UNION ALL SELECT doc_id + 40000, text || ' ' || ${tail("a1", "a2", "a3", "b1", "b2", "b3")}
      |       FROM documents WHERE doc_id < 50)""".stripMargin
  }

  /** Dedup.dedupGroups(plantedChainDocs, ...): verified pairs → EXACT
    * transitive closure → min-id labels = Spark's connected-components
    * fixpoint → group sizes over labeled vertices.
    *
    * r11 used a recursive all-pairs reachability CTE — quadratic in
    * component size, and the sf1 rung timed out in it (>900 s) while the
    * Spark side finished. r12 unrolls `ccPasses` hybrid label-propagation
    * passes instead (the louvain-oracle unrolling pattern): each pass takes
    * the min label over self+neighbors, then POINTER-JUMPS (l ← l[l]) —
    * label distance to the component minimum at least halves per pass, so
    * convergence needs O(log diameter) passes; every pass is one linear
    * aggregation + one join over the pair graph. Labels are always vertex
    * ids, so the jump join is total. 10 passes covers diameters into the
    * thousands — orders beyond any near-dup cluster. */
  /** Shared CTE prefix of the minhash-dedup family: minhash pairs over the
    * planted-chain corpus, then `ccPasses` unrolled label-propagation +
    * pointer-jump passes down to `comp(id, rep)` — ONE source of truth, so
    * a CC/quality fix can't silently diverge between the standalone
    * operator oracles and the composed-pipeline oracle. */
  private def minhashComponentCtes(k: Int, numHashes: Int, bands: Int,
      threshold: Double, ccPasses: Int): String = {
    val passes = (0 until ccPasses).map { i =>
      s"""p${i + 1} AS MATERIALIZED (SELECT id, MIN(lbl) AS lbl FROM (
    SELECT id, lbl FROM l$i
    UNION ALL
    SELECT s.a AS id, l.lbl FROM sym s JOIN l$i l ON l.id = s.b
  ) GROUP BY id),
l${i + 1} AS MATERIALIZED (SELECT p.id, LEAST(p.lbl, q.lbl) AS lbl
  FROM p${i + 1} p JOIN p${i + 1} q ON q.id = p.lbl)"""
    }.mkString(",\n")
    s"""${minhashCtes(plantedChain, k, numHashes, bands, threshold)},
sym AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM dup UNION ALL SELECT id2, id1 FROM dup),
l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lbl FROM sym),
$passes,
comp AS (SELECT id, lbl AS rep FROM l$ccPasses)"""
  }

  /** TextOps.qualityScore replay + per-group keeper pick (quality DESC,
    * id ASC) over a `grp(id, rep_id)` CTE — shared by [[dedupKeepBest]]
    * and [[dedupPipeline]]. */
  private def qualityKeeperCtes: String =
    s"""tq AS (SELECT doc_id AS id, text,
  string_split_regex(trim(lower(text)), '\\s+') AS toks FROM u),
q AS (SELECT id, LEAST(1.0, GREATEST(0.0,
    0.4 * LEAST(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
    + 0.3 * (CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','it','you','that'], x))) AS DOUBLE) / len(toks))
    + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text)))) AS score
  FROM tq),
keeper AS (SELECT rep_id, id AS keeper_id FROM (
  SELECT grp.rep_id, grp.id, ROW_NUMBER() OVER (PARTITION BY grp.rep_id
    ORDER BY q.score DESC, grp.id ASC) AS rn FROM grp JOIN q USING (id))
  WHERE rn = 1)"""

  def dedupGroups(k: Int, numHashes: Int, bands: Int, threshold: Double,
      ccPasses: Int = 10): String =
    s"""WITH ${minhashComponentCtes(k, numHashes, bands, threshold, ccPasses)},
sizes AS (SELECT rep, COUNT(*) AS gs FROM comp GROUP BY rep)
SELECT n.id AS id, COALESCE(c.rep, n.id) AS rep_id,
  COALESCE(c.rep, n.id) <> n.id AS is_dup,
  CAST(COALESCE(s.gs, 1) AS BIGINT) AS group_size
FROM n LEFT JOIN comp c ON c.id = n.id
LEFT JOIN sizes s ON s.rep = COALESCE(c.rep, n.id)"""

  /** Dedup.simhashPairs(plantedDocs, maxDist=3, bands=4). */
  def dedupSimhash(maxDist: Int, bands: Int): String = {
    val width = 64 / bands
    val sums = (0 until 64)
      .map(i => s"SUM(CASE WHEN ${duckBit("hu", i)} = 1 THEN 1 ELSE -1 END) AS c$i")
      .mkString(", ")
    val packed = (0 until 64)
      .map(i => s"(CASE WHEN c$i > 0 THEN ${BigInt(1) << (63 - i)}::HUGEINT ELSE 0::HUGEINT END)")
      .mkString(" + ")
    // one EQUI-join per band, UNION-deduped — an OR of band equalities
    // would force DuckDB onto a nested-loop join (quadratic in corpus
    // size: >900 s at sf1 where the union of hash joins is seconds).
    // UNION (not UNION ALL) collapses pairs matching in several bands,
    // exactly the rows the OR form produced once.
    val bandJoins = (0 until bands).map { b =>
      val p = BigInt(1) << (b * width)
      s"""SELECT a.id AS id1, b.id AS id2, a.us AS ua, b.us AS ub
  FROM s a JOIN s b ON a.id < b.id
   AND (a.us // $p) % ${1L << width} = (b.us // $p) % ${1L << width}"""
    }.mkString("\n  UNION\n  ")
    val ham = (0 until 64)
      .map(i => s"(CASE WHEN ${duckBit("ua", i)} <> ${duckBit("ub", i)} THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $planted,
tk AS (SELECT doc_id AS id, UNNEST(regexp_extract_all(lower(text), '[a-z0-9'']+')) AS t FROM u),
hu AS (SELECT id, ${duckU64("t")} AS hu FROM tk),
c AS (SELECT id, $sums FROM hu GROUP BY id),
s AS (SELECT id, ($packed) AS us FROM c),
cand AS (
  $bandJoins),
h AS (SELECT id1, id2, ($ham) AS hamming FROM cand)
SELECT id1, id2, CAST(hamming AS BIGINT) AS hamming FROM h WHERE hamming <= $maxDist"""
  }

  /** One SRP table's bucket bitstring for list column `v` (matches
    * Similarity.srpBucket: sign of the per-plane Rademacher projection). */
  private def srpBucketSql(v: String, table: Int, nPlanes: Int, dim: Int): String =
    Similarity.srpPlanes(table, nPlanes, dim).map { plane =>
      val lits = plane.map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
      val proj = s"list_reduce(list_transform(generate_series(1, $dim), " +
        s"i -> CAST($v[i] AS DOUBLE) * (([$lits])::DOUBLE[])[i]), (p, q) -> p + q)"
      s"(CASE WHEN $proj > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")

  /** CTEs shared by knnLsh and rrfFusion: SRP-bucketed candidates + scores. */
  private def lshScoreCtes(k: Int, dim: Int, nPlanes: Int, nTables: Int): String = {
    def buckets(src: String, idCol: String, v: String) = (0 until nTables).map { t =>
      s"SELECT $idCol, $t AS tbl, ${srpBucketSql(v, t, nPlanes, dim)} AS bkt FROM $src"
    }.mkString("\n  UNION ALL ")
    s"""q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nn_id, embedding AS cv FROM embeddings),
qb AS (${buckets("q", "query_id", "qv")}),
cb AS (${buckets("c", "nn_id", "cv")}),
lcand AS (SELECT DISTINCT query_id, nn_id FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bkt = cb.bkt
  AND query_id <> nn_id),
lsc AS (SELECT query_id, nn_id, ${cos("qv", "cv", dim)} AS score
  FROM lcand JOIN q USING (query_id) JOIN c USING (nn_id)),
lr AS (SELECT query_id, nn_id, score,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM lsc)"""
  }

  /** Similarity.lshKnn on embeddings, queries vec_id<10, k=5. */
  def knnLsh(k: Int, dim: Int, nPlanes: Int, nTables: Int): String =
    s"""WITH ${lshScoreCtes(k, dim, nPlanes, nTables)}
SELECT query_id, nn_id, score, rank FROM lr WHERE rank <= $k"""

  /** Similarity.knnClassify over lshKnn (reference knn_lsh_classify):
    * majority vote over the k neighbors' `vec_id % nClasses` labels,
    * ties (count DESC, label ASC); queries with no candidates keep a null
    * label via the left join. */
  def knnClassify(k: Int, dim: Int, nPlanes: Int, nTables: Int, nClasses: Int): String =
    s"""WITH ${lshScoreCtes(k, dim, nPlanes, nTables)},
knn AS (SELECT query_id, nn_id FROM lr WHERE rank <= $k),
votes AS (SELECT query_id, CAST(nn_id % $nClasses AS VARCHAR) AS label, COUNT(*) AS c
  FROM knn GROUP BY 1, 2),
pred AS (SELECT query_id, label AS predicted_label FROM (
  SELECT query_id, label, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY c DESC, label ASC) AS rn FROM votes) WHERE rn = 1)
SELECT q.query_id, pred.predicted_label FROM q LEFT JOIN pred USING (query_id)"""

  /** Utils.classifierAccuracy over the knnClassify prediction (reference
    * ml/utils.py:13): rows counted per match/mismatch, null-safe compare. */
  def classifierAccuracy(k: Int, dim: Int, nPlanes: Int, nTables: Int,
      nClasses: Int): String =
    s"""WITH ${lshScoreCtes(k, dim, nPlanes, nTables)},
knn AS (SELECT query_id, nn_id FROM lr WHERE rank <= $k),
votes AS (SELECT query_id, CAST(nn_id % $nClasses AS VARCHAR) AS label, COUNT(*) AS c
  FROM knn GROUP BY 1, 2),
pred AS (SELECT query_id, label AS predicted_label FROM (
  SELECT query_id, label, ROW_NUMBER() OVER (PARTITION BY query_id
    ORDER BY c DESC, label ASC) AS rn FROM votes) WHERE rn = 1),
joined AS (SELECT q.query_id, pred.predicted_label,
  CAST(q.query_id % $nClasses AS VARCHAR) AS exact_label
  FROM q LEFT JOIN pred USING (query_id))
SELECT (predicted_label IS NOT DISTINCT FROM exact_label) AS match, COUNT(*) AS cnt
FROM joined GROUP BY 1"""

  /** Similarity.ivfKnn on embeddings, queries vec_id<10: md5-order seed
    * sample + `refineIters` Lloyd passes over 2^40-quantized integer vectors
    * (the clusteringLsh technique — exact Long sums, cosine folds the only
    * doubles), then probe/score. */
  def knnIvf(k: Int, dim: Int, nCells: Int, nProbe: Int, refineIters: Int,
      spill: Int): String = {
    val quant = s"list_transform(generate_series(1, $dim), " +
      s"i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1099511627776) AS BIGINT))"
    val passes = (0 until refineIters).map { i =>
      s"""a$i AS MATERIALIZED (SELECT nn_id, cell, qv FROM (
  SELECT cq.nn_id, ct$i.cell, cq.qv, ROW_NUMBER() OVER (PARTITION BY cq.nn_id
    ORDER BY ${cos("cq.qv", s"ct$i.centroid", dim)} DESC, ct$i.cell ASC) AS rn
  FROM cq CROSS JOIN ct$i) WHERE rn = 1),
s$i AS (SELECT cell, g.i AS idx, SUM(qv[g.i]) AS s
  FROM a$i CROSS JOIN generate_series(1, $dim) AS g(i) GROUP BY 1, 2),
n$i AS (SELECT cell, list(CAST(s AS BIGINT) ORDER BY idx) AS nv FROM s$i GROUP BY cell),
ct${i + 1} AS MATERIALIZED (SELECT ct$i.cell, COALESCE(n$i.nv, ct$i.centroid) AS centroid
  FROM ct$i LEFT JOIN n$i USING (cell))"""
    }.mkString(",\n")
    val last = s"ct$refineIters"
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, $quant AS qq
  FROM embeddings WHERE vec_id < 10),
cq AS MATERIALIZED (SELECT vec_id AS nn_id, embedding AS cv, $quant AS qv FROM embeddings),
ct0 AS MATERIALIZED (SELECT nn_id AS cell, qv AS centroid FROM cq
  ORDER BY ${duckSigned(duckU64("CAST(nn_id AS VARCHAR)"))}, nn_id LIMIT $nCells),
$passes,
asg AS (SELECT nn_id, cell FROM (
  SELECT cq.nn_id, $last.cell, ROW_NUMBER() OVER (PARTITION BY cq.nn_id
    ORDER BY ${cos("cq.qv", s"$last.centroid", dim)} DESC, $last.cell ASC) AS rn
  FROM cq CROSS JOIN $last) WHERE rn <= $spill),
probe AS (SELECT query_id, cell FROM (
  SELECT q.query_id, $last.cell, ROW_NUMBER() OVER (PARTITION BY q.query_id
    ORDER BY ${cos("q.qq", s"$last.centroid", dim)} DESC, $last.cell ASC) AS rn
  FROM q CROSS JOIN $last) WHERE rn <= $nProbe),
sc AS (SELECT DISTINCT query_id, nn_id, ${cos("q.qv", "cq.cv", dim)} AS score
  FROM probe JOIN asg USING (cell) JOIN q USING (query_id) JOIN cq USING (nn_id)
  WHERE query_id <> nn_id),
r AS (SELECT query_id, nn_id, score,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM sc)
SELECT query_id, nn_id, score, rank FROM r WHERE rank <= $k"""
  }

  /** Similarity.pqKnn on embeddings, queries vec_id<10: per-subspace Lloyd
    * over 2^40-quantized slices (the knnIvf technique keyed by (j, cell)),
    * PQ code assignment, ADC lookup-table scoring with the ordered
    * list_reduce sum matching Spark's left-fold over subspaces. */
  def knnPq(k: Int, dim: Int, m: Int, ksub: Int, refineIters: Int): String = {
    val dsub = dim / m
    val quant = s"list_transform(generate_series(1, $dim), " +
      s"i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1099511627776) AS BIGINT))"
    def slices(src: String) =
      s"list_slice($src, g.j * $dsub + 1, (g.j + 1) * $dsub)"
    val passes = (0 until refineIters).map { i =>
      s"""a$i AS MATERIALIZED (SELECT nn_id, j, cell, sv FROM (
  SELECT sub.nn_id, sub.j, ct$i.cell, sub.sv, ROW_NUMBER() OVER (
    PARTITION BY sub.nn_id, sub.j
    ORDER BY ${cos("sub.sv", s"ct$i.centroid", dsub)} DESC, ct$i.cell ASC) AS rn
  FROM sub JOIN ct$i USING (j)) WHERE rn = 1),
s$i AS (SELECT j, cell, g.i AS idx, SUM(sv[g.i]) AS s
  FROM a$i CROSS JOIN generate_series(1, $dsub) AS g(i) GROUP BY 1, 2, 3),
n$i AS (SELECT j, cell, list(CAST(s AS BIGINT) ORDER BY idx) AS nv FROM s$i GROUP BY j, cell),
ct${i + 1} AS MATERIALIZED (SELECT ct$i.j, ct$i.cell, COALESCE(n$i.nv, ct$i.centroid) AS centroid
  FROM ct$i LEFT JOIN n$i USING (j, cell))"""
    }.mkString(",\n")
    val last = s"ct$refineIters"
    s"""WITH cq AS MATERIALIZED (SELECT vec_id AS nn_id, $quant AS qv FROM embeddings),
sub AS MATERIALIZED (SELECT nn_id, g.j AS j, ${slices("qv")} AS sv
  FROM cq CROSS JOIN generate_series(0, ${m - 1}) AS g(j)),
seed AS MATERIALIZED (SELECT nn_id AS cell, qv FROM cq
  ORDER BY ${duckSigned(duckU64("CAST(nn_id AS VARCHAR)"))}, nn_id LIMIT $ksub),
ct0 AS MATERIALIZED (SELECT g.j AS j, cell, ${slices("qv")} AS centroid
  FROM seed CROSS JOIN generate_series(0, ${m - 1}) AS g(j)),
$passes,
codes AS MATERIALIZED (SELECT nn_id, j, cell FROM (
  SELECT sub.nn_id, sub.j, $last.cell, ROW_NUMBER() OVER (
    PARTITION BY sub.nn_id, sub.j
    ORDER BY ${cos("sub.sv", s"$last.centroid", dsub)} DESC, $last.cell ASC) AS rn
  FROM sub JOIN $last USING (j)) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, $quant AS qq FROM embeddings WHERE vec_id < 10),
qsub AS (SELECT query_id, g.j AS j, ${slices("qq")} AS qs
  FROM q CROSS JOIN generate_series(0, ${m - 1}) AS g(j)),
dt AS MATERIALIZED (SELECT query_id, j, cell,
  ${cos("qsub.qs", s"$last.centroid", dsub)} AS d
  FROM qsub JOIN $last USING (j)),
sc AS (SELECT query_id, nn_id,
  list_reduce(list(d ORDER BY j), (p, q) -> p + q) AS score
  FROM codes JOIN dt USING (j, cell) WHERE query_id <> nn_id
  GROUP BY query_id, nn_id),
r AS (SELECT query_id, nn_id, score, ROW_NUMBER() OVER (
  PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM sc)
SELECT query_id, nn_id, score, rank FROM r WHERE rank <= $k"""
  }

  /** Similarity.ivfadcKnn on embeddings, queries vec_id<10: the knnIvf
    * coarse stage (md5 seeds + quantized Lloyd + spill assignment + probe)
    * pruned to a DISTINCT candidate set, composed with the knnPq code/ADC
    * stage scoring ONLY those candidates — CTE-for-CTE the Spark
    * composition pqIndex + ivfCandidates + pqRerank. IVF chain CTEs carry
    * an `i` prefix, PQ chain a `p` prefix; both share q/cq. */
  def knnIvfadc(k: Int, dim: Int, m: Int, ksub: Int, nCells: Int,
      nProbe: Int, refineIters: Int, spill: Int): String = {
    val dsub = dim / m
    val quant = s"list_transform(generate_series(1, $dim), " +
      s"i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1099511627776) AS BIGINT))"
    val ivfPasses = (0 until refineIters).map { i =>
      s"""ia$i AS MATERIALIZED (SELECT nn_id, cell, qv FROM (
  SELECT cq.nn_id, ict$i.cell, cq.qv, ROW_NUMBER() OVER (PARTITION BY cq.nn_id
    ORDER BY ${cos("cq.qv", s"ict$i.centroid", dim)} DESC, ict$i.cell ASC) AS rn
  FROM cq CROSS JOIN ict$i) WHERE rn = 1),
is$i AS (SELECT cell, g.i AS idx, SUM(qv[g.i]) AS s
  FROM ia$i CROSS JOIN generate_series(1, $dim) AS g(i) GROUP BY 1, 2),
in$i AS (SELECT cell, list(CAST(s AS BIGINT) ORDER BY idx) AS nv FROM is$i GROUP BY cell),
ict${i + 1} AS MATERIALIZED (SELECT ict$i.cell, COALESCE(in$i.nv, ict$i.centroid) AS centroid
  FROM ict$i LEFT JOIN in$i USING (cell))"""
    }.mkString(",\n")
    val ilast = s"ict$refineIters"
    def slices(src: String) =
      s"list_slice($src, g.j * $dsub + 1, (g.j + 1) * $dsub)"
    val pqPasses = (0 until refineIters).map { i =>
      s"""pa$i AS MATERIALIZED (SELECT nn_id, j, cell, sv FROM (
  SELECT sub.nn_id, sub.j, pct$i.cell, sub.sv, ROW_NUMBER() OVER (
    PARTITION BY sub.nn_id, sub.j
    ORDER BY ${cos("sub.sv", s"pct$i.centroid", dsub)} DESC, pct$i.cell ASC) AS rn
  FROM sub JOIN pct$i USING (j)) WHERE rn = 1),
ps$i AS (SELECT j, cell, g.i AS idx, SUM(sv[g.i]) AS s
  FROM pa$i CROSS JOIN generate_series(1, $dsub) AS g(i) GROUP BY 1, 2, 3),
pn$i AS (SELECT j, cell, list(CAST(s AS BIGINT) ORDER BY idx) AS nv FROM ps$i GROUP BY j, cell),
pct${i + 1} AS MATERIALIZED (SELECT pct$i.j, pct$i.cell, COALESCE(pn$i.nv, pct$i.centroid) AS centroid
  FROM pct$i LEFT JOIN pn$i USING (j, cell))"""
    }.mkString(",\n")
    val plast = s"pct$refineIters"
    s"""WITH q AS (SELECT vec_id AS query_id, $quant AS qq FROM embeddings WHERE vec_id < 10),
cq AS MATERIALIZED (SELECT vec_id AS nn_id, $quant AS qv FROM embeddings),
ict0 AS MATERIALIZED (SELECT nn_id AS cell, qv AS centroid FROM cq
  ORDER BY ${duckSigned(duckU64("CAST(nn_id AS VARCHAR)"))}, nn_id LIMIT $nCells),
$ivfPasses,
iasg AS (SELECT nn_id, cell FROM (
  SELECT cq.nn_id, $ilast.cell, ROW_NUMBER() OVER (PARTITION BY cq.nn_id
    ORDER BY ${cos("cq.qv", s"$ilast.centroid", dim)} DESC, $ilast.cell ASC) AS rn
  FROM cq CROSS JOIN $ilast) WHERE rn <= $spill),
iprobe AS (SELECT query_id, cell FROM (
  SELECT q.query_id, $ilast.cell, ROW_NUMBER() OVER (PARTITION BY q.query_id
    ORDER BY ${cos("q.qq", s"$ilast.centroid", dim)} DESC, $ilast.cell ASC) AS rn
  FROM q CROSS JOIN $ilast) WHERE rn <= $nProbe),
cand AS (SELECT DISTINCT query_id, nn_id FROM iprobe JOIN iasg USING (cell)
  WHERE query_id <> nn_id),
sub AS MATERIALIZED (SELECT nn_id, g.j AS j, ${slices("qv")} AS sv
  FROM cq CROSS JOIN generate_series(0, ${m - 1}) AS g(j)),
pseed AS MATERIALIZED (SELECT nn_id AS cell, qv FROM cq
  ORDER BY ${duckSigned(duckU64("CAST(nn_id AS VARCHAR)"))}, nn_id LIMIT $ksub),
pct0 AS MATERIALIZED (SELECT g.j AS j, cell, ${slices("qv")} AS centroid
  FROM pseed CROSS JOIN generate_series(0, ${m - 1}) AS g(j)),
$pqPasses,
codes AS MATERIALIZED (SELECT nn_id, j, cell FROM (
  SELECT sub.nn_id, sub.j, $plast.cell, ROW_NUMBER() OVER (
    PARTITION BY sub.nn_id, sub.j
    ORDER BY ${cos("sub.sv", s"$plast.centroid", dsub)} DESC, $plast.cell ASC) AS rn
  FROM sub JOIN $plast USING (j)) WHERE rn = 1),
qsub AS (SELECT query_id, g.j AS j, ${slices("qq")} AS qs
  FROM q CROSS JOIN generate_series(0, ${m - 1}) AS g(j)),
dt AS MATERIALIZED (SELECT query_id, j, cell,
  ${cos("qsub.qs", s"$plast.centroid", dsub)} AS d
  FROM qsub JOIN $plast USING (j)),
sc AS (SELECT cand.query_id, cand.nn_id,
  list_reduce(list(d ORDER BY codes.j), (p, q) -> p + q) AS score
  FROM cand JOIN codes USING (nn_id)
  JOIN dt ON dt.query_id = cand.query_id AND dt.j = codes.j AND dt.cell = codes.cell
  GROUP BY cand.query_id, cand.nn_id),
r AS (SELECT query_id, nn_id, score, ROW_NUMBER() OVER (
  PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM sc)
SELECT query_id, nn_id, score, rank FROM r WHERE rank <= $k"""
  }

  /** Reducers.countMin + countMinEstimate on orders: the sketch cells are
    * plain sums over the md5+mix hash family, so the oracle re-derives
    * every cell and replays the min-over-rows estimates bit-exactly. */
  def reduceCountMin(depth: Int, width: Int, topK: Int): String = {
    def bkt(r: Int) = s"((${duckMix("hu", r)}) % $width + $width) % $width"
    val cases = (0 until depth).map(r => s"WHEN $r THEN ${bkt(r)}").mkString(" ")
    s"""WITH b AS (SELECT o_orderstatus,
  CAST(CASE WHEN o_orderkey % 3 = 0 THEN o_custkey % 7 ELSE o_custkey END AS VARCHAR) AS v
  FROM orders),
hu AS MATERIALIZED (SELECT o_orderstatus, v, ${duckU64("v")} AS hu FROM b),
cells AS MATERIALIZED (SELECT o_orderstatus, g.r AS r, CASE g.r $cases END AS bkt, COUNT(*) AS c
  FROM hu CROSS JOIN generate_series(0, ${depth - 1}) AS g(r) GROUP BY 1, 2, 3),
cnt AS (SELECT o_orderstatus, v, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
pr AS (SELECT o_orderstatus, v, cnt, rank FROM (
  SELECT o_orderstatus, v, cnt, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
    ORDER BY cnt DESC, v ASC) AS rank FROM cnt) WHERE rank <= $topK),
prb AS (SELECT o_orderstatus, v, cnt, rank, g.r AS r, CASE g.r $cases END AS bkt
  FROM (SELECT pr.*, ${duckU64("v")} AS hu FROM pr)
  CROSS JOIN generate_series(0, ${depth - 1}) AS g(r)),
est AS (SELECT o_orderstatus, v, cnt, rank, MIN(COALESCE(c, 0)) AS est
  FROM prb LEFT JOIN cells USING (o_orderstatus, r, bkt) GROUP BY 1, 2, 3, 4)
SELECT o_orderstatus, v AS value, cnt, CAST(est AS BIGINT) AS est,
  CAST(rank AS BIGINT) AS rank, est >= cnt AS overestimates FROM est"""
  }

  /** LinearModel.perceptronClassify on documents: hashed signed bag-of-words
    * (md5 token hashes, dim must be a power of two so HUGEINT `hu % dim`
    * equals Java's signed floorMod), `iters` unrolled batch-perceptron
    * passes as CTEs (all-integer — no float in the whole pipeline), then
    * classification. Label: n_chars >= threshold. */
  def perceptron(dim: Int, iters: Int, threshold: Long): String = {
    require((dim & (dim - 1)) == 0, s"dim=$dim must be a power of two")
    val passes = (0 until iters).map { p =>
      s"""d$p AS (SELECT lb.doc_id, lb.y, COALESCE(t.s, 0) + b$p.b AS s
  FROM lb CROSS JOIN b$p LEFT JOIN (
    SELECT xf.doc_id, SUM(xf.xi * w$p.wv) AS s FROM xf JOIN w$p USING (i)
    GROUP BY xf.doc_id) t USING (doc_id)),
m$p AS (SELECT doc_id, y FROM d$p WHERE y * s <= 0),
g$p AS (SELECT xf.i, SUM(m.y * xf.xi) AS g FROM m$p m JOIN xf USING (doc_id)
  GROUP BY xf.i),
w${p + 1} AS MATERIALIZED (SELECT w$p.i, w$p.wv + COALESCE(g$p.g, 0) AS wv
  FROM w$p LEFT JOIN g$p USING (i)),
b${p + 1} AS MATERIALIZED (SELECT b$p.b + (SELECT COALESCE(SUM(y), 0) FROM m$p) AS b FROM b$p)"""
    }.mkString(",\n")
    val wl = s"w$iters"; val bl = s"b$iters"
    s"""WITH tk AS (SELECT doc_id, UNNEST(list_filter(
    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS t FROM documents),
hv AS (SELECT doc_id, ${duckU64("t")} AS hu FROM tk),
xf AS MATERIALIZED (SELECT doc_id, CAST(hu % $dim AS INT) AS i,
  SUM(CASE WHEN hu >= $Half THEN -1 ELSE 1 END) AS xi FROM hv GROUP BY 1, 2),
lb AS MATERIALIZED (SELECT doc_id,
  CASE WHEN n_chars >= $threshold THEN 1 ELSE -1 END AS y FROM documents),
w0 AS (SELECT g.i AS i, CAST(0 AS BIGINT) AS wv
  FROM generate_series(0, ${dim - 1}) AS g(i)),
b0 AS (SELECT CAST(0 AS BIGINT) AS b),
$passes,
fin AS (SELECT lb.doc_id, lb.y, COALESCE(t.s, 0) + $bl.b AS score
  FROM lb CROSS JOIN $bl LEFT JOIN (
    SELECT xf.doc_id, SUM(xf.xi * $wl.wv) AS s FROM xf JOIN $wl USING (i)
    GROUP BY xf.doc_id) t USING (doc_id))
SELECT doc_id, CAST(y AS BIGINT) AS y, CAST(score AS BIGINT) AS score,
  CAST(CASE WHEN score > 0 THEN 1 ELSE -1 END AS BIGINT) AS predicted,
  (CASE WHEN score > 0 THEN 1 ELSE -1 END) = y AS correct FROM fin"""
  }

  /** Similarity.rrfFusion(brute-force k=5, SRP-LSH k=5), k0=60, topK=5. */
  def rrfFusion(k: Int, dim: Int, nPlanes: Int, nTables: Int, k0: Int, topK: Int): String =
    s"""WITH ${lshScoreCtes(k, dim, nPlanes, nTables)},
bsc AS (SELECT query_id, nn_id, ${cos("qv", "cv", dim)} AS score
  FROM q JOIN c ON query_id <> nn_id),
br AS (SELECT query_id, nn_id,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM bsc),
uni AS (SELECT query_id, nn_id, rank FROM br WHERE rank <= $k
  UNION ALL SELECT query_id, nn_id, rank FROM lr WHERE rank <= $k),
f AS (SELECT query_id, nn_id, SUM(1.0 / ($k0 + rank)) AS rrf_score FROM uni GROUP BY 1, 2)
SELECT query_id, nn_id, rrf_score, rank FROM (
  SELECT query_id, nn_id, rrf_score,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, nn_id ASC) AS rank FROM f)
WHERE rank <= $topK"""

  /** DocumentStore.build(documents, 50/10, dim) → retrieve(3 literal queries,
    * k, exact): chunking (40-token stride), md5 chunk ids, FakeEmbedder
    * vectors per chunk and per query, cosine ranking with the chunk id as
    * tie-break — the full RAG retrieval path replayed in SQL. */
  def docStoreRetrieve(dim: Int, k: Int, queries: Seq[(Long, String)]): String =
    s"""WITH ${docStoreCtes(dim, queries)},
sc AS (SELECT query_id, chunk_id, doc_id, chunk_idx, ${cos("qv", "cv", dim)} AS score
  FROM qemb JOIN cemb ON query_id <> chunk_id),
r AS (SELECT query_id, doc_id, chunk_idx, score,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, chunk_id ASC) AS rank FROM sc)
SELECT query_id, doc_id, chunk_idx, score, rank FROM r WHERE rank <= $k"""

  /** CTE chain shared by the document-store oracles: chunking (40-token
    * stride), md5 chunk ids (`chid`), FakeEmbedder chunk vectors (`cemb`)
    * and query vectors (`qemb`) for the literal query set (`q`). */
  private def docStoreCtes(dim: Int, queries: Seq[(Long, String)]): String = {
    val qvals = queries.map { case (i, t) => s"(CAST($i AS BIGINT), '$t')" }.mkString(", ")
    // signed token-count vector of a token-list column `toks`, as CTE steps
    s"""d AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
c0 AS (SELECT doc_id, toks,
    UNNEST(generate_series(0, GREATEST(CAST(CEIL(CAST(len(toks) - 10 AS DOUBLE) / 40) AS INT), 1) - 1)) AS ci
  FROM d),
ch AS (SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
    array_to_string(list_slice(toks, ci * 40 + 1, ci * 40 + 50), ' ') AS chunk_text FROM c0),
chid AS (SELECT doc_id, chunk_idx, chunk_text,
    ${duckSigned(duckU64("doc_id || ':' || chunk_idx"))} AS chunk_id FROM ch),
ctk AS (SELECT chunk_id, UNNEST(list_filter(string_split_regex(lower(chunk_text), '\\s+'),
    x -> x <> '')) AS t FROM chid),
chv AS (SELECT chunk_id, ${duckU64("t")} AS hu FROM ctk),
cag AS (SELECT chunk_id, CAST(hu % $dim AS BIGINT) AS idx,
    SUM(CASE WHEN hu >= $Half THEN -1 ELSE 1 END) AS v FROM chv GROUP BY 1, 2),
cg AS (SELECT chunk_id, list(idx ORDER BY idx) AS idxs, list(v ORDER BY idx) AS vals
  FROM cag GROUP BY chunk_id),
cemb AS (SELECT c.chunk_id, c.doc_id, c.chunk_idx, list_transform(generate_series(0, ${dim - 1}),
    i -> CAST(COALESCE(vals[list_position(idxs, i)], 0) AS DOUBLE)) AS cv
  FROM chid c LEFT JOIN cg ON cg.chunk_id = c.chunk_id),
q(query_id, q_text) AS (VALUES $qvals),
qtk AS (SELECT query_id, UNNEST(list_filter(string_split_regex(lower(q_text), '\\s+'),
    x -> x <> '')) AS t FROM q),
qhv AS (SELECT query_id, ${duckU64("t")} AS hu FROM qtk),
qag AS (SELECT query_id, CAST(hu % $dim AS BIGINT) AS idx,
    SUM(CASE WHEN hu >= $Half THEN -1 ELSE 1 END) AS v FROM qhv GROUP BY 1, 2),
qg AS (SELECT query_id, list(idx ORDER BY idx) AS idxs, list(v ORDER BY idx) AS vals
  FROM qag GROUP BY query_id),
qemb AS (SELECT q.query_id, list_transform(generate_series(0, ${dim - 1}),
    i -> CAST(COALESCE(vals[list_position(idxs, i)], 0) AS DOUBLE)) AS qv
  FROM q LEFT JOIN qg ON qg.query_id = q.query_id)"""
  }

  /** DocumentStore.retrieveHybrid: vector arm (cosine KNN over the chunk
    * embeddings) + lexical arm (word-token BM25 of each query's own terms
    * over the chunk text, summed per (query, chunk)), each top-k ranked,
    * fused by reciprocal rank (k0=60). BM25 ranks are ULP-robust here (the
    * scores feed only the rank, and rrf_score is a ≤2-term sum of exact
    * 1/(k0+rank) doubles). */
  def docStoreHybrid(dim: Int, k: Int, k0: Int, queries: Seq[(Long, String)]): String = {
    val wordToks = "regexp_extract_all(lower(%s), '[a-z0-9'']+')"
    s"""WITH ${docStoreCtes(dim, queries)},
vsc AS (SELECT query_id, chunk_id AS nn_id, ${cos("qv", "cv", dim)} AS score
  FROM qemb JOIN cemb ON query_id <> chunk_id),
vr AS (SELECT query_id, nn_id,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM vsc),
wt AS (SELECT chunk_id, ${wordToks.format("chunk_text")} AS wtoks FROM chid),
wstats AS (SELECT COUNT(*) AS n, AVG(CAST(len(wtoks) AS BIGINT)) AS avgdl FROM wt),
qterms AS (SELECT query_id, UNNEST(list_distinct(${wordToks.format("q_text")})) AS term FROM q),
terms AS (SELECT DISTINCT term FROM qterms),
tdf AS (SELECT term, COUNT(*) AS df FROM wt, terms WHERE list_contains(wtoks, term) GROUP BY term),
tfc AS (SELECT chunk_id, CAST(len(wtoks) AS BIGINT) AS dl, term,
    CAST(len(list_filter(wtoks, t -> t = term)) AS BIGINT) AS tf
  FROM wt, terms WHERE list_contains(wtoks, term)),
bsc AS (SELECT tfc.chunk_id, tfc.term,
    ROUND(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      * ((tf * (1.2 + 1.0)) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
  FROM tfc JOIN tdf USING (term), wstats),
lsc AS (SELECT query_id, chunk_id AS nn_id, ROUND(SUM(score), 6) AS score
  FROM bsc JOIN qterms USING (term) GROUP BY 1, 2),
lr AS (SELECT query_id, nn_id,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM lsc),
uni AS (SELECT query_id, nn_id, rank FROM vr WHERE rank <= $k
  UNION ALL SELECT query_id, nn_id, rank FROM lr WHERE rank <= $k),
f AS (SELECT query_id, nn_id, SUM(1.0 / ($k0 + rank)) AS rrf_score FROM uni GROUP BY 1, 2),
fr AS (SELECT query_id, nn_id, rrf_score,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, nn_id ASC) AS rank FROM f)
SELECT fr.query_id, c.doc_id, c.chunk_idx, fr.rrf_score, fr.rank
FROM fr JOIN chid c ON c.chunk_id = fr.nn_id WHERE fr.rank <= $k"""
  }

  /** Graphs.louvain over the 25-node nation graph, `iters` unrolled passes
    * (same technique as the pagerank oracle): per pass — community volumes,
    * neighbor-community weights, stay score, best strictly-improving move
    * with (score DESC, community ASC) tie-break. All inputs are exact
    * integers; the single double division k·vol/2m rounds identically in any
    * IEEE engine. */
  def louvain(iters: Int): String = {
    val base =
      """nn AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        |e0 AS (SELECT k AS src, (k+1)%25 AS dst FROM nn
        |       UNION ALL SELECT k, (k*2+3)%25 FROM nn),
        |sym AS MATERIALIZED (SELECT DISTINCT u, v FROM (
        |  SELECT src AS u, dst AS v FROM e0 UNION ALL SELECT dst, src FROM e0)
        |  WHERE u <> v),
        |deg AS MATERIALIZED (SELECT u AS vertex, COUNT(*) AS kd FROM sym GROUP BY u),
        |m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM sym),
        |l0 AS MATERIALIZED (SELECT vertex, vertex AS community FROM deg)""".stripMargin
    val passes = (0 until iters).map { i =>
      val (l, n) = (s"l$i", s"l${i + 1}")
      s"""vol$i AS MATERIALIZED (SELECT community, SUM(kd) AS vol FROM $l JOIN deg USING (vertex) GROUP BY community),
nb$i AS MATERIALIZED (SELECT sym.u AS vertex, lb.community AS c, COUNT(*) AS w
  FROM sym JOIN $l lb ON lb.vertex = sym.v GROUP BY 1, 2),
stay$i AS MATERIALIZED (SELECT lb.vertex, lb.community AS own, d.kd,
    COALESCE(wo.w, 0) - d.kd * (v.vol - d.kd) / m2.m AS stay
  FROM $l lb JOIN deg d USING (vertex) JOIN vol$i v ON v.community = lb.community
  LEFT JOIN (SELECT nb$i.vertex, nb$i.w FROM nb$i JOIN $l x ON x.vertex = nb$i.vertex
             AND x.community = nb$i.c) wo ON wo.vertex = lb.vertex, m2),
best$i AS MATERIALIZED (SELECT vertex, c, score FROM (
  SELECT s.vertex, nb$i.c, nb$i.w - s.kd * v.vol / m2.m AS score,
    ROW_NUMBER() OVER (PARTITION BY s.vertex
      ORDER BY nb$i.w - s.kd * v.vol / m2.m DESC, nb$i.c ASC) AS rn
  FROM nb$i JOIN stay$i s ON s.vertex = nb$i.vertex AND nb$i.c <> s.own
  JOIN vol$i v ON v.community = nb$i.c, m2) WHERE rn = 1),
$n AS MATERIALIZED (SELECT s.vertex,
    CASE WHEN b.vertex IS NOT NULL AND b.score > s.stay THEN b.c ELSE s.own END AS community
  FROM stay$i s LEFT JOIN best$i b ON b.vertex = s.vertex)"""
    }.mkString(",\n")
    s"WITH $base,\n$passes\nSELECT vertex, community FROM l$iters"
  }

  /** Weighted louvain move passes (twin of Graphs.louvainMoves): labels
    * `${p}l0..${p}l$iters`, over weighted sym edges `$sym`(u,v,w) and degrees
    * `$deg`(vertex,kd) (self-loop mass included in kd, absent from sym). */
  private def louvainPassesSql(p: String, sym: String, deg: String, iters: Int): String =
    (0 until iters).map { i =>
      val (l, n) = (s"${p}l$i", s"${p}l${i + 1}")
      s"""${p}vol$i AS MATERIALIZED (SELECT community, SUM(kd) AS vol FROM $l JOIN $deg USING (vertex) GROUP BY community),
${p}nb$i AS MATERIALIZED (SELECT $sym.u AS vertex, lb.community AS c, SUM($sym.w) AS w
  FROM $sym JOIN $l lb ON lb.vertex = $sym.v GROUP BY 1, 2),
${p}stay$i AS MATERIALIZED (SELECT lb.vertex, lb.community AS own, d.kd,
    COALESCE(wo.w, 0) - d.kd * (v.vol - d.kd) / m2.m AS stay
  FROM $l lb JOIN $deg d USING (vertex) JOIN ${p}vol$i v ON v.community = lb.community
  LEFT JOIN (SELECT ${p}nb$i.vertex, ${p}nb$i.w FROM ${p}nb$i JOIN $l x ON x.vertex = ${p}nb$i.vertex
             AND x.community = ${p}nb$i.c) wo ON wo.vertex = lb.vertex, m2),
${p}best$i AS MATERIALIZED (SELECT vertex, c, score FROM (
  SELECT s.vertex, ${p}nb$i.c, ${p}nb$i.w - s.kd * v.vol / m2.m AS score,
    ROW_NUMBER() OVER (PARTITION BY s.vertex
      ORDER BY ${p}nb$i.w - s.kd * v.vol / m2.m DESC, ${p}nb$i.c ASC) AS rn
  FROM ${p}nb$i JOIN ${p}stay$i s ON s.vertex = ${p}nb$i.vertex AND ${p}nb$i.c <> s.own
  JOIN ${p}vol$i v ON v.community = ${p}nb$i.c, m2) WHERE rn = 1),
$n AS MATERIALIZED (SELECT s.vertex,
    CASE WHEN b.vertex IS NOT NULL AND b.score > s.stay THEN b.c ELSE s.own END AS community
  FROM ${p}stay$i s LEFT JOIN ${p}best$i b ON b.vertex = s.vertex)"""
    }.mkString(",\n")

  /** Graphs.louvainMultilevel over the nation graph: level-1 unit-weight
    * passes, contraction (cross-community mass → weighted super-edges,
    * intra mass → self-loop degree), weighted level-2 passes, composed
    * vertex → c₁ → c₂ labels. m2 is conserved across levels. */
  def louvainMultilevel(iters1: Int, iters2: Int): String = {
    val base =
      """nn AS (SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation),
        |e0 AS (SELECT k AS src, (k+1)%25 AS dst FROM nn
        |       UNION ALL SELECT k, (k*2+3)%25 FROM nn),
        |sym1 AS MATERIALIZED (SELECT u, v, CAST(1 AS BIGINT) AS w FROM (
        |  SELECT DISTINCT u, v FROM (
        |    SELECT src AS u, dst AS v FROM e0 UNION ALL SELECT dst, src FROM e0)
        |  WHERE u <> v)),
        |deg1 AS MATERIALIZED (SELECT u AS vertex, SUM(w) AS kd FROM sym1 GROUP BY u),
        |m2 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM sym1),
        |al0 AS MATERIALIZED (SELECT vertex, vertex AS community FROM deg1)""".stripMargin
    val contract =
      s"""map1 AS MATERIALIZED (SELECT vertex, community FROM al$iters1),
sym2 AS MATERIALIZED (SELECT lu.community AS u, lv.community AS v, SUM(s.w) AS w
  FROM sym1 s JOIN map1 lu ON lu.vertex = s.u JOIN map1 lv ON lv.vertex = s.v
  WHERE lu.community <> lv.community GROUP BY 1, 2),
lp2 AS (SELECT lu.community AS vertex, SUM(s.w) AS lw
  FROM sym1 s JOIN map1 lu ON lu.vertex = s.u JOIN map1 lv ON lv.vertex = s.v
  WHERE lu.community = lv.community GROUP BY 1),
deg2 AS MATERIALIZED (SELECT sv.vertex, COALESCE(x.kx, 0) + COALESCE(lp2.lw, 0) AS kd
  FROM (SELECT DISTINCT community AS vertex FROM map1) sv
  LEFT JOIN (SELECT u AS vertex, SUM(w) AS kx FROM sym2 GROUP BY u) x USING (vertex)
  LEFT JOIN lp2 USING (vertex)),
bl0 AS (SELECT vertex, vertex AS community FROM deg2)"""
    s"""WITH $base,
${louvainPassesSql("a", "sym1", "deg1", iters1)},
$contract,
${louvainPassesSql("b", "sym2", "deg2", iters2)}
SELECT m.vertex, b.community FROM map1 m JOIN bl$iters2 b ON b.vertex = m.community"""
  }

  /** Clustering.viaLsh(embeddings, dim, k, nPlanes, nTables, lloydIters):
    * SRP buckets over 2^40-quantized integer vectors → per-bucket component
    * sums → spherical k-means (init = k lexicographically-smallest buckets,
    * unrolled Lloyd passes — same technique as the louvain oracle) → per-point
    * majority vote. All state is exact integer; only the cosine folds are
    * floating point (left-to-right, bit-stable). */
  def clusteringLsh(dim: Int, k: Int, nPlanes: Int, nTables: Int, lloydIters: Int): String =
    s"""WITH ${clusteringLshCtes(dim, k, nPlanes, nTables, lloydIters,
        "SELECT vec_id, embedding FROM embeddings")}
SELECT pid AS id, CAST(label AS BIGINT) AS label FROM asgf"""

  /** TrainPrep.diversitySample: the clustering CTE chain, then the
    * per-cluster hash-rank quota (the sample_group_cap rule keyed on the
    * point id, partitioned by the cluster label). */
  def diversitySample(dim: Int, k: Int, nPlanes: Int, nTables: Int,
      lloydIters: Int, cap: Int): String = {
    val slot = duckSigned(duckU64("CAST(pid AS VARCHAR)"))
    s"""WITH ${clusteringLshCtes(dim, k, nPlanes, nTables, lloydIters,
        "SELECT vec_id, embedding FROM embeddings")}
SELECT id, label FROM (
  SELECT pid AS id, CAST(label AS BIGINT) AS label, ROW_NUMBER() OVER (
    PARTITION BY label ORDER BY $slot ASC, pid ASC) AS rk
  FROM asgf) WHERE rk <= $cap"""
  }

  /** Dedup.semantic (SemDeDup): the clustering CTE chain over a planted
    * corpus (originals + exact copies at vec_id+20000), then within-cluster
    * smaller-id pruning at `threshold` cosine over the quantized vectors. */
  def dedupSemantic(dim: Int, k: Int, nPlanes: Int, nTables: Int,
      lloydIters: Int, threshold: Double, copyBelow: Int, copyShift: Long): String =
    s"""WITH ${clusteringLshCtes(dim, k, nPlanes, nTables, lloydIters,
        s"SELECT vec_id, embedding FROM embeddings UNION ALL " +
          s"SELECT vec_id + $copyShift, embedding FROM embeddings WHERE vec_id < $copyBelow")},
pvv AS (SELECT a.pid, a.label, p.qv FROM asgf a JOIN pts p USING (pid)),
near AS (SELECT x.pid AS id, MIN(y.pid) AS rep FROM pvv x JOIN pvv y
  ON x.label = y.label AND y.pid < x.pid
  WHERE ${cos("x.qv", "y.qv", dim)} >= $threshold GROUP BY x.pid)
SELECT a.pid AS id, CAST(a.label AS BIGINT) AS label,
  COALESCE(n.rep, a.pid) AS rep_id, n.rep IS NOT NULL AS is_dup
FROM asgf a LEFT JOIN near n ON n.id = a.pid"""

  /** CTE chain of [[clusteringLsh]] over `src` (vec_id, embedding): ends at
    * `asgf` = (pid, label) final per-point assignments; `pts` carries the
    * quantized vectors. */
  private def clusteringLshCtes(dim: Int, k: Int, nPlanes: Int, nTables: Int,
      lloydIters: Int, src: String): String = {
    val buckets = (0 until nTables).map { t =>
      s"SELECT pid, qv, $t AS tbl, ${srpBucketSql("qv", t, nPlanes, dim)} AS bkt FROM pts"
    }.mkString("\n  UNION ALL ")
    // farthest-point init: cs1 = {rid 1}; cs_j adds the rep minimizing its max
    // cosine to the chosen set (ties → smaller rid), excluding already-chosen
    val initPasses = (2 to k).map { j =>
      val prev = s"cs${j - 1}"
      s"""ch$j AS MATERIALIZED (SELECT $j AS c, rid, rv FROM rept WHERE rid = (
  SELECT m.rid FROM (
    SELECT r2.rid, MAX(${cos("r2.rv", "cs.cv", dim)}) AS ms
    FROM rept r2 CROSS JOIN $prev cs
    WHERE r2.rid NOT IN (SELECT rid FROM $prev) GROUP BY r2.rid) m
  ORDER BY m.ms ASC, m.rid ASC LIMIT 1)),
cs$j AS MATERIALIZED (SELECT * FROM $prev UNION ALL SELECT c, rid, rv AS cv FROM ch$j)"""
    }.mkString(",\n")
    val passes = (0 until lloydIters).map { i =>
      val (c, n) = (s"c$i", s"c${i + 1}")
      s"""a$i AS MATERIALIZED (SELECT rid, c FROM (
  SELECT r.rid, $c.c, ROW_NUMBER() OVER (PARTITION BY r.rid
    ORDER BY ${cos("r.rv", s"$c.cv", dim)} DESC, $c.c ASC) AS rn
  FROM rept r CROSS JOIN $c) WHERE rn = 1),
n$i AS (SELECT a$i.c, g.i AS idx, SUM(rv[g.i]) AS s
  FROM a$i JOIN rept USING (rid) CROSS JOIN generate_series(1, $dim) AS g(i) GROUP BY 1, 2),
nc$i AS (SELECT c, list(CAST(s AS BIGINT) ORDER BY idx) AS nv FROM n$i GROUP BY c),
$n AS MATERIALIZED (SELECT $c.c, COALESCE(nc$i.nv, $c.cv) AS cv FROM $c LEFT JOIN nc$i USING (c))"""
    }.mkString(",\n")
    val last = s"c$lloydIters"
    s"""pts AS (SELECT vec_id AS pid, list_transform(generate_series(1, $dim),
    i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1099511627776) AS BIGINT)) AS qv
  FROM ($src)),
b AS MATERIALIZED ($buckets),
comp AS (SELECT tbl, bkt, g.i AS idx, SUM(qv[g.i]) AS s
  FROM b CROSS JOIN generate_series(1, $dim) AS g(i) GROUP BY 1, 2, 3),
reps AS (SELECT tbl, bkt, list(CAST(s AS BIGINT) ORDER BY idx) AS rv FROM comp GROUP BY tbl, bkt),
rept AS MATERIALIZED (SELECT tbl, bkt, rv, ROW_NUMBER() OVER (ORDER BY tbl, bkt) AS rid FROM reps),
cs1 AS MATERIALIZED (SELECT 1 AS c, rid, rv AS cv FROM rept WHERE rid = 1),
${if (k > 1) initPasses + ",\n" else ""}c0 AS MATERIALIZED (SELECT c, cv FROM cs$k),
$passes,
af AS (SELECT rid, c FROM (
  SELECT r.rid, $last.c, ROW_NUMBER() OVER (PARTITION BY r.rid
    ORDER BY ${cos("r.rv", s"$last.cv", dim)} DESC, $last.c ASC) AS rn
  FROM rept r CROSS JOIN $last) WHERE rn = 1),
lab AS (SELECT tbl, bkt, c - 1 AS label FROM af JOIN rept USING (rid)),
votes AS (SELECT pid, label, COUNT(*) AS cnt FROM b JOIN lab USING (tbl, bkt) GROUP BY 1, 2),
asgf AS (SELECT pid, label FROM (
  SELECT pid, label, ROW_NUMBER() OVER (PARTITION BY pid ORDER BY cnt DESC, label ASC) AS rn
  FROM votes) WHERE rn = 1)"""
  }

  /** TrainPrep.duplicateSpans(plantedDocs, k): per doc, how many of its
    * k-token windows occur ≥2 times corpus-wide. Window hash = md5-64 of the
    * space-joined gram — the same bytes the Spark kernel hashes. */
  /** Window-position explode: generate_series used as a SCALAR list (the
    * lateral table form rejects column bounds) — same idiom as the minhash
    * shingle oracle. */
  private def windowGrams(src: String, k: Int): String = {
    val gram = s"array_to_string(list_slice(ts, pos, pos + ${k - 1}), ' ')"
    s"""(SELECT doc_id, pos, ${duckU64(gram)} AS h FROM
  (SELECT doc_id, UNNEST(generate_series(1, len(ts) - ${k - 1})) AS pos, ts FROM
    (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ts
     FROM $src) t0) t1)"""
  }

  def duplicateSpans(k: Int): String =
    s"""WITH $planted,
w AS (SELECT * FROM ${windowGrams("u", k)} wg),
c AS (SELECT h, COUNT(*) AS n FROM w GROUP BY h),
pd AS (SELECT doc_id, COUNT(*) AS nw, SUM(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS nd
  FROM w JOIN c USING (h) GROUP BY doc_id)
SELECT u.doc_id, CAST(COALESCE(pd.nw, 0) AS BIGINT) AS n_windows,
  CAST(COALESCE(pd.nd, 0) AS BIGINT) AS n_dup_windows
FROM u LEFT JOIN pd USING (doc_id)"""

  /** TrainPrep.decontaminate(corpus = plantedDocs, eval = docs < maxEvalId, k):
    * corpus docs sharing a k-token window hash with the eval set. */
  def decontaminate(k: Int, maxEvalId: Int): String =
    s"""WITH $planted,
cg AS (SELECT * FROM ${windowGrams("u", k)} wg),
eg AS (SELECT DISTINCT doc_id AS eid, h FROM
  ${windowGrams(s"(SELECT doc_id, text FROM documents WHERE doc_id < $maxEvalId) s", k)} e)
SELECT cg.doc_id, CAST(COUNT(DISTINCT cg.pos) AS BIGINT) AS n_hit_windows,
  CAST(COUNT(DISTINCT eg.eid) AS BIGINT) AS n_eval_docs
FROM cg JOIN eg USING (h) GROUP BY cg.doc_id"""

  /** Dedup.keepBest over dedupGroups(plantedChainDocs) with
    * TextOps.qualityScore: same CC chain as [[dedupGroups]], keeper =
    * argmax (quality DESC, id ASC) per group. */
  def dedupKeepBest(k: Int, numHashes: Int, bands: Int, threshold: Double,
      ccPasses: Int = 10): String =
    s"""WITH ${minhashComponentCtes(k, numHashes, bands, threshold, ccPasses)},
grp AS (SELECT n.id AS id, COALESCE(c.rep, n.id) AS rep_id
  FROM n LEFT JOIN comp c ON c.id = n.id),
$qualityKeeperCtes
SELECT grp.id, grp.rep_id, keeper.keeper_id, grp.id = keeper.keeper_id AS keep
FROM grp JOIN keeper USING (rep_id)"""

  /** Dedup.dedupPipeline(plantedChainDocs, qualityScore scores): the
    * composed groups→sizes→keepBest output from ONE shared minhash pass —
    * the union of dedupGroups' and dedupKeepBest's columns. */
  def dedupPipeline(k: Int, numHashes: Int, bands: Int, threshold: Double,
      ccPasses: Int = 10): String =
    s"""WITH ${minhashComponentCtes(k, numHashes, bands, threshold, ccPasses)},
sizes AS (SELECT rep, COUNT(*) AS gs FROM comp GROUP BY rep),
grp AS (SELECT n.id AS id, COALESCE(c.rep, n.id) AS rep_id
  FROM n LEFT JOIN comp c ON c.id = n.id),
$qualityKeeperCtes
SELECT grp.id, grp.rep_id, grp.id <> grp.rep_id AS is_dup,
  CAST(COALESCE(s.gs, 1) AS BIGINT) AS group_size,
  keeper.keeper_id, grp.id = keeper.keeper_id AS keep
FROM grp JOIN keeper USING (rep_id)
LEFT JOIN sizes s ON s.rep = grp.rep_id"""

  /** TrainPrep.decontaminateFuzzy(plantedDocs, eval=doc_id<maxEvalId):
    * window-hash-set Jaccard per candidate pair, replayed exactly (same
    * md5 window family; list_intersect on DISTINCT hash sets). */
  def decontaminateFuzzy(k: Int, maxEvalId: Int, threshold: Double): String =
    s"""WITH $planted,
cg AS MATERIALIZED (SELECT * FROM ${windowGrams("u", k)} wg),
eg AS MATERIALIZED (SELECT doc_id AS eid, pos, h FROM
  ${windowGrams(s"(SELECT doc_id, text FROM documents WHERE doc_id < $maxEvalId) s", k)} e),
cset AS (SELECT doc_id, list(DISTINCT h) AS hs FROM cg GROUP BY doc_id),
eset AS (SELECT eid, list(DISTINCT h) AS ehs FROM eg GROUP BY eid),
cand AS (SELECT DISTINCT cg.doc_id, eg.eid FROM cg JOIN eg USING (h)),
ver AS (SELECT cand.doc_id, cand.eid,
  CAST(len(list_intersect(cset.hs, eset.ehs)) AS DOUBLE) /
  CAST(len(cset.hs) + len(eset.ehs) - len(list_intersect(cset.hs, eset.ehs)) AS DOUBLE) AS jac
  FROM cand JOIN cset USING (doc_id) JOIN eset USING (eid))
SELECT doc_id, eid AS eval_id, jac AS jaccard, jac >= $threshold AS contaminated
FROM ver"""

  /** Embedders.embed(documents, dim=32) → Similarity.bruteForceKnn
    * (queries doc_id<5, k=3). Vectors are signed md5-token-hash counts —
    * exact integers, assembled per dimension then cosine'd in DOUBLE. */
  def embedKnn(dim: Int, k: Int, maxQueryId: Int): String =
    s"""WITH tk AS (SELECT doc_id, UNNEST(list_filter(string_split_regex(lower(text), '\\s+'),
    x -> x <> '')) AS t FROM documents),
hv AS (SELECT doc_id, ${duckU64("t")} AS hu FROM tk),
ag AS (SELECT doc_id, CAST(hu % $dim AS BIGINT) AS idx,
    SUM(CASE WHEN hu >= $Half THEN -1 ELSE 1 END) AS v
  FROM hv GROUP BY 1, 2),
g AS (SELECT doc_id, list(idx ORDER BY idx) AS idxs, list(v ORDER BY idx) AS vals
  FROM ag GROUP BY doc_id),
emb AS (SELECT d.doc_id, list_transform(generate_series(0, ${dim - 1}),
    i -> CAST(COALESCE(vals[list_position(idxs, i)], 0) AS DOUBLE)) AS ev
  FROM documents d LEFT JOIN g ON g.doc_id = d.doc_id),
q AS (SELECT doc_id AS query_id, ev AS qv FROM emb WHERE doc_id < $maxQueryId),
c AS (SELECT doc_id AS nn_id, ev AS cv FROM emb),
sc AS (SELECT query_id, nn_id, ${cos("qv", "cv", dim)} AS score
  FROM q JOIN c ON query_id <> nn_id),
r AS (SELECT query_id, nn_id, score,
  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, nn_id ASC) AS rank FROM sc)
SELECT query_id, nn_id, score, rank FROM r WHERE rank <= $k"""

  /** TrainPrep.dsirSelect(raw=documents, target=doc_id%targetMod=0):
    * hashed unigram+bigram bucket counts (md5 % buckets — power-of-two, so
    * unsigned HUGEINT modulo equals Spark's signed pmod), Laplace-smoothed
    * per-bucket log-ratios quantized to integer micro-units (the
    * bm25_per_term LN-round pin), then EXACT integer per-doc weight sums —
    * order-independent on both engines. */
  /** The dsir weight chain alone (CTEs tk…w, ending at w(id, logw_micro)) —
    * shared between [[dsir]] and the composed [[selectAndCurate]] oracle so
    * a weight fix cannot silently diverge between them. */
  private def dsirWeightCtes(buckets: Int, targetMod: Int): String =
    s"""tk AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
    x -> x <> '') AS toks FROM documents),
gr AS (SELECT doc_id, UNNEST(toks || list_transform(generate_series(1, len(toks) - 1),
    i -> toks[i] || ' ' || toks[i + 1])) AS gram FROM tk),
bk AS MATERIALIZED (SELECT doc_id, CAST(${duckU64("gram")} % $buckets AS BIGINT) AS bucket
  FROM gr),
dc AS MATERIALIZED (SELECT doc_id, bucket, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
tc AS (SELECT bucket, SUM(cnt) AS t FROM dc WHERE doc_id % $targetMod = 0 GROUP BY 1),
rc AS (SELECT bucket, SUM(cnt) AS r FROM dc GROUP BY 1),
tot AS (SELECT (SELECT COALESCE(SUM(t), 0) FROM tc) AS tt,
               (SELECT COALESCE(SUM(r), 0) FROM rc) AS rt),
lr AS (SELECT g.b AS bucket,
    CAST(ROUND((LN((COALESCE(tc.t, 0) + 1.0) / (tt + $buckets)) -
                LN((COALESCE(rc.r, 0) + 1.0) / (rt + $buckets))) * 1000000, 0) AS BIGINT) AS lrm
  FROM generate_series(0, ${buckets - 1}) AS g(b)
  LEFT JOIN tc ON tc.bucket = g.b LEFT JOIN rc ON rc.bucket = g.b, tot),
w AS (SELECT dc.doc_id AS id, SUM(dc.cnt * lr.lrm) AS logw_micro
  FROM dc JOIN lr USING (bucket) GROUP BY 1)"""

  def dsir(buckets: Int, k: Int, targetMod: Int): String =
    s"""WITH ${dsirWeightCtes(buckets, targetMod)}
SELECT id, CAST(logw_micro AS BIGINT) AS logw_micro, rank FROM (
  SELECT id, logw_micro,
    ROW_NUMBER() OVER (ORDER BY logw_micro DESC, id ASC) AS rank FROM w)
WHERE rank <= $k"""

  /** TrainDataPipeline.selectAndCurate end-to-end — the composed
    * selection+curation board row. Every stage replays an already-green
    * stage oracle verbatim: DSIR weights ([[dsirWeightCtes]]) → top-K rank
    * head → strict mixture rates (the mixture_plan T* = min cap/w chain,
    * maxEpochs = 1) → stratified hash-slot sample → PII redaction →
    * lang-ID + quality gate → exact text dedup (min-id rep) → MinHash-LSH
    * near-dedup ([[minhashCtes]]) → 8-token-window decontamination →
    * quality-weighted hash sample → train split → sharded sequence
    * packing. All decisions are integer/hash compares or the pinned IEEE
    * float chains, so the composition hash-matches at any sf. */
  def selectAndCurate(buckets: Int, targetMod: Int, topK: Int,
      mix: Seq[(Int, Double)], evalMod: Int, k: Int, numHashes: Int,
      bands: Int, threshold: Double, deconK: Int, budget: Long): String = {
    def slot(m: Long) = "((" + duckSigned(duckU64("CAST(doc_id AS VARCHAR)")) +
      s" % $m) + $m) % $m"
    val mixVals = mix.map { case (s0, w0) => s"($s0, $w0)" }.mkString(", ")
    val em = graft.operators.TrainPrep.EmailRe
    val ph = graft.operators.TrainPrep.PhoneRe
    val stops = "['the','a','and','of','to','in','is','it','you','that']"
    val quality = s"""LEAST(1.0, GREATEST(0.0,
    0.4 * LEAST(1.0, CAST(len(toks) AS DOUBLE) / 100.0)
    + 0.3 * (CAST(len(list_filter(toks, x -> list_contains($stops, x))) AS DOUBLE) / len(toks))
    + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE) / length(text))))"""
    s"""WITH ${dsirWeightCtes(buckets, targetMod)},
sc0 AS (SELECT d.doc_id, d.text, COALESCE(w.logw_micro, -9223372036854775807 - 1) AS lw
  FROM documents d LEFT JOIN w ON w.id = d.doc_id),
sel AS MATERIALIZED (SELECT doc_id, text FROM
  (SELECT doc_id, text, ROW_NUMBER() OVER (ORDER BY lw DESC, doc_id ASC) AS rk FROM sc0)
  WHERE rk <= $topK),
mtk AS (SELECT doc_id, text, doc_id % 5 AS msrc,
    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS nw
  FROM sel),
mcounts AS (SELECT msrc, SUM(nw) AS tokens FROM mtk GROUP BY 1),
mt(tsrc, w0) AS (VALUES $mixVals),
mj AS (SELECT msrc, tokens, tokens * 1.0 AS cap, CAST(w0 AS DOUBLE) AS mw
  FROM mcounts JOIN mt ON msrc = tsrc),
mm AS (SELECT MIN(cap / mw) AS tstar FROM mj),
mrates AS (SELECT msrc, CAST(FLOOR(1000000 * mw * tstar / tokens) AS BIGINT) AS rate_micro
  FROM mj, mm),
samp AS MATERIALIZED (SELECT doc_id, text FROM mtk JOIN mrates USING (msrc)
  WHERE ${slot(1000000L)} < CAST(FLOOR((CAST(rate_micro AS DOUBLE) / 1000000.0) * 1000000.0) AS BIGINT)),
pii AS (SELECT doc_id,
    regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g') AS text
  FROM samp),
la AS (SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM pii),
lq AS (SELECT doc_id, text,
    len(list_filter(toks, x -> list_contains($stops, x))) AS h_en,
    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ich','nicht','mit','ein','zu'], x))) AS h_de,
    len(list_filter(toks, x -> list_contains(['le','la','les','et','est','je','ne','pas','un','pour'], x))) AS h_fr,
    len(list_filter(toks, x -> list_contains(['el','los','y','es','no','un','por','que','con','para'], x))) AS h_es,
    $quality AS quality,
    CAST(len(toks) AS BIGINT) AS n_tokens
  FROM la),
kept AS MATERIALIZED (SELECT doc_id, text, quality, n_tokens FROM lq
  WHERE h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en > 0 AND quality >= 0.3),
ex AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY text),
exd AS MATERIALIZED (SELECT kept.* FROM kept JOIN ex USING (doc_id)),
${minhashCtes("u AS (SELECT doc_id, text FROM exd)", k, numHashes, bands, threshold)},
nbm AS (SELECT id, MIN(nbr) AS mn FROM
  (SELECT id1 AS id, id2 AS nbr FROM dup UNION ALL SELECT id2, id1 FROM dup) GROUP BY id),
nd AS MATERIALIZED (SELECT e.* FROM exd e LEFT JOIN nbm ON nbm.id = e.doc_id
  WHERE COALESCE(nbm.mn, e.doc_id) >= e.doc_id),
cg AS (SELECT * FROM ${windowGrams("(SELECT doc_id, text FROM nd) cs", deconK)} wg),
eg AS (SELECT DISTINCT doc_id AS eid, h FROM
  ${windowGrams(s"(SELECT doc_id, text FROM documents WHERE doc_id % $evalMod = 0) es", deconK)} e2),
cont AS (SELECT DISTINCT cg.doc_id FROM cg JOIN eg USING (h)),
cl AS (SELECT nd.* FROM nd WHERE NOT EXISTS (SELECT 1 FROM cont WHERE cont.doc_id = nd.doc_id)),
sw AS (SELECT * FROM cl
  WHERE ${slot(1000000L)} < CAST(FLOOR(LEAST(quality + 0.5, 1.0) * 1000000.0) AS BIGINT)),
tr AS (SELECT doc_id, n_tokens, ${slot(16L)} AS sh FROM sw WHERE ${slot(100L)} < 98),
pk AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER (
  PARTITION BY sh ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM tr)
SELECT doc_id, n_tokens, CAST(off // $budget AS BIGINT) AS pack_id,
  CAST(off % $budget AS BIGINT) AS offset_in_pack FROM pk"""
  }
}
