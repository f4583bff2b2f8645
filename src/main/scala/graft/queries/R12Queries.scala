package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Similarity

/** Round-12 queries.
  *
  *  - q_v_semantic_dedup_autok: SemDeDup with k auto-sized ∝ n — the
  *    SCALE path of q_v_semantic_dedup, now under the oracle itself.
  *    The fixed-k=16 variant is bit-exact but its within-cluster pair
  *    count grows QUADRATICALLY with the corpus (the sf1 sweep measured
  *    the foot-gun; the sf10 oracle replay of it is infeasible on any
  *    single-node engine). With k = max(16, ceil(n/500)) the expected
  *    cluster size is constant, candidate pairs grow linearly, and the
  *    same DuckDB statement replays sf0.001 through sf10.
  *
  *    The oracle uses the LIST-OP assignment discipline: dist(v, c) =
  *    v·v + c·c − 2·v·c over the 1e6-quantized BIGINT lists
  *    (list_inner_product), every term an exact integer ≤ ~2.6e13 ≪
  *    2^53, so the double image is exact and the (dist, cid) tie-break
  *    is engine-identical — same numbers as the unnest×k×64 join form
  *    of the q_v_semantic_dedup oracle, at a fraction of the rows.
  *    Candidate pairs are pruned by the quantized integer cosine at
  *    threshold − 1e-4 (quantization error ≤ ~1e-5 for the unit-norm
  *    corpus) and only survivors pay the DECIMAL(30,12)-exact rescore —
  *    mirroring the Spark side's fast-prune/exact-rescore split. */
object R12Queries {

  private val SemTargetCluster = 500L
  private val SemThreshold = 0.999

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_v_semantic_dedup_autok" -> ((s, d) => {
      Similarity.semanticDedupKeepAuto(Tables(s, d, "embeddings"),
          threshold = SemThreshold,
          targetClusterSize = SemTargetCluster, iters = 2)
        .orderBy("vec_id")
    })
  )

  /** The auto-k SemDeDup CTE chain over `embeddings` (shared shape with
    * the q_pipe_ep4 stage-7 oracle, restructured to list ops). */
  private def semAutoKSql: String = {
    // one assignment round: nearest centroid by exact integer distance,
    // cid tie-break; centroids carried as (cid, q list, q·q)
    def assign(cTab: String): String =
      s"""(SELECT vec_id, cid FROM (
         |    SELECT v.vec_id, c.cid,
         |      v.qq + c.qq - 2 * list_inner_product(v.q, c.q) AS dist
         |    FROM qn v, $cTab c)
         |  QUALIFY row_number()
         |    OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)""".stripMargin
    s"""WITH RECURSIVE
       |kk AS (SELECT GREATEST(16, CAST((COUNT(*) + ${SemTargetCluster - 1})
       |    // $SemTargetCluster AS INTEGER)) AS k FROM embeddings),
       |idx AS (SELECT unnest(range(1, 65)) AS i),
       |ql AS (SELECT vec_id, list_transform(range(1, 65),
       |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
       |      AS BIGINT)) AS q
       |  FROM embeddings),
       |qn AS (SELECT vec_id, q, list_inner_product(q, q) AS qq FROM ql),
       |init AS (SELECT vec_id,
       |  CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |    vec_id) AS INTEGER) AS cid
       |  FROM embeddings
       |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |    vec_id) <= (SELECT k FROM kk)),
       |c0 AS (SELECT init.cid, qn.q, qn.qq FROM init JOIN qn USING (vec_id)),
       |a1 AS ${assign("c0")},
       |a1d AS (SELECT a.cid, i, ql.q[i] AS qv
       |  FROM a1 a JOIN ql USING (vec_id), idx),
       |u1 AS (SELECT cid, i, CAST(SUM(qv) // COUNT(*) AS BIGINT) AS cq
       |  FROM a1d GROUP BY cid, i),
       |c0d AS (SELECT cid, i, q[i] AS cq FROM c0, idx),
       |c1d AS (SELECT c0d.cid, c0d.i, COALESCE(u1.cq, c0d.cq) AS cq
       |  FROM c0d LEFT JOIN u1 ON u1.cid = c0d.cid AND u1.i = c0d.i),
       |c1 AS (SELECT cid, list(cq ORDER BY i) AS q,
       |    CAST(SUM(CAST(cq AS DOUBLE) * cq) AS DOUBLE) AS qq
       |  FROM c1d GROUP BY cid),
       |a2 AS ${assign("c1")},
       |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  JOIN qn qa ON qa.vec_id = a.vec_id
       |  JOIN qn qb ON qb.vec_id = b.vec_id
       |  WHERE CAST(list_inner_product(qa.q, qb.q) AS DOUBLE)
       |    >= ($SemThreshold - 1.0E-4)
       |      * sqrt(CAST(qa.qq AS DOUBLE) * CAST(qb.qq AS DOUBLE))),
       |n2 AS (SELECT vec_id, CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
       |    * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS n2
       |  FROM embeddings, idx
       |  WHERE vec_id IN (SELECT id_a FROM cand UNION
       |    SELECT id_b FROM cand)
       |  GROUP BY vec_id),
       |dots AS (SELECT id_a, id_b, CAST(SUM(CAST(CAST(ua.embedding[i]
       |      AS DOUBLE) * CAST(ub.embedding[i] AS DOUBLE)
       |      AS DECIMAL(30,12))) AS DOUBLE) AS dot
       |  FROM cand JOIN embeddings ua ON ua.vec_id = cand.id_a
       |  JOIN embeddings ub ON ub.vec_id = cand.id_b, idx
       |  GROUP BY id_a, id_b),
       |p AS (SELECT id_a, id_b FROM dots
       |  JOIN n2 na ON na.vec_id = dots.id_a
       |  JOIN n2 nb ON nb.vec_id = dots.id_b
       |  WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= $SemThreshold),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |  UNION SELECT id_b, id_a FROM p),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
       |lbl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
       |SELECT a2.vec_id AS vec_id, a2.cid AS cluster,
       |  (lbl.comp IS NULL OR lbl.comp = a2.vec_id) AS keep
       |FROM a2 LEFT JOIN lbl ON lbl.id = a2.vec_id
       |ORDER BY vec_id""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q_v_semantic_dedup_autok" -> semAutoKSql
  )
}
