package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Similarity
import graft.text.TextOps

/** EP4 in the oracle club: the FULL all-modality corpus build —
  * quality gate → language agreement → exact dedup → minhash near-dup →
  * exact-substring dedup → edit-distance near-dup → SEMANTIC near-dup —
  * replayed end to end by one DuckDB statement, reporting the kept-count
  * after every stage. q_x_corpus_pipeline covers the first four stages;
  * this is the whole `pipelines/CorpusBuild.run` chain (stage-for-stage,
  * same parameters), so the composition the 100 TB pipeline actually
  * executes is itself cross-engine-verified: any inter-stage drift
  * (survivor set feeding the next blocker, lang column reuse in the edit
  * blocking, the text↔embedding id join) breaks a count.
  *
  * Scale notes: every stage is the already-verified operator (banded
  * LSH, df-pruned grams, composed lang×band×length blocking, cluster-
  * blocked semantic pairs) — no stage is quadratic in the corpus; the
  * counts are one aggregate per checkpointed stage frame.
  *
  * Ref: the reference's notebook ETL composes stages the same way
  * (1-1.data_processing.ipynb cells 6-11); the dedup stack follows
  * Lee et al. 2022 (exact-substring) and SemDeDup (Abbas et al. 2023).
  */
object Ep4Queries {

  private val SemTargetCluster = 500L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipe_ep4" -> ((s, d) => {
      val docs = Tables(s, d, "documents")
      val emb = Tables(s, d, "embeddings")
      // (1) hygiene: quality gate + language agreement (CorpusBuild stages)
      val quality = TextOps.qualityFeatures(docs)
        .filter(col("alpha_ratio") > 0.7 && col("n_tokens").between(20, 2000))
      val langOk = quality
        .filter(TextOps.langIdFast(col("text")) === col("lang"))
        .select(docs.columns.map(col): _*)
      // (2) exact dedup — checkpointed: feeds the pair join twice + a count
      val deduped = TextOps.exactDedup(langOk, "doc_id", "text")
        .localCheckpoint(true)
      // (3) minhash near-dup removal (drop the larger id of each pair)
      val mhPairs = TextOps.minhashNearDupPairs(deduped, "doc_id", "text",
        numHashes = 16, bands = 2, threshold = 0.5)
      val nearKept = deduped.join(
          mhPairs.select(col("id_b").as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      // (4) exact-substring (shared verbatim ≥8-token run) removal
      val spanPairs = TextOps.sharedSpanPairs(nearKept, "doc_id", "text",
        k = 8, maxDocFreq = 16)
      val subKept = nearKept.join(
          spanPairs.select(col("doc_b").as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      // (5) edit-distance near-dup removal (composed lang × minhash-band ×
      // length-band blocking — the operator default)
      val editPairs = TextOps.editNearDupPairs(subKept, "doc_id", "text",
        maxDist = 32, minhashBands = 4, blockCols = Seq("lang"))
      val editKept = subKept.join(
          editPairs.select(col("doc_b").as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      // (6) semantic near-dup removal over the embedding table (auto-k
      // cluster blocking), joined back by id
      val semKeep = Similarity
        .semanticDedupKeepAuto(emb, threshold = 0.999,
          targetClusterSize = SemTargetCluster, iters = 2)
        .filter(col("keep")).select(col("vec_id").as("doc_id"))
      val semKept = editKept.join(semKeep, Seq("doc_id"), "left_semi")
      def cnt(ord: Int, stage: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(ord).as("stage_ord"), lit(stage).as("stage"),
            col("n_docs"))
      cnt(0, "raw", docs)
        .unionByName(cnt(1, "quality", quality))
        .unionByName(cnt(2, "lang_ok", langOk))
        .unionByName(cnt(3, "exact_dedup", deduped))
        .unionByName(cnt(4, "minhash_dedup", nearKept))
        .unionByName(cnt(5, "substring_dedup", subKept))
        .unionByName(cnt(6, "edit_dedup", editKept))
        .unionByName(cnt(7, "semantic_dedup", semKept))
        .orderBy("stage_ord")
    }))

  import TextSimQueries.{toksSql, normSql, normToksSql, shinglesSql,
    langScoreColsSql, langBestSql, langCaseSql}

  val oracles: Map[String, String] = Map(
    "q_pipe_ep4" -> {
      // 16 md5-permutation minhash minima (the q_x_minhash spec) — banded
      // 2×8 for the minhash stage and 4×4 for the edit stage's blocker
      val mins = (0 until 16).map(i =>
        s"list_min(list_transform(sh, s -> md5('$i' || ':' || s)))")
        .mkString(",\n   ")
      val band2 = "(a.sg[1:8] = b.sg[1:8] OR a.sg[9:16] = b.sg[9:16])"
      val band4 = (0 until 4).map(b =>
        s"sa.sg[${4 * b + 1}:${4 * b + 4}] = sb.sg[${4 * b + 1}:${4 * b + 4}]")
        .mkString("(", " OR ", ")")
      // deterministic Lloyd's (k auto-sized: max(16, ceil(n/500))) +
      // decimal-exact cosine pairs + recursive-CTE component closure —
      // the q_v_semantic_dedup oracle with dynamic k and no fixture union
      def assign(cTab: String): String =
        s"""(SELECT vec_id, cid FROM (
           |    SELECT qe.vec_id, c.cid,
           |      SUM((qe.q - c.cq) * (qe.q - c.cq)) AS dist
           |    FROM qe JOIN $cTab c USING (dim)
           |    GROUP BY qe.vec_id, c.cid)
           |  QUALIFY row_number()
           |    OVER (PARTITION BY vec_id ORDER BY dist, cid) = 1)""".stripMargin
      s"""WITH RECURSIVE
         |qd AS (SELECT doc_id, lang, source, text FROM documents
         |  WHERE length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
         |      / CAST(length(text) AS DOUBLE) > 0.7
         |    AND len($toksSql) BETWEEN 20 AND 2000),
         |sc AS (SELECT doc_id, lang, source, text, $langScoreColsSql FROM qd),
         |bb AS (SELECT *, $langBestSql AS best FROM sc),
         |lf AS (SELECT doc_id, lang, source, text FROM bb WHERE $langCaseSql = lang),
         |dd AS (SELECT MIN(doc_id) AS doc_id FROM
         |  (SELECT md5($normSql) AS fp, doc_id FROM lf) k GROUP BY fp),
         |d2 AS (SELECT lf.doc_id, lf.lang, lf.text FROM lf JOIN dd USING (doc_id)),
         |shx AS (SELECT doc_id, $shinglesSql AS sh FROM d2),
         |sig AS (SELECT doc_id, sh, [$mins] AS sg FROM shx),
         |mh_removed AS (SELECT DISTINCT b.doc_id FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND $band2
         |  WHERE list_sum(list_transform(range(1, 17),
         |      i -> CASE WHEN a.sg[i] = b.sg[i] THEN 1 ELSE 0 END)) / 16.0 >= 0.25
         |    AND len(list_intersect(a.sh, b.sh))
         |      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.5),
         |mk AS (SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM mh_removed)),
         |g AS (SELECT doc_id, unnest(CASE WHEN len($normToksSql) < 8
         |    THEN [md5(array_to_string($normToksSql, ' '))]
         |    ELSE list_distinct(list_transform(range(0, len($normToksSql) - 7),
         |      i -> md5(array_to_string(($normToksSql)[i+1:i+8], ' ')))) END) AS gram
         |  FROM mk),
         |keptg AS (SELECT gram FROM g GROUP BY gram
         |  HAVING count(*) BETWEEN 2 AND 16),
         |gj AS (SELECT doc_id, gram FROM g JOIN keptg USING (gram)),
         |sub_removed AS (SELECT DISTINCT b.doc_id
         |  FROM gj a JOIN gj b ON a.gram = b.gram AND a.doc_id < b.doc_id),
         |sk AS (SELECT * FROM mk WHERE doc_id NOT IN (SELECT doc_id FROM sub_removed)),
         |en AS (SELECT doc_id, lang, $normSql AS norm,
         |    length($normSql) AS len FROM sk),
         |edit_removed AS (SELECT DISTINCT b.doc_id
         |  FROM en a JOIN en b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |    AND abs(a.len - b.len) <= 32
         |  JOIN sig sa ON sa.doc_id = a.doc_id
         |  JOIN sig sb ON sb.doc_id = b.doc_id
         |  WHERE $band4 AND levenshtein(a.norm, b.norm) <= 32),
         |ek AS (SELECT * FROM sk WHERE doc_id NOT IN (SELECT doc_id FROM edit_removed)),
         |kk AS (SELECT GREATEST(16, CAST((COUNT(*) + ${SemTargetCluster - 1})
         |    // $SemTargetCluster AS INTEGER)) AS k FROM embeddings),
         |idx AS (SELECT unnest(range(1, 65)) AS i),
         |qe AS (SELECT vec_id, CAST(i - 1 AS INTEGER) AS dim,
         |  CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS q
         |  FROM embeddings, idx),
         |init AS (SELECT vec_id,
         |  CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
         |    vec_id) AS INTEGER) AS cid
         |  FROM embeddings
         |  QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
         |    vec_id) <= (SELECT k FROM kk)),
         |c0 AS (SELECT init.cid, qe.dim, qe.q AS cq
         |  FROM init JOIN qe USING (vec_id)),
         |a1 AS ${assign("c0")},
         |u1 AS (SELECT a.cid, qe.dim,
         |    CAST(SUM(qe.q) // COUNT(*) AS BIGINT) AS cq
         |  FROM a1 a JOIN qe USING (vec_id) GROUP BY a.cid, qe.dim),
         |c1 AS (SELECT c0.cid, c0.dim, COALESCE(u1.cq, c0.cq) AS cq
         |  FROM c0 LEFT JOIN u1 ON u1.cid = c0.cid AND u1.dim = c0.dim),
         |a2 AS ${assign("c1")},
         |n2 AS (SELECT vec_id, CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE)
         |    * CAST(embedding[i] AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS n2
         |  FROM embeddings, idx GROUP BY vec_id),
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    ua.embedding AS va, ub.embedding AS vb
         |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |  JOIN embeddings ua ON ua.vec_id = a.vec_id
         |  JOIN embeddings ub ON ub.vec_id = b.vec_id),
         |dots AS (SELECT id_a, id_b, CAST(SUM(CAST(CAST(va[i] AS DOUBLE)
         |    * CAST(vb[i] AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE) AS dot
         |  FROM cand, idx GROUP BY id_a, id_b),
         |p AS (SELECT id_a, id_b FROM dots
         |  JOIN n2 na ON na.vec_id = dots.id_a
         |  JOIN n2 nb ON nb.vec_id = dots.id_b
         |  WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.999),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM p
         |  UNION SELECT id_b, id_a FROM p),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
         |lbl AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         |sem_keep AS (SELECT e.vec_id AS doc_id FROM embeddings e
         |  LEFT JOIN lbl ON lbl.id = e.vec_id
         |  WHERE lbl.comp IS NULL OR lbl.comp = e.vec_id),
         |fk AS (SELECT * FROM ek WHERE doc_id IN (SELECT doc_id FROM sem_keep))
         |SELECT * FROM (
         |  SELECT CAST(0 AS INTEGER) AS stage_ord, 'raw' AS stage,
         |    COUNT(*) AS n_docs FROM documents
         |  UNION ALL SELECT 1, 'quality', COUNT(*) FROM qd
         |  UNION ALL SELECT 2, 'lang_ok', COUNT(*) FROM lf
         |  UNION ALL SELECT 3, 'exact_dedup', COUNT(*) FROM d2
         |  UNION ALL SELECT 4, 'minhash_dedup', COUNT(*) FROM mk
         |  UNION ALL SELECT 5, 'substring_dedup', COUNT(*) FROM sk
         |  UNION ALL SELECT 6, 'edit_dedup', COUNT(*) FROM ek
         |  UNION ALL SELECT 7, 'semantic_dedup', COUNT(*) FROM fk)
         |ORDER BY stage_ord""".stripMargin
    })
}
