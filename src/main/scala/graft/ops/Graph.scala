package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph helpers for the dedup pipeline: near-duplicate PAIRS
  * become near-duplicate CLUSTERS via connected components, so a corpus can
  * keep exactly one representative per duplicate group (pair-wise removal
  * alone over-keeps on transitive chains a~b~c).
  *
  * No GraphX: the label-propagation loop below is plain DataFrame joins, so
  * Catalyst/AQE handle partitioning and the whole thing scales like any
  * shuffle-on-key plan. Iteration count is the component DIAMETER, which for
  * dedup clusters (cliques or short chains) is 1-3.
  */
object Graph {

  /** `localCheckpoint` pins its RDD at the RDD layer, invisible to
    * `catalog.clearCache()` — without explicit release, every iterative
    * round leaks one rank/label vector for the life of the session
    * (measured in round 4: the accumulated orphans inflated later bench
    * queries 9-26x). The RDD registers in `getPersistentRDDs` at call
    * time, so bracketing the call captures exactly the ids to free once
    * the NEXT round materializes. */
  private def checkpointTracked(df: DataFrame, eager: Boolean)
      : (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint(eager)
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  private def unpersistIds(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(true)))
  }

  /** Connected components by iterative min-label propagation.
    *
    * Input: an undirected edge relation (two id columns, any orientation,
    * duplicates allowed). Output: one row per vertex that appears in an
    * edge — (id, comp) with comp = the minimum vertex id reachable.
    *
    * Each round: every vertex offers its current label to its neighbors;
    * labels only decrease, so the loop converges (monotone fixpoint) in at
    * most diameter rounds; the driver sees only the converged-or-not count.
    * Per-round cost: one shuffle-on-id join + one groupBy(id) min — the
    * 100 TB shape (labels and edges co-partition on id after round one;
    * nothing row-level reaches the driver). localCheckpoint() truncates the
    * growing lineage so round k does not replay rounds 1..k-1.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // lazy localCheckpoints (eager = false): the convergence count is the
    // action that materializes each round, so a round costs ONE job, not
    // two — while lineage still truncates (round k never replays 1..k-1)
    var (labels, liveIds) = checkpointTracked(
      sym.select(col("src").as("id")).distinct()
        .withColumn("comp", col("id")), eager = false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor-minimum offer: min over incoming labels per vertex
      val offers = sym.join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id")).agg(min("comp").as("offer"))
      val (next, nextIds) = checkpointTracked(
        labels.join(offers, Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("offer"), col("comp"))).as("comp"),
            (coalesce(col("offer"), col("comp")) < col("comp")).as("__changed")),
        eager = false)
      // FULL count (no limit-early-exit): a partial action would leave the
      // lazy checkpoint partially materialized with its lineage already
      // truncated — unrecomputable. The full pass is the materializer.
      converged = next.filter(col("__changed")).count() == 0
      // round k-1's label vector is dead once round k materializes —
      // release it or the loop leaks one checkpointed RDD per round
      unpersistIds(next, liveIds)
      liveIds = nextIds
      labels = next.drop("__changed")
      iter += 1
    }
    sym.unpersist()
    // the returned frame carries exactly ONE pinned RDD (its own
    // checkpoint); harnesses sweep it via Leaks.sweep between pipelines
    labels
  }

  /** Cluster summary of an edge relation: (comp, n_members) — e.g. the
    * size distribution of near-duplicate groups. */
  def componentSizes(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    connectedComponents(edges, srcCol, dstCol)
      .groupBy("comp").agg(count(lit(1)).as("n_members"))

  /** Exact triangle count of an undirected graph (any edge orientation /
    * duplicates in the input). Canonicalizes to a < b, then counts via two
    * equi-joins: wedges (a,b)+(b,c) with a<b<c close into triangles iff
    * (a,c) is an edge. Every join is on a vertex key — at scale the edge
    * relation co-partitions across the three roles and the wedge fan-out
    * is bounded by max canonical out-degree (the standard node-iterator
    * bound; feed pre-thresholded edges for power-law graphs). */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = e.toDF("a", "b")
      .join(e.toDF("b", "c"), Seq("b"))
    // materialize the single-row aggregate NOW so the canonical edge cache
    // can be released before returning — otherwise repeated calls in a
    // long-lived session accumulate cached blocks (the count is O(1) data;
    // eagerness costs nothing a caller could have deferred)
    val n = wedges.join(e.toDF("a", "c"), Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles")).head().getLong(0)
    e.unpersist()
    val spark = edges.sparkSession
    import spark.implicits._
    Seq(n).toDF("n_triangles")
  }

  /** Damped PageRank by power iteration — each round is ONE shuffle join
    * of the edge relation with the current rank vector plus ONE grouped
    * aggregation, i.e. the same shuffle-on-key shape as every other
    * operator here; nothing row-level ever reaches the driver.
    *
    * The edge list is symmetrized, so every node has out-degree ≥ 1 and
    * the dangling-mass correction term vanishes. Per-edge contributions
    * rank/deg accumulate through DECIMAL(30,12) (the q_v_centroids
    * discipline), which makes the rank vector BIT-IDENTICAL under any
    * partitioning or executor count — and therefore oracle-checkable
    * against an engine that sums in a different order.
    *
    * `iters` is small and fixed (power iteration converges geometrically
    * at rate `damping`); lineage stays shallow, no checkpointing needed.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               teleport: Double = 0.15,
               edgesDistinct: Boolean = false): DataFrame = {
    // `edgesDistinct`: when the caller guarantees a deduplicated edge list
    // whose two endpoint spaces are disjoint (e.g. a bipartite graph with
    // even/odd node encoding), the symmetrized union cannot contain
    // duplicates and the global distinct — a full extra shuffle — is
    // skipped.
    val raw = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .union(edges
        .select(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))
    // Exchange the edge list on `src` ONCE and let everything downstream
    // reuse that partitioning: HashPartitioning(src) satisfies the
    // clustered distribution for the (src,dst) dedup aggregate, the
    // degree aggregate, AND the per-iteration join — so dedup, degree,
    // and join all run exchange-free on top of this single shuffle
    // (previously: distinct keyed (src,dst), then a groupBy(src)
    // re-exchange, then a repartition(src) — three full-edge shuffles).
    val part = raw.repartition(col("src"))
    val sym = (if (edgesDistinct) part else part.dropDuplicates("src", "dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // degree relation doubles as the node list (one row per node) — no
    // separate distinct shuffle; pinned because every iteration joins it
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // each round's ranks vector arrives hash-partitioned on `node` from
    // the previous round's groupBy("dst") (alias propagation keeps the
    // partitioning through the rename), and this side is already
    // partitioned on src — every iteration's join is exchange-free,
    // ONE shuffle per round (the groupBy), at any cluster size
    val withDeg = sym.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // node count is a one-row scalar (the triangleCount precedent): the
    // Scala-side divisions below hit the same IEEE ops as the oracle's
    val nD = deg.count().toDouble
    var ranks = deg.select(col("src").as("node"), lit(1.0 / nD).as("rank"))
    for (_ <- 1 to iters)
      // NO per-iteration checkpoint: `iters` is small and fixed, so the
      // whole power iteration is one shallow job — round 4 eagerly
      // materialized every round's rank vector (3 extra jobs) and leaked
      // each one (localCheckpoint blocks are invisible to clearCache);
      // the decimal sums make recomputation bit-identical anyway
      ranks = withDeg.join(ranks, col("src") === col("node"))
        .groupBy("dst")
        .agg(Num.dsum12(col("rank") / col("deg")).as("__in"))
        .select(col("dst").as("node"),
          (lit(teleport / nD) + lit(damping) * col("__in")).as("rank"))
    // ONE eager materialization of the final vector lets the three pinned
    // inputs release before returning; the returned frame carries exactly
    // ONE pinned RDD (its own checkpoint), swept by Leaks.sweep between
    // pipelines
    val out = ranks.localCheckpoint(true)
    sym.unpersist()
    deg.unpersist()
    withDeg.unpersist()
    out
  }
}
