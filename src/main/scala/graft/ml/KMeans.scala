package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means on an integer-quantized grid.
  *
  * Embedding components snap to a 1/quant grid via floor(v·quant + 0.5)
  * (exact double arithmetic — identical on every IEEE engine), so each
  * squared L2 distance is an exact BIGINT, the nearest-centroid argmin is
  * tie-broken deterministically by centroid id, and the centroid update
  * truncates the per-dimension mean back onto the grid with BIGINT `div`
  * (truncation toward zero — the same semantics as DuckDB's `//`). The
  * fixpoint is therefore bit-identical under any partitioning and
  * reproducible by any engine with 64-bit integers: a clustering whose
  * oracle is pure SQL. Clusters that lose all members keep their previous
  * centroid and report n = 0.
  *
  * Scale shape: assignment is NARROW — the k quantized centroid arrays
  * ship as literals inside one expression and every row computes its k
  * distances in place, no join, no shuffle. The update is ONE shuffle per
  * iteration (posexplode → groupBy (cluster, dim) with map-side partial
  * aggregation). Only k·dims fitted integers reach the driver per round,
  * so a 100 TB corpus streams through map tasks exactly like the IVF
  * trainer in [[graft.sim.Similarity]].
  *
  * Ref: teamProject/eda.ipynb (the reference clusters with single-node
  * sklearn; this is the distributed, oracle-checkable reformulation).
  */
object KMeans {

  /** Snap the first `dims` components onto the 1/quant integer grid. */
  def quantize(vecCol: Column, dims: Int, quant: Double): Column =
    transform(slice(vecCol, 1, dims),
      v => floor(v.cast("double") * quant + lit(0.5)).cast("long"))

  // Narrow assignment through the codegen'd NearestCentroid expression:
  // one primitive k × dims loop on exact longs, ties toward the lower cid
  // — bit-identical to (and ~an order of magnitude cheaper than) the
  // interpreted array_min-over-aggregate(zip_with) form it replaced,
  // which evaluated k boxed lambdas per row on the assignment hot path.
  // Relies on centroid ids being exactly 1..k in order (they are: seeded
  // and updated positionally).
  private def assignedTo(qvecs: DataFrame,
                         centroids: Seq[(Int, Seq[Long])]): DataFrame = {
    require(centroids.map(_._1) == (1 to centroids.size),
      "centroid ids must be 1..k in order")
    qvecs.withColumn("cluster",
      graft.expressions.NearestCentroid.assign(col("qa"), centroids.map(_._2)))
  }

  private def updatedFrom(qvecs: DataFrame,
                          centroids: Seq[(Int, Seq[Long])]): DataFrame =
    assignedTo(qvecs, centroids)
      .select(col("cluster"), posexplode(col("qa")).as(Seq("dim", "q")))
      .groupBy("cluster", "dim")
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .withColumn("cq", expr("sq div n"))

  // Deterministic seed + (iters - 1) collected centroid updates. Seed: the
  // k vectors with the smallest md5(id) — an unkeyed uniform sample
  // yielding the same k rows on any engine (TakeOrdered on the Spark side,
  // never a global window). Only k·dims fitted integers reach the driver.
  private def fitCentroids(qvecs: DataFrame, k: Int, iters: Int)
      : Seq[(Int, Seq[Long])] = {
    var centroids: Seq[(Int, Seq[Long])] =
      qvecs.orderBy(md5(col("vid").cast("string")), col("vid")).limit(k)
        .collect().toSeq.zipWithIndex
        .map { case (r, i) => (i + 1, r.getSeq[Long](1)) }
    for (_ <- 1 until iters) {
      val upd = updatedFrom(qvecs, centroids).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap
      centroids = centroids.map { case (cid, arr) =>
        (cid, arr.indices.map(i => upd.getOrElse((cid, i), arr(i))))
      }
    }
    centroids
  }

  private def quantized(emb: DataFrame, idCol: String, vecCol: String,
                        dims: Int, quant: Double): DataFrame =
    emb.select(col(idCol).as("vid"),
      quantize(col(vecCol), dims, quant).as("qa"))
  // NOTE (r13 measurement): spreading/pinning the fit relation here was
  // tried and REVERTED — at bench scale the embedding relations are
  // ~800 KB and the 1-task Lloyd's passes are cheaper than the exchange
  // + cache they'd buy (q_v_ivf_ann 0.85 → 2.41 s, q_v_pq_codes 0.62 →
  // 1.94 s with the spread). The text operators keep spread because
  // their per-row cost (shingling, minhash) dwarfs the exchange.

  /** Lloyd's iterations over (idCol, vecCol: array&lt;float&gt;).
    * @return (cluster, dim, centroid, n) — k·dims rows, ordered. */
  def kmeansQuantized(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, dims: Int, iters: Int,
                      quant: Double = 1e6): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(iters >= 1 && k >= 1)
    val qvecs = quantized(emb, idCol, vecCol, dims, quant)
    val centroids = fitCentroids(qvecs, k, iters)
    // Final round stays in-plan: the full centroid grid LEFT JOINs the
    // last update so empty clusters keep their centroid with n = 0.
    val grid = centroids.flatMap { case (cid, arr) =>
      arr.indices.map(i => (cid, i, arr(i)))
    }.toDF("cluster", "dim", "prev_cq")
    grid.join(updatedFrom(qvecs, centroids), Seq("cluster", "dim"), "left")
      .select(col("cluster"), col("dim"),
        (coalesce(col("cq"), col("prev_cq")).cast("double") / quant)
          .as("centroid"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("cluster", "dim")
  }

  /** Per-vector cluster assignment under the centroids after `iters - 1`
    * updates — the partition step SemDeDup-style semantic dedup blocks on.
    * Assignment itself is NARROW (centroid literals inside one expression,
    * no join/shuffle), so at 100 TB it rides the scan.
    * @return (idCol, cluster) — one row per input vector. */
  def assignQuantized(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, dims: Int, iters: Int,
                      quant: Double = 1e6): DataFrame =
    assignUnder(emb, idCol, vecCol, dims,
      fitQuantized(emb, idCol, vecCol, k, dims, iters, quant), quant)

  /** The driver-side fitted integer-grid centroids [[assignQuantized]]
    * assigns against: k × (1-based cid, dims grid values) after `iters - 1`
    * collected updates — k·dims fitted integers, the only thing that ever
    * reaches the driver. Exposed so multi-stage operators (the PQ-ADC
    * search) can fit ONCE and derive both the code assignment and the
    * asymmetric-distance lookup tables from the SAME centroids. */
  def fitQuantized(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, dims: Int, iters: Int,
                   quant: Double = 1e6): Seq[(Int, Seq[Long])] = {
    require(iters >= 1 && k >= 1)
    fitCentroids(quantized(emb, idCol, vecCol, dims, quant), k, iters)
  }

  /** Assignment under EXPLICIT fitted centroids (from [[fitQuantized]]) —
    * same narrow codegen'd NearestCentroid expression, no refit. */
  def assignUnder(emb: DataFrame, idCol: String, vecCol: String, dims: Int,
                  centroids: Seq[(Int, Seq[Long])],
                  quant: Double = 1e6): DataFrame =
    assignedTo(quantized(emb, idCol, vecCol, dims, quant), centroids)
      .select(col("vid").as(idCol), col("cluster"))

  /** Lloyd's fit over an ALREADY-integer grid column (`array<long>`) —
    * the residual-PQ path, where the training points are differences of
    * two quantized grids and must NOT be re-quantized (q(x) − q(c) is
    * exact; q(x − c) would re-round). Same seed, assignment, and update
    * discipline as [[fitQuantized]], so the fixpoint stays bit-identical
    * under any partitioning and SQL-replayable. */
  def fitGrid(grid: DataFrame, idCol: String, gridCol: String,
              k: Int, iters: Int): Seq[(Int, Seq[Long])] = {
    require(iters >= 1 && k >= 1)
    fitCentroids(grid.select(col(idCol).as("vid"), col(gridCol).as("qa")),
      k, iters)
  }

  /** [[assignUnder]] for an already-integer grid column. */
  def assignGridUnder(grid: DataFrame, idCol: String, gridCol: String,
                      centroids: Seq[(Int, Seq[Long])]): DataFrame =
    assignedTo(grid.select(col(idCol).as("vid"), col(gridCol).as("qa")),
      centroids)
      .select(col("vid").as(idCol), col("cluster"))

  // ---------------------------------------------------------------------
  // Batched multi-subspace Lloyd's — the PQ family's fit shape.
  //
  // The 8 per-subspace codebook fits of a product quantizer are
  // independent, but running them as 8 separate job chains costs 8 seed
  // TakeOrdereds + 8 update aggregates per iteration + 8 assignment
  // passes over the SAME relation (r13 measurement: q_v_pqr_ann spent
  // 77 task-seconds on a 2 000-row corpus — all per-stage fixed cost,
  // 8 concurrent fits × tiny tasks contending on the codegen cache).
  // Every step is subspace-keyed, so one pass carries all subspaces:
  //   - the seed ordering (md5(vid), vid) never depended on the
  //     subspace — ONE TakeOrdered yields every subspace's seed rows;
  //   - the update is ONE aggregate keyed (subspace, cluster, dim) over
  //     posexplode of the full grid — identical per-key sums;
  //   - assignment is ONE projection of `subspaces` NearestCentroid
  //     expressions over their slices.
  // Per-subspace arithmetic is bit-identical to fitGrid on each slice
  // (the r7/r6 oracle replays and TextSimSpec pin it).
  // ---------------------------------------------------------------------

  /** One NearestCentroid expression per subspace over its slice of the
    * full-dim grid column — the batched assignment vector. */
  private def subClusters(qa: Column,
                          cents: IndexedSeq[Seq[(Int, Seq[Long])]],
                          subDims: Int): Column =
    array(cents.zipWithIndex.map { case (cs, s) =>
      require(cs.map(_._1) == (1 to cs.size),
        "centroid ids must be 1..k in order")
      graft.expressions.NearestCentroid.assign(
        slice(qa, s * subDims + 1, subDims), cs.map(_._2))
    }: _*)

  /** One update aggregate for every subspace: (subspace, cluster, dim,
    * sq, n, cq) with dim the offset WITHIN the subspace — the same sums
    * `updatedFrom` computes per subspace, keyed by subspace. */
  private def batchUpdatedFrom(grid: DataFrame,
                               cents: IndexedSeq[Seq[(Int, Seq[Long])]],
                               subDims: Int): DataFrame =
    grid.withColumn("__c", subClusters(col("qa"), cents, subDims))
      .select(col("__c"), posexplode(col("qa")).as(Seq("d", "q")))
      .select(floor(col("d") / subDims).cast("int").as("subspace"),
        element_at(col("__c"),
          floor(col("d") / subDims).cast("int") + 1).as("cluster"),
        (col("d") % subDims).cast("int").as("dim"), col("q"))
      .groupBy("subspace", "cluster", "dim")
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .withColumn("cq", expr("sq div n"))

  /** Fit all `subspaces` per-subspace codebooks over contiguous
    * `subDims`-wide slices of `gridCol` in one chain of distributed
    * passes. Fixpoints are identical to [[fitGrid]] on each slice.
    * @return fitted centroids indexed by subspace. */
  def fitGridBatch(grid: DataFrame, idCol: String, gridCol: String,
                   k: Int, iters: Int, subspaces: Int, subDims: Int)
      : IndexedSeq[Seq[(Int, Seq[Long])]] = {
    require(iters >= 1 && k >= 1 && subspaces >= 1)
    val g = grid.select(col(idCol).as("vid"), col(gridCol).as("qa"))
    val seeds = g.orderBy(md5(col("vid").cast("string")), col("vid"))
      .limit(k).collect()
    var cents: IndexedSeq[Seq[(Int, Seq[Long])]] =
      (0 until subspaces).map { s =>
        seeds.toSeq.zipWithIndex.map { case (r, i) =>
          (i + 1, r.getSeq[Long](1).slice(s * subDims, (s + 1) * subDims))
        }
      }
    for (_ <- 1 until iters) {
      val upd = batchUpdatedFrom(g, cents, subDims).collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(5))
        .toMap
      cents = cents.zipWithIndex.map { case (cs, s) =>
        cs.map { case (cid, arr) =>
          (cid, arr.indices.map(i => upd.getOrElse((s, cid, i), arr(i))))
        }
      }
    }
    cents
  }

  /** Batched [[assignGridUnder]]: every subspace's code in one
    * projection. @return (idCol, subspace, cluster). */
  def assignGridBatch(grid: DataFrame, idCol: String, gridCol: String,
                      cents: IndexedSeq[Seq[(Int, Seq[Long])]],
                      subDims: Int): DataFrame =
    grid.select(col(idCol),
      posexplode(subClusters(col(gridCol), cents, subDims))
        .as(Seq("subspace", "cluster")))

  /** Batched final-round codebook relation (the [[kmeansQuantized]] tail
    * for every subspace at once): (subspace, cluster, dim, cq, n) in GRID
    * units, empty clusters keeping their previous centroid with n = 0. */
  def kmeansGridBatch(grid: DataFrame, idCol: String, gridCol: String,
                      k: Int, iters: Int, subspaces: Int, subDims: Int)
      : DataFrame = {
    val spark = grid.sparkSession
    import spark.implicits._
    val cents = fitGridBatch(grid, idCol, gridCol, k, iters, subspaces,
      subDims)
    val g = grid.select(col(idCol).as("vid"), col(gridCol).as("qa"))
    val prev = cents.zipWithIndex.flatMap { case (cs, s) =>
      cs.flatMap { case (cid, arr) =>
        arr.indices.map(i => (s, cid, i, arr(i)))
      }
    }.toDF("subspace", "cluster", "dim", "prev_cq")
    prev.join(batchUpdatedFrom(g, cents, subDims),
        Seq("subspace", "cluster", "dim"), "left")
      .select(col("subspace"), col("cluster"), col("dim"),
        coalesce(col("cq"), col("prev_cq")).as("cq"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
