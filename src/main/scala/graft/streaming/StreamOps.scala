package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Event-time windowed aggregation over the `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The same transform functions run in BATCH (verifiable against a SQL
  * oracle) and in STRUCTURED STREAMING (`readStream` + watermark): the
  * `window`/`session_window` operators are identical in both modes, which
  * is exactly how the engine should be validated — batch for correctness,
  * streaming for the incremental path.
  *
  * The reference has no streaming surface (SURVEY.md §2.11); this module is
  * the engine's extension for the `events` stream table.
  */
object StreamOps {

  /** Tumbling event-time window counts/sums per event_type. */
  def tumblingAgg(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding event-time windows (width, slide). */
  def slidingAgg(events: DataFrame, width: String = "2 hours",
                 slide: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows per user with an inactivity gap. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** JSON props extraction (events.props is a JSON string). */
  def withPropsField(events: DataFrame, field: String, as: String): DataFrame =
    events.withColumn(as, get_json_object(col("props"), s"$$.$field").cast("long"))

  /** Streaming session windows: the same `session_window` operator as the
    * batch [[sessionAgg]], watermarked so closed sessions finalize and
    * their state evicts — per-key state is the OPEN session only. */
  def streamingSessionAgg(stream: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(30,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming approximate distinct users per window (HLL sketch inside
    * a watermarked aggregation): per-window state is one KB-scale sketch
    * buffer instead of the full user-id set — the only way a distinct
    * count stays bounded on an unbounded stream. Works identically in
    * batch (spec-checked against the batch estimate). */
  def streamingApproxDistinct(stream: DataFrame, width: String = "1 hour",
                              watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), lit(12))).as("approx_users"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("approx_users"))

  /** Streaming Count-Min sketch maintenance: CMS cells are an additive
    * groupBy on a ≤ depth·width key space, so the streaming state IS the
    * sketch — bounded regardless of stream volume or item cardinality
    * (the reason a sketch, not an exact per-item count, is what a
    * 100 TB/day stream can afford to keep). Cells hash exactly like the
    * batch [[graft.ops.Sketches.countMinSketch]], so a complete-mode
    * table equals the batch sketch of everything ingested, and a
    * persisted snapshot merges with historical sketches by addition. */
  def streamingCmsCells(stream: DataFrame, itemCol: String,
                        depth: Int = 4, width: Int = 512): DataFrame = {
    val cells = array((0 until depth).map(r =>
      struct(lit(r).as("row"),
        graft.ops.Sketches.cmsBucket(col(itemCol), r, width).as("bucket"))): _*)
    stream.select(explode(cells).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Streaming per-window top-k through the bounded-heap
    * [[graft.expressions.TopKRows]] aggregate: the per-(window, type)
    * state IS the k-entry heap buffer, merged incrementally across
    * micro-batches — "largest k events per window" with O(k) state per
    * group, where a streaming ranking window is unsupported and a collect-
    * then-sort would hold every event. Ties break (score DESC, id ASC),
    * so the streamed result equals the batch aggregate exactly. */
  def streamingTopK(stream: DataFrame, scoreCol: String, idCol: String,
                    k: Int = 3, width: String = "1 hour",
                    watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(graft.expressions.TopKRows
        .topRows(col(scoreCol), col(idCol), k).as("__top"))
      .select(col("window.start").as("w_start"), col("event_type"),
        posexplode(col("__top")))
      .select(col("w_start"), col("event_type"),
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("id"), col("col.score").as("score"))

  /** Streaming variant: watermarked tumbling aggregation ready for
    * `writeStream`. Late data beyond the watermark is dropped — state stays
    * bounded, the requirement for an unbounded 100 TB/day stream. */
  def streamingTumblingAgg(stream: DataFrame, width: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Stream-stream interval join: each event joins the promo rows of the
    * same user from the preceding `lag` window. BOTH sides carry
    * watermarks and the join condition bounds event time on both ends, so
    * Spark can expire join state — the requirement for two unbounded
    * streams. Same code shape runs in batch (the correctness oracle). */
  def streamStreamJoin(events: DataFrame, promos: DataFrame,
                       watermark: String = "2 hours",
                       lag: String = "1 hour"): DataFrame = {
    val e = events.withWatermark("ts", watermark)
    val p = promos.withWatermark("p_ts", watermark)
    e.join(p, col("user_id") === col("p_user_id") &&
      col("p_ts") <= col("ts") &&
      col("p_ts") >= col("ts") - expr(s"INTERVAL $lag"))
  }

  /** Stream-stream LEFT OUTER interval join: like [[streamStreamJoin]],
    * but events with no promo in their window survive with nulls. The
    * subtle semantic: an unmatched event CANNOT be emitted on arrival (a
    * matching promo may still come), so Spark holds it in join state and
    * emits the null-padded row only once the watermark passes the end of
    * its join window — tests must advance event time on BOTH inputs to
    * flush outer results (global watermark = min over sources). */
  def streamStreamLeftOuterJoin(events: DataFrame, promos: DataFrame,
                                watermark: String = "2 hours",
                                lag: String = "1 hour"): DataFrame = {
    val e = events.withWatermark("ts", watermark)
    val p = promos.withWatermark("p_ts", watermark)
    e.join(p, col("user_id") === col("p_user_id") &&
      col("p_ts") <= col("ts") &&
      col("p_ts") >= col("ts") - expr(s"INTERVAL $lag"), "left_outer")
  }

  /** Stream-static enrichment: join each event against a STATIC (batch)
    * dimension, broadcast to every task — no streaming state at all, the
    * standard shape for attaching reference data (user profiles, price
    * lists) to an unbounded stream. The static side re-resolves per
    * micro-batch, so slowly-changing dimension files pick up updates
    * without restarting the query. */
  def streamStaticEnrich(stream: DataFrame, dim: DataFrame,
                         keyCol: String): DataFrame =
    stream.join(broadcast(dim), Seq(keyCol), "left")

  /** Streaming exact dedup — the incremental form of TextOps.exactDedup
    * for a document stream: drop rows whose normalized-content fingerprint
    * was already seen within the watermark horizon. State holds one
    * 16-byte hash per distinct document and EXPIRES with the watermark
    * (dropDuplicatesWithinWatermark), so an unbounded corpus stream runs
    * with bounded state — the requirement for continuous ingest dedup. */
  def streamingDedup(stream: DataFrame, textCol: String,
                     tsCol: String = "ts", watermark: String = "2 hours"): DataFrame =
    stream
      .withColumn("__fp", md5(lower(trim(regexp_replace(col(textCol), "\\s+", " ")))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming NEAR-duplicate dedup: drop documents whose 48-bit simhash
    * fingerprint collides with one already seen inside the watermark.
    * SimHash is computed over the DISTINCT token set, so token reorderings,
    * repetitions, and whitespace noise map to the SAME fingerprint — a
    * strictly wider net than [[streamingDedup]]'s normalized-content hash,
    * while state stays one KB-bounded entry per distinct fingerprint
    * inside the watermark (the batch-side Hamming-band search needs a
    * corpus self-join the streaming model cannot afford). */
  def streamingNearDedup(stream: DataFrame, textCol: String,
                         tsCol: String = "ts", bits: Int = 48,
                         watermark: String = "2 hours"): DataFrame =
    stream
      .withColumn("__sh", graft.text.TextOps.simhashFast(col(textCol), bits))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sh")
      .drop("__sh")

  /** Per-batch accounting row of [[corpusIngestSink]]. `gateKept` = rows
    * surviving the optional distilled-classifier gate (−1 = gate off). */
  final case class IngestCounts(batchId: Long, raw: Long, quality: Long,
                                langOk: Long, exactNew: Long, nearNew: Long,
                                gateKept: Long = -1L)

  /** EP4's STREAMING twin — the corpus build as continuous ingest: every
    * micro-batch runs the hygiene chain (the EXACT CorpusBuild stage-1/2
    * predicates: alpha-ratio + token-count quality gate, language
    * agreement), then dedups against a PERSISTENT fingerprint index —
    * exact (normalized-content md5) and near (48-bit distinct-token-set
    * simhash) — keeping the min-doc_id row per new fingerprint inside the
    * batch. Survivors append to `<dir>/docs`; their (fp, sh) pairs append
    * to `<dir>/index`; `onBatch` receives the per-stage counts (the
    * manifest CorpusBuild writes, incrementally).
    *
    * Scale shape: hygiene is a narrow map; the index carries 24 bytes per
    * KEPT document (the q_x_ingest_dedup incremental-index discipline) —
    * the anti-join is fingerprint-vs-fingerprint, never text-vs-text, and
    * its cost is bounded by the distilled corpus, not the raw stream.
    * Unlike [[streamingNearDedup]]'s watermark state (which forgets), the
    * index is the corpus itself.
    *
    * Commit protocol (foreachBatch is at-least-once, so appends alone
    * would re-admit rows on replay): docs and index rows land in
    * per-(run, batch) partition leaf directories (`ingest_run=X/
    * ingest_batch=N`) written with OVERWRITE mode — a replay of the same
    * batch recomputes the identical kept set (the pre-state index
    * excludes the batch's own rows, so a half-committed index write
    * can't anti-join the batch against itself) and rewrites the same
    * directories in place. That makes same-run replays idempotent
    * (exactly-once table contents) without a transactional format. A
    * RESTARTED query draws a fresh run token, so its batch ids (which
    * Spark restarts from the checkpoint, or from 0 for a new query)
    * never collide with directories a previous run committed; cross-run
    * dedup rides on the index as before, and half-committed leaves a
    * CRASHED run left behind are repaired at sink start by
    * [[reconcileIngestTable]] (without it, a crashed run's orphan index
    * leaf would anti-join the restarted replay away and lose the
    * batch's docs permanently). Existence checks go through the
    * path's Hadoop FileSystem, so an HDFS/S3 `tableDir` resolves
    * correctly (java.io.File would silently report absent and disable
    * cross-batch dedup).
    *
    * The optional `nbGate` is the train-once-gate-the-stream pattern:
    * a multinomial-NB quality classifier distilled OFFLINE from the LM
    * perplexity gate (NbClassifier.distill — fitted relations are
    * vocabulary/label-bounded and broadcast) scores every micro-batch
    * with one broadcast-join map pass; only 'hq' rows continue to the
    * dedup stages. That is exactly how production gates a crawl stream:
    * the expensive LM fits ONCE, the cheap distilled model rides along
    * with every executor. */
  /** Scheme-aware existence check: resolves through the path's Hadoop
    * FileSystem so HDFS/S3 table dirs work (java.io.File sees only the
    * driver's local filesystem). */
  private def dirExists(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Startup reconciliation for [[corpusIngestSink]] (single writer per
    * tableDir assumed — the streaming-query contract).
    *
    * Same-RUN replays are idempotent by construction (own-rows exclusion
    * + per-(run,batch) overwrite). A crash followed by a RESTART is the
    * case replay alone can't fix: the restarted query draws a fresh run
    * token, so a half-committed leaf from the crashed run is no longer
    * "its own rows" — a committed index leaf whose docs never landed
    * would anti-join the replayed batch away and lose those docs
    * permanently. Reconciling at sink start restores the invariant
    * "index rows == fingerprints of committed docs" before any batch
    * runs:
    *
    *  1. docs leaves without _SUCCESS (crash mid-docs-write): deleted —
    *     the replay rewrites them.
    *  2. index leaves whose matching docs leaf is missing/uncommitted
    *     (crash in the index→docs window, including after 1): deleted,
    *     so the replayed batch's fingerprints pass the anti-join and
    *     the docs are written under the new run token. Committed
    *     (index, docs) pairs are untouched — their replay dedups to an
    *     empty kept set, which is the exactly-once outcome.
    *  3. committed docs leaves without a committed index leaf (cannot
    *     arise from this writer's index-first order; covers operator
    *     surgery): index leaf rebuilt from the docs' text, restoring
    *     dedup protection instead of silently re-admitting future
    *     duplicates.
    *
    * All paths resolve through the table dir's Hadoop FileSystem, so the
    * HDFS/S3 deployment runs the same code (StreamingSpec exercises a
    * non-`file:` scheme end-to-end). Returns the reconciled leaf names
    * (relative `ingest_run=…/ingest_batch=…`) for observability. */
  private[graft] def reconcileIngestTable(
      spark: org.apache.spark.sql.SparkSession, tableDir: String)
  : Seq[String] = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tableDir)
    val fs = root.getFileSystem(conf)
    val docsDir = new Path(root, "docs")
    val idxDir = new Path(root, "index")
    def leaves(dir: Path): Map[String, Path] =
      if (!fs.exists(dir)) Map.empty
      else fs.listStatus(dir).iterator
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("ingest_run="))
        .flatMap(run => fs.listStatus(run.getPath).iterator
          .filter(s => s.isDirectory &&
            s.getPath.getName.startsWith("ingest_batch=")))
        .map(s => s"${s.getPath.getParent.getName}/${s.getPath.getName}" ->
          s.getPath)
        .toMap
    def committed(p: Path): Boolean = fs.exists(new Path(p, "_SUCCESS"))
    val docs = leaves(docsDir)
    val idx = leaves(idxDir)
    val touched = Seq.newBuilder[String]
    // 1. partial docs leaves
    docs.foreach { case (leaf, p) =>
      if (!committed(p)) { fs.delete(p, true); touched += s"docs/$leaf" }
    }
    // 2. index leaves without committed docs
    idx.foreach { case (leaf, p) =>
      val d = docs.get(leaf)
      if (!committed(p) || d.isEmpty || !committed(d.get)) {
        fs.delete(p, true); touched += s"index/$leaf"
      }
    }
    // 3. committed docs without a committed index: rebuild from text
    docs.foreach { case (leaf, p) =>
      if (committed(p) && !idx.get(leaf).exists(committed)) {
        spark.read.parquet(p.toString)
          .select(
            graft.text.TextOps.contentFingerprint(col("text")).as("fp"),
            graft.text.TextOps.simhashFast(col("text"), 48).as("sh"))
          .write.mode("overwrite").parquet(new Path(idxDir, leaf).toString)
        touched += s"index-rebuild/$leaf"
      }
    }
    touched.result()
  }

  def corpusIngestSink(stream: DataFrame, tableDir: String,
                       onBatch: IngestCounts => Unit = _ => (),
                       nbGate: Option[graft.text.NbClassifier.Model] = None)
  : DataStreamWriter[Row] = {
    // per-run token: same-run replays of a batch id overwrite their own
    // (run, batch) leaf dirs; a restarted query (fresh token) can never
    // collide with directories a previous run committed
    // leading letter keeps partition-value type inference on STRING even
    // for an all-digit token
    val runToken = "r" + java.util.UUID.randomUUID().toString.take(8)
    // a restarted query replays under a FRESH token: reconcile any
    // half-committed leaves a crashed run left behind, or the own-rows
    // exclusion below can't save the replay (see reconcileIngestTable)
    reconcileIngestTable(stream.sparkSession, tableDir)
    // compile ONCE at sink creation (a few label-bounded collects), not
    // per micro-batch: every batch then scores with the single-pass
    // broadcast form
    val compiled = nbGate.map(graft.text.NbClassifier.compile)
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, id: Long) =>
        ingestBatch(batch, id, runToken, tableDir, onBatch, compiled)
    }
  }

  /** One micro-batch of [[corpusIngestSink]], factored out so the replay
    * path (same runToken + batch id processed twice — foreachBatch's
    * at-least-once contract) is directly testable, including the
    * crash-between-index-and-docs half-commit. */
  private[graft] def ingestBatch(batch: DataFrame, id: Long,
                                 runToken: String, tableDir: String,
                                 onBatch: IngestCounts => Unit,
                                 nbGate: Option[graft.text.NbClassifier.Compiled])
  : Unit = {
        val spark = batch.sparkSession
        val docsDir = s"$tableDir/docs"
        val idxDir = s"$tableDir/index"
        val leaf = s"ingest_run=$runToken/ingest_batch=$id"
        val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        val raw = batch.persist(lvl)
        val nRaw = raw.count()
        val quality = graft.text.TextOps.qualityFeatures(raw)
          .filter(col("alpha_ratio") > 0.7 &&
            col("n_tokens").between(20, 2000))
        val langOk = quality
          .filter(graft.text.TextOps.langIdFast(col("text")) === col("lang"))
          .select(raw.columns.map(col): _*)
        val nQ = quality.count()
        val gated = nbGate.fold(langOk) { m =>
          langOk.join(
            graft.text.NbClassifier.predictCompiled(m, langOk, "doc_id", "text")
              .filter(col("pred") === "hq").select("doc_id"),
            Seq("doc_id"), "left_semi")
        }
        val fped = gated
          .withColumn("__fp", graft.text.TextOps.contentFingerprint(col("text")))
          .withColumn("__sh", graft.text.TextOps.simhashFast(col("text"), 48))
          .persist(lvl)
        val nFped = fped.count()
        // langOk is the PRE-gate language-agreement count (one extra job
        // only when the gate is on); gateKept is the post-gate count
        val nL = if (nbGate.isEmpty) nFped else langOk.count()
        val nG = if (nbGate.isEmpty) -1L else nFped
        // pre-state index: everything EXCEPT this (run, batch)'s own rows
        // — a replayed batch whose index write half-committed must not
        // anti-join against itself
        val idx =
          if (dirExists(spark, idxDir))
            spark.read.parquet(idxDir)
              .filter(!(col("ingest_run") === runToken &&
                col("ingest_batch") === id))
          else fped.select(col("__fp").as("fp"), col("__sh").as("sh")).limit(0)
        val wFp = org.apache.spark.sql.expressions.Window
          .partitionBy("__fp").orderBy("doc_id")
        val exact = fped
          .join(idx.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
          .withColumn("__rn", row_number().over(wFp))
          .filter(col("__rn") === 1).drop("__rn")
        val nE = exact.count()
        val wSh = org.apache.spark.sql.expressions.Window
          .partitionBy("__sh").orderBy("doc_id")
        val near = exact
          .join(idx.select(col("sh").as("__sh")), Seq("__sh"), "left_anti")
          .withColumn("__rn", row_number().over(wSh))
          .filter(col("__rn") === 1).drop("__rn")
          .persist(lvl)
        val nN = near.count()
        // idempotent commit: overwrite this batch's own leaf dirs (a
        // replay rewrites identical content). Index FIRST, docs second —
        // the order reconcileIngestTable assumes: same-run replays are
        // covered by the own-rows exclusion above, and a crash in the
        // index→docs window followed by a RESTART (fresh run token) is
        // repaired at sink start by deleting the orphan index leaf
        near.select(col("__fp").as("fp"), col("__sh").as("sh"))
          .write.mode("overwrite").parquet(s"$idxDir/$leaf")
        near.select(raw.columns.map(col): _*)
          .write.mode("overwrite").parquet(s"$docsDir/$leaf")
        onBatch(IngestCounts(id, nRaw, nQ, nL, nE, nN, nG))
        raw.unpersist()
        fped.unpersist()
        near.unpersist(): Unit
  }

  /** foreachBatch CDC-compaction sink: every micro-batch merges into a
    * keyed parquet table with latest-wins semantics (`tsCol` desc per
    * `keyCol`) — the incremental upsert a change-stream consumer runs
    * against a table-format store. Here the "commit" is
    * write-temp-then-swap; a real deployment swaps in a transactional
    * table format, but the merge PLAN (union + window dedup) is the
    * same. Ties on `tsCol` within a key are broken by `tieCol` desc so
    * the merge is deterministic. */
  def latestWinsSink(stream: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, tablePath: String): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // resolve through the table path's Hadoop FileSystem — the sink
        // must behave identically on file://, hdfs://, and object-store
        // schemes (previously java.io.File, i.e. local-only semantics)
        val root = new org.apache.hadoop.fs.Path(tablePath)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(root)) spark.read.parquet(tablePath)
          else batch.limit(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCol).orderBy(col(tsCol).desc, col(tieCol).desc)
        val merged = existing
          .unionByName(batch.select(existing.columns.map(col): _*))
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val tmp = new org.apache.hadoop.fs.Path(tablePath + ".tmp")
        merged.write.mode("overwrite").parquet(tmp.toString)
        fs.delete(root, true)
        require(fs.rename(tmp, root),
          s"latestWinsSink: rename $tmp -> $root failed")
    }

  /** Append-mode parquet sink that maintains the [[graft.io.Layout]]
    * per-file min/max manifest INCREMENTALLY: each micro-batch appends its
    * rows as new files, stats ONLY those files (one scan of the batch's
    * output, never the table), and appends the rows to the stats manifest
    * — the Delta/Iceberg add-file discipline on plain parquet. Every
    * `compactEvery` batches the table is small-file-compacted and the
    * manifest rebuilt (compaction invalidates per-file stats by
    * construction). A reader prunes with `Layout.prunedRead(table,
    * stats)`; its stale-stats guard means even a reader racing a
    * compaction stays correct — files missing from the manifest are read
    * unpruned.
    * `compactEvery = 0` disables compaction (append + manifest only). */
  def appendSinkWithStats(stream: DataFrame, tablePath: String,
                          statsPath: String, statCols: Seq[String],
                          compactEvery: Int = 0,
                          targetBytes: Long = 64L * 1024 * 1024): DataStreamWriter[Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Hadoop FileSystem listing (the Layout.prunedRead pattern), NOT
        // java.io.File: on HDFS/S3 a local-File listing is silently empty
        // and the sink would write data files with no stats rows — readers
        // would degrade to unpruned scans with no warning.
        def dataFiles(p: String): Set[String] = {
          import org.apache.hadoop.fs.Path
          val root = new Path(p)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(root)) Set.empty
          else {
            val it = fs.listFiles(root, true)
            val b = Set.newBuilder[String]
            while (it.hasNext) {
              val f = it.next().getPath
              if (!f.getName.startsWith("_") && !f.getName.startsWith("."))
                b += f.toString
            }
            b.result()
          }
        }
        val before = dataFiles(tablePath)
        batch.write.mode("append").parquet(tablePath)
        val added = (dataFiles(tablePath) -- before).toSeq.sorted
        if (added.nonEmpty)
          graft.io.Layout
            .fileStatsOf(spark.read.parquet(added: _*), statCols)
            .write.mode("append").parquet(statsPath)
        else if (!batch.isEmpty)
          // a non-empty batch MUST surface new files; if the listing saw
          // none, stats and data just diverged — say so instead of letting
          // reads silently degrade to unpruned scans
          System.err.println(s"[appendSinkWithStats] batch $batchId wrote " +
            s"rows to $tablePath but the listing found no new data files; " +
            "no stats rows appended (pruned reads will treat these rows " +
            "via the stale-stats guard)")
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.io.Io.compactParquet(spark, tablePath, targetBytes)
          graft.io.Layout.fileStats(spark, tablePath, statCols)
            .write.mode("overwrite").parquet(statsPath)
        }
    }

  /** Wire a streaming aggregation to an in-memory sink (demo/test). */
  def toMemorySink(df: DataFrame, queryName: String): DataStreamWriter[Row] =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())

  /** Custom keyed state via flatMapGroupsWithState: per-user running
    * totals emitted on every update (count, sum, max event time). The
    * state is O(1) per key — the pattern for arbitrary streaming state
    * the built-in window aggregations can't express. */
  case class UserRunning(n: Long, sum: Double, lastTs: java.sql.Timestamp)
  case class UserUpdate(user_id: Long, n: Long, sum_value: Double,
                        last_ts: java.sql.Timestamp)

  def runningUserTotals(events: org.apache.spark.sql.Dataset[
      (Long, java.sql.Timestamp, Double)]): org.apache.spark.sql.Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupState
    events.groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserUpdate](
        OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(
            UserRunning(0L, 0.0, new java.sql.Timestamp(0L)))
          val next = rows.foldLeft(prev) { (acc, r) =>
            UserRunning(acc.n + 1, acc.sum + r._3,
              if (r._2.after(acc.lastTs)) r._2 else acc.lastTs)
          }
          state.update(next)
          Iterator(UserUpdate(user, next.n, next.sum, next.lastTs))
      }
  }

  /** Session conf required by [[highValueCounts]]: the transformWithState
    * operator only runs on the RocksDB state store provider. */
  val RocksDbStateConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Spark 4 arbitrary-state API (`transformWithState`): a per-user
    * counter of high-value events in a `ValueState` — the modern successor
    * to flatMapGroupsWithState with typed named-state handles. State is
    * O(1) per key. TimeMode.None: no timers, so batch-style triggers
    * (AvailableNow) drain and terminate cleanly; a production deployment
    * bounding state lifetime would switch to ProcessingTime +
    * TTLConfig(ttl) — same processor, one init-arg change. */
  class HighValueCounter(threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp, Double), (Long, Long)] {
    @transient private var cnt: org.apache.spark.sql.streaming.ValueState[Long] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
      val add = rows.count(_._3 >= threshold)
      val next = (if (cnt.exists()) cnt.get() else 0L) + add
      cnt.update(next)
      Iterator((user, next))
    }
  }

  def highValueCounts(
      events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, Double)],
      threshold: Double)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new HighValueCounter(threshold),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** MapState companion to [[HighValueCounter]]: per-user event-type
    * counters held as a RocksDB MapState, so each arriving row is a
    * point update of one map entry — no deserialize-the-whole-aggregate
    * round-trip, which is what makes wide per-key profiles (thousands of
    * counters per user) viable in state. Emits (user, distinct types,
    * total events) after each batch. */
  class TypeProfiler
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), (Long, Int, Long)] {
    @transient private var m: org.apache.spark.sql.streaming.MapState[String, Long] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      m = getHandle.getMapState[String, Long]("types",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(
        user: Long, rows: Iterator[(Long, String)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Int, Long)] = {
      rows.foreach { case (_, t) =>
        m.updateValue(t, (if (m.containsKey(t)) m.getValue(t) else 0L) + 1L)
      }
      var nTypes = 0
      var total = 0L
      m.iterator().foreach { case (_, n) => nTypes += 1; total += n }
      Iterator((user, nTypes, total))
    }
  }

  def eventTypeProfile(events: org.apache.spark.sql.Dataset[(Long, String)])
      : org.apache.spark.sql.Dataset[(Long, Int, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new TypeProfiler,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
