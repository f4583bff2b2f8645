package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.StreamOps

case class Ev(ts: Timestamp, event_type: String, value: Double)
case class EvK(ts: Timestamp, event_type: String, value: Double, event_id: Long)
case class EvU(ts: Timestamp, event_type: String, user_id: Long)
case class Doc(ts: Timestamp, doc_id: Long, text: String)
case class UserEv(ts: Timestamp, user_id: Long, value: Double)
case class Promo(p_ts: Timestamp, p_user_id: Long, promo: String)
case class CorpusDoc(ts: Timestamp, doc_id: Long, text: String,
                     lang: String, source: String)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  val events = Seq(
    Ev(ts(5), "a", 1.0), Ev(ts(20), "a", 2.0), Ev(ts(65), "a", 4.0),
    Ev(ts(10), "b", 8.0), Ev(ts(130), "b", 16.0))

  test("streaming tumbling agg equals the batch tumbling agg") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(events: _*)
    val q = StreamOps.toMemorySink(
      StreamOps.streamingTumblingAgg(stream.toDF(), "1 hour", "2 hours"), "t_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_stream")
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = StreamOps.tumblingAgg(events.toDF(), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(batch.size == 4) // (h0: a×2, b×1), (h1: a×1), (h2: b×1)
  }

  test("streaming windowed top-k equals the batch heap aggregate") {
    val evs = (0 until 120).map(i =>
      EvK(ts(i), if (i % 2 == 0) "a" else "b", (i * 37 % 101).toDouble, i.toLong))
    val stream = MemoryStream[EvK](spark)
    // append mode emits each window ONCE, on finalization. Batch 1 stops
    // at minute 39 (watermark 29 — nothing finalized), batch 2 adds
    // minutes 40-119: the hour-0 groups receive rows in BOTH batches, so
    // their state heaps genuinely merge across micro-batches, and none of
    // batch 2's hour-0 rows are late (ts ≥ 40 > watermark 29).
    stream.addData(evs.filter(_.event_id < 40): _*)
    val q = StreamOps.streamingTopK(stream.toDF(), "value", "event_id",
        k = 3, watermark = "10 minutes")
      .writeStream.format("memory").queryName("t_topk")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(evs.filter(_.event_id >= 40): _*)
    q.processAllAvailable()
    // sentinel far in the future pushes the watermark past both hours so
    // their windows finalize and emit
    stream.addData(EvK(ts(240), "a", 0.0, 999L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_topk")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = StreamOps.streamingTopK(evs.toDF(), "value", "event_id", k = 3)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch && streamed.nonEmpty)
    // 2 hours × 2 types × top-3
    assert(streamed.size == 12, s"got ${streamed.size}")
  }

  test("streaming HLL distinct equals the batch sketch estimate") {
    val evs = (0 until 200).map(i =>
      EvU(ts(i % 110), if (i % 2 == 0) "a" else "b", (i % 37).toLong))
    val stream = MemoryStream[EvU](spark)
    stream.addData(evs: _*)
    val q = StreamOps.toMemorySink(
      StreamOps.streamingApproxDistinct(stream.toDF(), "1 hour", "2 hours"),
      "t_hll").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_hll")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = evs.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12)))
        .as("approx_users"))
      .select(col("window.start"), col("event_type"), col("approx_users"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session windows equal the batch session aggregation") {
    val evs = Seq(
      UserEv(ts(0), 7L, 1.0), UserEv(ts(10), 7L, 2.0),  // one session
      UserEv(ts(50), 7L, 4.0),                           // next session (40m gap)
      UserEv(ts(5), 9L, 8.0))
    val stream = MemoryStream[UserEv](spark)
    stream.addData(evs: _*)
    // session-window streaming rejects update mode; complete fits the test
    val q = StreamOps.streamingSessionAgg(stream.toDF(), "30 minutes", "2 hours")
      .writeStream.format("memory").queryName("t_sess")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val streamed = spark.table("t_sess").collect().map(key).toSet
    val batch = StreamOps.sessionAgg(evs.toDF(), "30 minutes")
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(batch.size == 3)
  }

  test("session windows merge within gap and split beyond it") {
    val sess = StreamOps.sessionAgg(
      Seq(Ev(ts(0), "u", 1), Ev(ts(10), "u", 1), Ev(ts(50), "u", 1)).toDF()
        .withColumn("user_id", lit(7L)),
      "30 minutes")
    val rows = sess.collect()
    assert(rows.length == 2)
    val first = rows.minBy(_.getAs[Timestamp]("session_start").getTime)
    assert(first.getAs[Long]("n_events") == 2)
    // session end = last event + gap
    assert(first.getAs[Timestamp]("session_end").getTime ==
      ts(10).getTime + 30 * 60 * 1000)
  }

  test("sliding windows produce width/slide copies") {
    val s = StreamOps.slidingAgg(Seq(Ev(ts(5), "a", 1.0)).toDF(), "2 hours", "1 hour")
      .collect()
    assert(s.length == 2) // event belongs to 2 overlapping windows
  }

  test("flatMapGroupsWithState keeps running per-user totals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stream = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = StreamOps.runningUserTotals(stream.toDS())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("append").start()
    stream.addData((1L, ts(0), 2.0), (1L, ts(5), 3.0), (2L, ts(1), 7.0))
    q.processAllAvailable()
    stream.addData((1L, ts(10), 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("t_state")
      .groupBy("user_id").agg(max("n").as("n"), max("sum_value").as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((3L, 10.0))) // state carried across micro-batches
    assert(rows(2L) == ((1L, 7.0)))
  }

  test("transformWithState counts high-value events per user across restarts (Spark 4 state API)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    // TimeMode.None → no timers, so AvailableNow drains the source and
    // terminates; a shared checkpoint across two start() calls proves the
    // RocksDB ValueState survives a full query restart.
    val cp = java.nio.file.Files.createTempDirectory("tws_cp").toString
    val prevProvider =
      spark.conf.getOption(StreamOps.RocksDbStateConf._1)
    spark.conf.set(StreamOps.RocksDbStateConf._1, StreamOps.RocksDbStateConf._2)
    try {
      val stream = MemoryStream[(Long, Timestamp, Double)](spark)
      // foreachBatch, not format("memory"): the memory sink refuses to
      // recover from an existing checkpoint, and recovery is the point.
      def run(): Map[Long, Long] = {
        val sink = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
        val q = StreamOps.highValueCounts(stream.toDS(), threshold = 10.0)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Long)], _: Long) =>
            batch.collect().foreach { case (u, n) => sink.merge(u, n, math.max) }
          }
          .option("checkpointLocation", cp)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        sink.asScala.toMap
      }
      stream.addData((1L, ts(0), 15.0), (1L, ts(1), 3.0), (2L, ts(2), 12.0))
      val r1 = run()
      assert(r1(1L) == 1L && r1(2L) == 1L)
      stream.addData((1L, ts(10), 20.0), (3L, ts(11), 1.0))
      val r2 = run()
      assert(r2(1L) == 2L) // ValueState carried across query restart
      assert(r2(3L) == 0L) // below threshold, still reports
      assert(!r2.contains(2L)) // update mode: untouched keys emit nothing
    } finally prevProvider match {
      case Some(p) => spark.conf.set(StreamOps.RocksDbStateConf._1, p)
      case None => spark.conf.unset(StreamOps.RocksDbStateConf._1)
    }
  }

  test("MapState per-user type profile carries point updates across restarts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val cp = java.nio.file.Files.createTempDirectory("tws_map_cp").toString
    val prevProvider = spark.conf.getOption(StreamOps.RocksDbStateConf._1)
    spark.conf.set(StreamOps.RocksDbStateConf._1, StreamOps.RocksDbStateConf._2)
    try {
      val stream = MemoryStream[(Long, String)](spark)
      def run(): Map[Long, (Int, Long)] = {
        val sink =
          new java.util.concurrent.ConcurrentHashMap[Long, (Int, Long)]()
        val q = StreamOps.eventTypeProfile(stream.toDS())
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[(Long, Int, Long)], _: Long) =>
            batch.collect().foreach { case (u, k, n) => sink.put(u, (k, n)) }
          }
          .option("checkpointLocation", cp)
          .outputMode("update").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        import scala.jdk.CollectionConverters._
        sink.asScala.toMap
      }
      stream.addData((1L, "click"), (1L, "view"), (1L, "click"), (2L, "buy"))
      val r1 = run()
      assert(r1(1L) == ((2, 3L)) && r1(2L) == ((1, 1L)))
      stream.addData((1L, "buy"), (1L, "click"))
      val r2 = run()
      assert(r2(1L) == ((3, 5L))) // map entries carried across restart
      assert(!r2.contains(2L))
    } finally prevProvider match {
      case Some(p) => spark.conf.set(StreamOps.RocksDbStateConf._1, p)
      case None => spark.conf.unset(StreamOps.RocksDbStateConf._1)
    }
  }

  test("stream-static enrichment broadcasts the dimension, no state") {
    val stream = MemoryStream[Ev](spark)
    stream.addData(events: _*)
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("event_type", "label")
    val q = StreamOps.toMemorySink(
      StreamOps.streamStaticEnrich(stream.toDF(), dim, "event_type")
        .select(col("event_type"), col("label"), col("value")), "enriched")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set(("a", "alpha", 1.0), ("a", "alpha", 2.0),
      ("a", "alpha", 4.0), ("b", "beta", 8.0), ("b", "beta", 16.0)))
  }

  test("latest-wins foreachBatch sink compacts across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("lw").toFile
    val path = new java.io.File(dir, "table").getPath
    val stream = MemoryStream[Doc](spark)
    val q = StreamOps.latestWinsSink(stream.toDF(), "doc_id", "ts", "text", path)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    stream.addData(Doc(ts(1), 1L, "v1"), Doc(ts(2), 2L, "v1"))
    q.processAllAvailable()
    stream.addData(Doc(ts(5), 1L, "v2"), Doc(ts(3), 3L, "v1"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(path)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // key 1 updated to its latest record; keys 2 and 3 kept
    assert(rows == Map(1L -> "v2", 2L -> "v1", 3L -> "v1"))
  }

  test("streaming dedup keeps one row per content across micro-batches") {
    val stream = MemoryStream[Doc](spark)
    stream.addData(
      Doc(ts(5), 1L, "the quick brown fox"),
      Doc(ts(10), 2L, "the  quick brown fox "),  // normalization dup of 1
      Doc(ts(15), 3L, "something else"))
    // NOT toMemorySink: its AvailableNow trigger ends the query after the
    // first batch, and this test feeds a second one
    val q = StreamOps.streamingDedup(stream.toDF(), "text", "ts", "2 hours")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    // second micro-batch: an exact dup of doc 3 and one new doc
    stream.addData(Doc(ts(25), 4L, "something else"), Doc(ts(30), 5L, "fresh content"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_stream").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L), s"expected first-seen docs, got $kept")
  }

  test("streaming near-dedup drops token-set duplicates the exact hash misses") {
    val stream = MemoryStream[Doc](spark)
    stream.addData(
      Doc(ts(5), 1L, "the quick brown fox"),
      // reordered + repeated tokens: same distinct-token set → same
      // simhash → dropped, though the normalized content hash differs
      Doc(ts(10), 2L, "quick the fox brown brown"),
      Doc(ts(15), 3L, "completely different text"))
    val q = StreamOps.streamingNearDedup(stream.toDF(), "text", "ts")
      .writeStream.format("memory").queryName("near_dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    stream.addData(Doc(ts(25), 4L, "fox quick brown the"), // dup of 1 again
      Doc(ts(30), 5L, "genuinely new content"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("near_dedup_stream").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 5L), s"expected near-dedup survivors, got $kept")
    // the exact-content dedup would NOT have caught doc 2 (different
    // normalized string) — pin the distinction
    val exact = graft.text.TextOps.normalizeText(lit("the quick brown fox"))
    val reord = graft.text.TextOps.normalizeText(lit("quick the fox brown brown"))
    assert(spark.range(1).select(exact === reord).head().getBoolean(0) == false)
  }

  test("the CDC sink's table survives small-file compaction") {
    val stream = MemoryStream[Doc](spark)
    val path = java.nio.file.Files.createTempDirectory("graft_cdc_compact")
      .toString + "/table"
    val q = StreamOps.latestWinsSink(stream.toDF(), "doc_id", "ts", "text", path)
      .start()
    // several micro-batches → several small-file writes
    stream.addData(Doc(ts(1), 1L, "v1"), Doc(ts(2), 2L, "v1")); q.processAllAvailable()
    stream.addData(Doc(ts(5), 1L, "v2")); q.processAllAvailable()
    stream.addData(Doc(ts(7), 3L, "v1")); q.processAllAvailable()
    q.stop()
    val before = spark.read.parquet(path)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val (nb, na) = graft.io.Io.compactParquet(spark, path)
    assert(na <= nb)
    val after = spark.read.parquet(path)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(after == before && after == Map(1L -> "v2", 2L -> "v1", 3L -> "v1"))
  }

  test("stream-stream interval join matches the batch join") {
    val evs = Seq(
      UserEv(ts(30), 1L, 10.0), UserEv(ts(90), 1L, 20.0),
      UserEv(ts(95), 2L, 30.0), UserEv(ts(200), 1L, 40.0))
    val promos = Seq(
      Promo(ts(10), 1L, "a"),   // within 1h of ev@30 and ev@90? 90-10=80min > 60 → only ev@30
      Promo(ts(60), 1L, "b"),   // within 1h of ev@90
      Promo(ts(94), 2L, "c"),   // within 1h of ev@95
      Promo(ts(300), 1L, "d"))  // after every user-1 event → no match
    val es = MemoryStream[UserEv](spark); es.addData(evs: _*)
    val ps = MemoryStream[Promo](spark); ps.addData(promos: _*)
    val q = StreamOps.streamStreamJoin(es.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ss_join")
      .select("user_id", "value", "promo").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val batch = StreamOps.streamStreamJoin(evs.toDF(), promos.toDF())
      .select("user_id", "value", "promo").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(batch == Set((1L, 10.0, "a"), (2L, 30.0, "c"), (1L, 20.0, "b")))
  }

  test("left-outer stream-stream join emits null rows only after watermark") {
    val evs = Seq(
      UserEv(ts(30), 1L, 10.0), UserEv(ts(90), 1L, 20.0),
      UserEv(ts(95), 2L, 30.0), UserEv(ts(200), 1L, 40.0),
      UserEv(ts(50), 3L, 35.0)) // user 3 has no promos at all
    val promos = Seq(
      Promo(ts(10), 1L, "a"), Promo(ts(60), 1L, "b"),
      Promo(ts(94), 2L, "c"), Promo(ts(300), 1L, "d"))
    val es = MemoryStream[UserEv](spark); es.addData(evs: _*)
    val ps = MemoryStream[Promo](spark); ps.addData(promos: _*)
    val q = StreamOps.streamStreamLeftOuterJoin(es.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("ss_louter")
      .outputMode("append").start()
    q.processAllAvailable()
    def rows() = spark.table("ss_louter")
      .filter(col("user_id") =!= 99L)
      .select("user_id", "value", "promo").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    // After the first drain the watermark sits at min(max ts, max p_ts) −
    // 2 h = 80 min: user 3's unmatched row (ts = 50) is already flushed,
    // but the unmatched event at ts = 200 must still be HELD in state —
    // a matching promo could yet arrive inside its window.
    assert(rows() == Set(
      (1L, 10.0, Some("a")), (1L, 20.0, Some("b")), (2L, 30.0, Some("c")),
      (3L, 35.0, None)),
      s"unexpected pre-watermark emission: ${rows()}")
    // advance event time on BOTH inputs (global watermark = min of them)
    es.addData(UserEv(ts(600), 99L, 0.0))
    ps.addData(Promo(ts(600), 99L, "z"))
    q.processAllAvailable()
    q.stop()
    val expected = Set(
      (1L, 10.0, Some("a")), (1L, 20.0, Some("b")), (2L, 30.0, Some("c")),
      (1L, 40.0, None),  // promo d arrives after the event → no match
      (3L, 35.0, None))  // user with no promos
    assert(rows() == expected)
  }

  test("stateful aggregation recovers from a checkpoint across restarts") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toFile.getPath
    val outDir = java.nio.file.Files.createTempDirectory("ckpt_out").toFile.getPath
    val stream = MemoryStream[Ev](spark)
    // memory sink refuses checkpoint recovery; foreachBatch supports it
    def start() = StreamOps.streamingTumblingAgg(stream.toDF(), "1 hour", "2 hours")
      .select(col("window.start").as("w"), col("event_type"), col("n"), col("sum_value"))
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", ckpt)
      .start()
    stream.addData(Ev(ts(5), "a", 1.0), Ev(ts(20), "a", 2.0))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // simulated failure/redeploy: same checkpoint, new query
    stream.addData(Ev(ts(30), "a", 4.0), Ev(ts(70), "b", 8.0))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // hour-0 'a' must aggregate ACROSS the restart (1+2 before, +4 after)
    // update mode re-emits a key per batch; n grows monotonically, so the
    // latest state per key is the max-n row
    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getAs[java.sql.Timestamp]("w"), r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
    assert(rows(ts(0) -> "a") == ((3L, 7.0)), s"state lost across restart: $rows")
    assert(rows(ts(60) -> "b") == ((1L, 8.0)))
  }

  test("salted aggregation and join match their unsalted results") {
    import graft.ops.Skew
    val df = (1 to 500).map(i => (if (i <= 400) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val salted = Skew.saltedCount(df, "k", "v", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted("hot") == 400 && salted("k500") == 1)

    val dim = Seq(("hot", "H"), ("k500", "X")).toDF("k", "label")
    val joined = Skew.saltedJoin(df, dim, "k", "v", 8)
    assert(joined.count() == 401)
    assert(joined.columns.toSeq.sorted == Seq("k", "label", "v"))
  }

  test("salted ops spread null salt-source rows and reject reserved columns") {
    import graft.ops.Skew
    // all-null salt source: crc32(null) is null — without the fallback
    // every row of the hot key would land on ONE reducer; the result must
    // still be exact either way
    val nulls = (1 to 300).map(i => ("hot", null: String, i.toLong))
      .toDF("k", "src", "v")
    val agg = Skew.saltedAgg(nulls, "k", "v", "src", 8).collect()
    assert(agg.length == 1)
    assert(agg(0).getAs[Long]("n") == 300)
    assert(agg(0).getAs[Double]("sum_value") == (1 to 300).sum.toDouble)
    // and the salt expression actually spreads those rows across salts
    val spread = nulls
      .select(org.apache.spark.sql.functions.expr(
        "pmod(coalesce(crc32(cast(src as string)), monotonically_increasing_id()), 8)")
        .as("s"))
      .distinct().count()
    assert(spread > 1, "null-source rows should spread over multiple salts")

    // reserved working columns are refused loudly, not silently clobbered
    val clash = Seq(("a", 1L, 0)).toDF("k", "v", "__salt")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedCount(clash, "k", "v", 8)
    }
    assert(e.getMessage.contains("__salt"))
  }

  test("parquet table replays as a file-source stream; agg matches batch") {
    // the events table itself, replayed through readStream with a watermark
    val sfDir = "/root/testdata/sf0.001"
    val batchDf = graft.core.Tables(spark, sfDir, "events")
    // the file-stream source wants a directory: stage the table file
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))
    val stream = graft.core.Tables.normalizeTs(spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .parquet(dir.toString))
    val q = StreamOps.toMemorySink(
      StreamOps.streamingTumblingAgg(stream, "1 hour", "2 hours"), "t_file")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_file")
      .select(col("window.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = StreamOps.tumblingAgg(batchDf, "1 hour")
      .select(col("w_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming corpus ingest: hygiene + persistent-index dedup " +
    "equals the batch chain; index survives restart") {
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    def doc(id: Long, text: String, lang: String = "en") =
      CorpusDoc(ts(id.toInt), id, text, lang, "s")
    val b1 = Seq(
      doc(1, s"$base alpha"),
      doc(2, "zzz 123 !!!"), // fails the quality gate
      doc(3, s"$base bravo", lang = "de")) // fails language agreement
    val b2 = Seq(
      doc(4, s"$base alpha"), // exact dup of 1 (cross-batch, via index)
      doc(5, ("alpha " + base).trim), // reordered tokens: near dup of 1
      doc(6, s"$base delta"))
    val b3 = Seq(
      doc(7, s"$base delta"), // exact dup of 6
      doc(8, s"$base echo"),
      doc(9, s"$base fox trot"), doc(10, s"$base fox trot")) // in-batch dup
    val dir = java.nio.file.Files.createTempDirectory("corpus-ingest").toString
    val counts = scala.collection.mutable.ArrayBuffer[StreamOps.IngestCounts]()
    val stream = MemoryStream[CorpusDoc](spark)
    val q = StreamOps.corpusIngestSink(stream.toDF(), dir, counts += _)
      .start()
    Seq(b1, b2, b3).foreach { b =>
      stream.addData(b: _*); q.processAllAvailable()
    }
    q.stop()
    val keptIds = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().toSet
    // the batch-global twin: same predicates, keep-min per fingerprint
    val all = (b1 ++ b2 ++ b3).toDF()
    val hygiene = graft.text.TextOps.qualityFeatures(all)
      .filter(col("alpha_ratio") > 0.7 && col("n_tokens").between(20, 2000))
      .filter(graft.text.TextOps.langIdFast(col("text")) === col("lang"))
      .withColumn("__fp", graft.text.TextOps.contentFingerprint(col("text")))
      .withColumn("__sh", graft.text.TextOps.simhashFast(col("text"), 48))
    import org.apache.spark.sql.expressions.Window
    val exact = hygiene.withColumn("__rn",
        row_number().over(Window.partitionBy("__fp").orderBy("doc_id")))
      .filter(col("__rn") === 1).drop("__rn")
    val near = exact.withColumn("__rn",
        row_number().over(Window.partitionBy("__sh").orderBy("doc_id")))
      .filter(col("__rn") === 1)
    val wantIds = near.select("doc_id").as[Long].collect().toSet
    assert(keptIds == wantIds)
    assert(keptIds == Set(1L, 6L, 8L, 9L))
    // stage accounting: batch 2 loses one doc to the exact index and one
    // to the near index
    val c2 = counts(1)
    assert((c2.raw, c2.quality, c2.langOk, c2.exactNew, c2.nearNew)
      == ((3L, 3L, 3L, 2L, 1L)))
    // restart: a NEW query against the same dir still drops d1's dup —
    // the index IS the state, no watermark amnesia
    val stream2 = MemoryStream[CorpusDoc](spark)
    val q2 = StreamOps.corpusIngestSink(stream2.toDF(), dir, counts += _)
      .start()
    stream2.addData(doc(11, s"$base alpha"), doc(12, s"$base golf"))
    q2.processAllAvailable()
    q2.stop()
    val after = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().toSet
    assert(after == Set(1L, 6L, 8L, 9L, 12L))
  }

  test("streaming corpus ingest with a distilled NB gate: train once, " +
    "gate the stream") {
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    // pure-alpha junk: PASSES the alpha-ratio + token-count + lang-ID
    // rule gates (the original zz9-style fixture failed alpha-ratio, so
    // the NB gate was never actually exercised), fails only the NB gate
    val junkWords = "the zzq the qxv the vvj the kkz the zzq the qxv " +
      "the vvj the kkz the zzq the qxv the vvj the kkz the zzq the qxv"
    // offline distillation corpus: planted hq/lq labels
    val train = (
      (0 until 6).map(i => (i.toLong, s"$base variant$i", "hq")) ++
        (0 until 6).map(i => (100L + i, s"$junkWords junk$i", "lq")))
      .toDF("doc_id", "text", "gate_label")
    val m = graft.text.NbClassifier.fit(train, "doc_id", "text", "gate_label")
    // the stream: 2 prose docs, 2 junk-wordy docs (all pass the RULE
    // gates — junk carries enough 'the' to lang-ID as en)
    def doc(id: Long, text: String) = CorpusDoc(ts(id.toInt), id, text, "en", "s")
    val docs = Seq(doc(1, s"$base alpha"), doc(2, s"$junkWords beta"),
      doc(3, s"$base gamma"), doc(4, s"$junkWords delta"))
    val dir = java.nio.file.Files.createTempDirectory("corpus-nb").toString
    val counts = scala.collection.mutable.ArrayBuffer[StreamOps.IngestCounts]()
    val stream = MemoryStream[CorpusDoc](spark)
    val q = StreamOps.corpusIngestSink(stream.toDF(), dir, counts += _,
      nbGate = Some(m)).start()
    stream.addData(docs: _*); q.processAllAvailable(); q.stop()
    val kept = spark.read.parquet(s"$dir/docs")
      .select("doc_id").as[Long].collect().toSet
    // the gate must pass exactly what the batch classifier calls hq
    val want = graft.text.NbClassifier
      .predict(m, docs.toDF(), "doc_id", "text")
      .filter(col("pred") === "hq").select("doc_id").as[Long]
      .collect().toSet
    assert(kept == want)
    assert(kept == Set(1L, 3L), s"kept $kept")
    // langOk is the PRE-gate language-agreement count (all 4 docs pass
    // the rule gates); gateKept is what the NB gate then admits
    assert(counts.head.gateKept == 2L && counts.head.langOk == 4L)
  }

  test("corpus ingest replay is idempotent: re-running a batch — even " +
    "after a crash that committed the index but not the docs — yields " +
    "exactly-once corpus rows") {
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    def doc(id: Long, text: String) = CorpusDoc(ts(id.toInt), id, text, "en", "s")
    val dir = java.nio.file.Files.createTempDirectory("corpus-replay").toString
    val counts = scala.collection.mutable.ArrayBuffer[StreamOps.IngestCounts]()
    def snapshot() = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch 0 commits normally
    val b0 = Seq(doc(1, s"$base alpha"), doc(2, s"$base bravo")).toDF()
    StreamOps.ingestBatch(b0, 0L, "rTESTRUN", dir, counts += _, None)
    assert(snapshot() == Map(1L -> 1L, 2L -> 1L))
    // at-least-once: the SAME batch id replays (e.g. foreachBatch retry
    // after a sink-side failure) — contents must be unchanged, not doubled
    StreamOps.ingestBatch(b0, 0L, "rTESTRUN", dir, counts += _, None)
    assert(snapshot() == Map(1L -> 1L, 2L -> 1L))
    // crash-between-writes: batch 1's INDEX leaf committed but its docs
    // leaf lost (the index-write-then-crash window). Simulate by running
    // batch 1 fully, deleting its docs leaf, then replaying it.
    val b1 = Seq(doc(3, s"$base alpha"), // exact dup of 1 via the index
      doc(4, s"$base charlie")).toDF()
    StreamOps.ingestBatch(b1, 1L, "rTESTRUN", dir, counts += _, None)
    assert(snapshot() == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$dir/docs/ingest_run=rTESTRUN/ingest_batch=1"))
    // replay: the pre-state index must exclude batch 1's own rows, so
    // doc 4 is re-admitted (not anti-joined against its own fingerprint)
    // and doc 3 still dedups against batch 0 — exactly-once restored
    StreamOps.ingestBatch(b1, 1L, "rTESTRUN", dir, counts += _, None)
    assert(snapshot() == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
    // a LATER batch still sees the whole index (cross-batch dedup intact)
    val b2 = Seq(doc(5, s"$base charlie"), doc(6, s"$base delta")).toDF()
    StreamOps.ingestBatch(b2, 2L, "rTESTRUN", dir, counts += _, None)
    assert(snapshot() == Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 6L -> 1L))
  }

  test("crash + RESTART (fresh run token): orphan index leaf is " +
    "reconciled at sink start, docs land exactly once") {
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    def doc(id: Long, text: String) = CorpusDoc(ts(id.toInt), id, text, "en", "s")
    val dir = java.nio.file.Files.createTempDirectory("corpus-restart").toString
    def docIds() = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // run 1, batch 0 commits normally
    StreamOps.ingestBatch(Seq(doc(1, s"$base alpha")).toDF(), 0L, "rRUN1",
      dir, _ => (), None)
    // run 1, batch 1: index committed, then CRASH before the docs write
    val b1 = Seq(doc(2, s"$base alpha"), // dup of 1 via the index
      doc(3, s"$base bravo")).toDF()
    StreamOps.ingestBatch(b1, 1L, "rRUN1", dir, _ => (), None)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$dir/docs/ingest_run=rRUN1/ingest_batch=1"))
    assert(docIds() == Map(1L -> 1L)) // doc 3 lost on disk, fp orphaned
    // RESTART: a fresh sink (fresh token). Without reconciliation the
    // orphan (rRUN1, 1) index leaf anti-joins doc 3 away forever — the
    // round-11 ADVICE finding. Sink creation must repair it.
    val stream = MemoryStream[CorpusDoc](spark)
    val q = StreamOps.corpusIngestSink(stream.toDF(), dir).start()
    stream.addData(doc(2, s"$base alpha"), doc(3, s"$base bravo"))
    q.processAllAvailable(); q.stop()
    assert(docIds() == Map(1L -> 1L, 3L -> 1L), s"got ${docIds()}")
    // and the recovered doc is index-protected again for later batches
    StreamOps.ingestBatch(Seq(doc(4, s"$base bravo")).toDF(), 7L, "rRUN3",
      dir, _ => (), None)
    assert(docIds() == Map(1L -> 1L, 3L -> 1L))
  }

  test("reconcileIngestTable: partial leaves deleted, missing index " +
    "rebuilt from committed docs") {
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    def doc(id: Long, text: String) = CorpusDoc(ts(id.toInt), id, text, "en", "s")
    val dir = java.nio.file.Files.createTempDirectory("corpus-reconcile").toString
    StreamOps.ingestBatch(Seq(doc(1, s"$base alpha")).toDF(), 0L, "rA",
      dir, _ => (), None)
    StreamOps.ingestBatch(Seq(doc(2, s"$base bravo")).toDF(), 1L, "rA",
      dir, _ => (), None)
    val leaf0 = "ingest_run=rA/ingest_batch=0"
    val leaf1 = "ingest_run=rA/ingest_batch=1"
    // batch 0: docs leaf loses its _SUCCESS (crash mid-docs-write) →
    // both its partial docs and its index leaf must go
    new java.io.File(s"$dir/docs/$leaf0/_SUCCESS").delete()
    // batch 1: index leaf vanishes (operator surgery) → rebuilt from docs
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$dir/index/$leaf1"))
    val touched = StreamOps.reconcileIngestTable(spark, dir)
    assert(touched.toSet ==
      Set(s"docs/$leaf0", s"index/$leaf0", s"index-rebuild/$leaf1"))
    assert(!new java.io.File(s"$dir/docs/$leaf0").exists())
    assert(!new java.io.File(s"$dir/index/$leaf0").exists())
    val rebuilt = spark.read.parquet(s"$dir/index/$leaf1")
    assert(rebuilt.columns.sorted.toSeq == Seq("fp", "sh"))
    val expect = Seq(doc(2, s"$base bravo")).toDF()
      .select(graft.text.TextOps.contentFingerprint(col("text")).as("fp"),
        graft.text.TextOps.simhashFast(col("text"), 48).as("sh"))
    assert(rebuilt.collect().toSeq == expect.collect().toSeq)
    // a clean table reconciles to nothing
    assert(StreamOps.reconcileIngestTable(spark, dir).isEmpty)
  }

  test("corpus ingest against a non-file:// FileSystem scheme (graftfs) " +
    "— commit, dedup, crash replay, and reconciliation all resolve " +
    "through the Hadoop FS") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    def doc(id: Long, text: String) = CorpusDoc(ts(id.toInt), id, text, "en", "s")
    val local = java.nio.file.Files.createTempDirectory("corpus-graftfs")
    val dir = "graftfs://" + local.toString
    def docIds() = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    StreamOps.ingestBatch(Seq(doc(1, s"$base alpha")).toDF(), 0L, "rFS1",
      dir, _ => (), None)
    assert(docIds() == Map(1L -> 1L))
    // same-run replay: idempotent through the FS scheme
    StreamOps.ingestBatch(Seq(doc(1, s"$base alpha")).toDF(), 0L, "rFS1",
      dir, _ => (), None)
    assert(docIds() == Map(1L -> 1L))
    // crash in the index→docs window, then a fresh-token replay after
    // reconciliation — the full restart path, on the non-file scheme
    StreamOps.ingestBatch(
      Seq(doc(2, s"$base alpha"), doc(3, s"$base charlie")).toDF(),
      1L, "rFS1", dir, _ => (), None)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$local/docs/ingest_run=rFS1/ingest_batch=1"))
    val touched = StreamOps.reconcileIngestTable(spark, dir)
    assert(touched == Seq("index/ingest_run=rFS1/ingest_batch=1"))
    StreamOps.ingestBatch(
      Seq(doc(2, s"$base alpha"), doc(3, s"$base charlie")).toDF(),
      0L, "rFS2", dir, _ => (), None)
    assert(docIds() == Map(1L -> 1L, 3L -> 1L), s"got ${docIds()}")
  }

  test("corpus ingest on OBJECT-STORE semantics (graftobj): copy+delete " +
    "renames inside every parquet commit, listing-after-write delay " +
    "never deletes committed docs") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftobj.impl", classOf[GraftObjectStoreFs].getName)
    GraftObjectStoreFs.settle()
    val base = "the quick brown fox and the lazy dog run to the old mill " +
      "of the green valley and they rest in the warm sun for a while"
    def doc(id: Long, text: String) = CorpusDoc(ts(id.toInt), id, text, "en", "s")
    val local = java.nio.file.Files.createTempDirectory("corpus-objstore")
    val dir = "graftobj://" + local.toString
    def docIds() = spark.read.parquet(s"$dir/docs")
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the parquet committer renames task files on commit — all of them
    // now run as copy+delete; the ingest protocol must not care
    StreamOps.ingestBatch(Seq(doc(1, s"$base alpha")).toDF(), 0L, "rOS1",
      dir, _ => (), None)
    StreamOps.ingestBatch(Seq(doc(1, s"$base alpha")).toDF(), 0L, "rOS1",
      dir, _ => (), None) // same-run replay: still idempotent
    assert(docIds() == Map(1L -> 1L))
    // batch 2 lands while the store's LISTINGS lag its writes (point
    // GETs — exists/_SUCCESS checks — stay consistent, the modern-S3
    // split). Reconciliation keyed on listings may do wasted work, but
    // the one irreversible act — deleting COMMITTED docs — must never
    // happen, because commit checks go through exists(), not listings.
    GraftObjectStoreFs.hideNewFiles = true
    StreamOps.ingestBatch(
      Seq(doc(2, s"$base bravo")).toDF(), 1L, "rOS1", dir, _ => (), None)
    StreamOps.reconcileIngestTable(spark, dir): Unit
    GraftObjectStoreFs.settle()
    // after the store settles: both committed docs present exactly once
    // (a reconcile pass under lag may have rebuilt an index leaf, never
    // dropped docs), and a fresh reconcile is a no-op
    assert(StreamOps.reconcileIngestTable(spark, dir).isEmpty)
    assert(docIds() == Map(1L -> 1L, 2L -> 1L), s"got ${docIds()}")
    // dedup against the settled index still holds on this scheme
    StreamOps.ingestBatch(
      Seq(doc(3, s"$base alpha"), doc(4, s"$base charlie")).toDF(),
      0L, "rOS2", dir, _ => (), None)
    assert(docIds() == Map(1L -> 1L, 2L -> 1L, 4L -> 1L), s"got ${docIds()}")
  }

  test("latest-wins CDC sink commits through the object-store scheme") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftobj.impl", classOf[GraftObjectStoreFs].getName)
    GraftObjectStoreFs.settle()
    val local = java.nio.file.Files.createTempDirectory("lw-objstore")
    val path = "graftobj://" + local.toString + "/table"
    val stream = MemoryStream[Doc](spark)
    val q = StreamOps.latestWinsSink(stream.toDF(), "doc_id", "ts", "text", path)
      .start()
    stream.addData(Doc(ts(1), 1L, "v1"), Doc(ts(2), 2L, "v1"))
    q.processAllAvailable()
    stream.addData(Doc(ts(5), 1L, "v2"), Doc(ts(3), 3L, "v1"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(path)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows == Map(1L -> "v2", 2L -> "v1", 3L -> "v1"))
  }

  test("props JSON extraction") {
    val df = Seq(("""{"k": 42}""", "a")).toDF("props", "event_type")
    val k = StreamOps.withPropsField(df, "k", "k").head.getAs[Long]("k")
    assert(k == 42L)
  }

  test("streaming CMS cells equal the batch sketch across micro-batches") {
    val stream = MemoryStream[EvU](spark)
    val q = StreamOps.streamingCmsCells(stream.toDF(), "user_id",
        depth = 2, width = 32)
      .writeStream.format("memory").queryName("t_cms")
      .outputMode("complete")
      .start()
    val batch1 = (1 to 40).map(i => EvU(ts(i), "a", (i % 7).toLong))
    val batch2 = (1 to 25).map(i => EvU(ts(100 + i), "b", (i % 5).toLong))
    stream.addData(batch1: _*)
    q.processAllAvailable()
    stream.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_cms")
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val batch = graft.ops.Sketches.countMinSketch(
        (batch1 ++ batch2).toDF(), "user_id", depth = 2, width = 32)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed == batch && batch.nonEmpty)
    // bounded state: cells never exceed depth × width no matter the volume
    assert(streamed.size <= 2 * 32)
  }

  test("appendSinkWithStats maintains a pruning manifest across micro-batches") {
    import graft.io.Layout
    val table = java.nio.file.Files.createTempDirectory("sink_t").toString + "/t"
    val stats = java.nio.file.Files.createTempDirectory("sink_s").toString + "/s"
    val stream = MemoryStream[(Long, Double)](spark)
    val q = StreamOps.appendSinkWithStats(
        stream.toDF().toDF("event_id", "value"),
        table, stats, Seq("event_id")).start()
    // four micro-batches with DISJOINT event_id ranges — each batch's
    // files carry a tight [min,max] envelope
    def run(lo: Long): Unit = {
      stream.addData((lo until lo + 100).map(i => (i, i * 0.5)))
      q.processAllAvailable()
    }
    run(0); run(100); run(200); run(300)
    q.stop()
    val statsDf = spark.read.parquet(stats)
    val full = spark.read.parquet(table)
    // one manifest row per data file, written incrementally (no full-table
    // stats pass ever ran)
    val nFiles = full.select(input_file_name()).distinct().count()
    assert(statsDf.count() == nFiles, s"manifest ${statsDf.count()} != files $nFiles")
    assert(full.count() == 400)
    // pruning: a probe inside batches 2-3's range opens only their files
    val pruned = Layout.prunedRead(spark, table, statsDf, "event_id", 150, 250)
    val expect = full.filter(col("event_id").between(150, 250))
    assert(pruned.count() == expect.count())
    assert(pruned.agg(sum("value")).head.getDouble(0) ==
      expect.agg(sum("value")).head.getDouble(0))
    val touched = pruned.select(input_file_name()).distinct().count()
    val batch12Files = full.filter(col("event_id").between(100, 299))
      .select(input_file_name()).distinct().count()
    assert(touched <= batch12Files && touched < nFiles,
      s"pruning must skip non-matching batches: touched $touched of $nFiles")
  }

  test("appendSinkWithStats compaction rebuilds the manifest consistently") {
    import graft.io.Layout
    val table = java.nio.file.Files.createTempDirectory("sinkc_t").toString + "/t"
    val stats = java.nio.file.Files.createTempDirectory("sinkc_s").toString + "/s"
    val stream = MemoryStream[(Long, Double)](spark)
    val q = StreamOps.appendSinkWithStats(
        stream.toDF().toDF("event_id", "value"),
        table, stats, Seq("event_id"), compactEvery = 2).start()
    (0 until 4).foreach { b =>
      stream.addData((b * 100L until b * 100L + 100).map(i => (i, 1.0)))
      q.processAllAvailable()
    }
    q.stop()
    // after the batch-4 compaction the manifest describes exactly the
    // live files, and pruned reads still reconcile with the full scan
    val full = spark.read.parquet(table)
    assert(full.count() == 400)
    val statsDf = spark.read.parquet(stats)
    val live = full.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    val listed = statsDf.select("file").collect().map(_.getString(0)).toSet
    assert(listed == live, "post-compaction manifest must match live files")
    val pruned = Layout.prunedRead(spark, table, statsDf, "event_id", 50, 149)
    assert(pruned.count() == full.filter(col("event_id").between(50, 149)).count())
  }
}
