package graft

import graft.engine.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, event_type: String, value: Double)
case class EnrichEv(ts: Timestamp, user_id: Long, value: Double)
case class Chg(key: Long, seq: Long, op: String, value: Double)
case class Doc(ts: Timestamp, doc_id: Long, text: String)

/** Structured Streaming paths driven by MemoryStream (SURVEY.md §5.4):
  * the same aggregation plan as the batch oracle query, executed as a
  * real streaming query with watermark semantics. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window aggregation over a stream matches batch semantics (O9)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingOps.streamingTumbling(mem.toDF())
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2024-01-01 10:55:00"), "click", 2.0),
        Ev(ts("2024-01-01 11:05:00"), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length == 2)
      // 10:00 window: 2 clicks, sum 3.0
      assert(rows(0).getLong(2) == 2 && rows(0).getDouble(3) == 3.0)
      // 11:00 window: 1 view, sum 4.0
      assert(rows(1).getString(1) == "view" && rows(1).getDouble(3) == 4.0)
    } finally q.stop()
  }

  test("watermark drops late data in append mode (O14 analog)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingOps.streamingTumbling(mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      mem.addData(Ev(ts("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window (+1h watermark delay)
      mem.addData(Ev(ts("2024-01-01 14:00:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is 3h behind the watermark → must be dropped
      mem.addData(Ev(ts("2024-01-01 10:30:00"), "click", 100.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 20:00:00"), "click", 1.0))
      q.processAllAvailable()
      val w10 = spark.table("late_out").filter(col("window_start") === lit(1704103200L))
      // the 10:00 window was emitted with only the on-time event
      assert(w10.count() == 1)
      assert(w10.head().getLong(2) == 1L)
    } finally q.stop()
  }

  test("sliding windows count every event exactly twice (1h/30min)") {
    val ev = graft.engine.Tables.events(spark, sf).count()
    val slid = StreamingOps.qStreamSliding(spark, sf)
    assert(slid.agg(sum("n")).head().getLong(0) == 2 * ev)
  }

  test("late-drop flags exactly the events behind the per-user high-water mark") {
    val r = StreamingOps.qStreamLateDrop(spark, sf)
    assert(r.count() == graft.engine.Tables.events(spark, sf).count())
    // the first event of every user can never be late
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
    val first = r.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(first.filter(col("is_late") === 1).count() == 0)
  }

  test("batch replay of the streaming queries matches expected shapes (§2c)") {
    val t = StreamingOps.qStreamTumbling(spark, sf)
    assert(t.columns.toSeq == Seq("window_start", "event_type", "n", "total_value"))
    assert(t.count() > 0)
    val sess = StreamingOps.qStreamSessionTtl(spark, sf)
    assert(sess.count() > 0)
    val ev = StreamingOps.qBufferEviction(spark, sf)
    // no user may retain more than 50 events
    val maxPerUser = ev.groupBy("user_id").count().agg(max("count")).head().getLong(0)
    assert(maxPerUser <= 50)
  }

  test("event-time session TTL expires idle keys and frees state (manager.go:150-184)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.StreamingOps.{SessionEvent, SessionUpdate}
    val mem = MemoryStream[SessionEvent]
    // 30-minute idle TTL on the event-time clock — deterministic:
    // the watermark only moves with data, so expiry is driven by the
    // timestamps we feed, not wall-clock sleeps.
    val out = StreamingOps.statefulSessionize(mem.toDS(), ttlMs = 30 * 60 * 1000)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("session_ttl_out")
      .start()
    try {
      mem.addData(
        SessionEvent("u1", ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent("u1", ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      // advance the watermark far past u1's 10:05 + 30min timeout
      mem.addData(SessionEvent("u2", ts("2024-01-01 12:00:00"), 5.0))
      q.processAllAvailable()
      // one more batch so the timeout (now < watermark) fires
      mem.addData(SessionEvent("u2", ts("2024-01-01 12:01:00"), 1.0))
      q.processAllAvailable()
      val expired = spark.table("session_ttl_out")
        .filter(col("expired") === true).as[SessionUpdate].collect()
      assert(expired.map(_.key).contains("u1"), s"u1 must expire, got ${expired.toSeq}")
      val u1 = expired.find(_.key == "u1").get
      assert(u1.n_events == 2 && u1.total_value == 3.0)
      // u2 is alive (its session still open)
      assert(!expired.map(_.key).contains("u2"))
    } finally q.stop()
  }

  test("streaming dedup suppresses duplicate keys across micro-batches with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingOps.streamingDedup(mem.toDF(), "event_type", "ts", "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(Ev(ts("2024-01-01 10:00:00"), "click", 1.0))
      q.processAllAvailable()
      // same key again in a later micro-batch, within the watermark
      mem.addData(Ev(ts("2024-01-01 10:10:00"), "click", 2.0),
                  Ev(ts("2024-01-01 10:20:00"), "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 2, s"expected first-occurrence-wins dedup, got ${rows.toSeq}")
      val clickVals = rows.filter(_.getString(1) == "click").map(_.getDouble(2))
      assert(clickVals.toSeq == Seq(1.0))
    } finally q.stop()
  }

  test("streaming near-dup filter drops fingerprint-identical docs across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val out = StreamingOps.streamingNearDupFilter(mem.toDF(), "ts", "text", "1 hour")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      mem.addData(Doc(ts("2024-01-01 10:00:00"), 1L,
        "alpha beta gamma delta epsilon zeta"))
      q.processAllAvailable()
      mem.addData(
        // exact copy in a later batch: identical fingerprint, dropped
        Doc(ts("2024-01-01 10:10:00"), 2L, "alpha beta gamma delta epsilon zeta"),
        // unrelated doc: new fingerprint, passes
        Doc(ts("2024-01-01 10:11:00"), 3L, "one two three four five six"))
      q.processAllAvailable()
      val kept = spark.table("neardup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 3L), s"expected 1 kept + 3 new, got ${kept.toSeq}")
    } finally q.stop()
  }

  test("checkpointed parquet sink is exactly-once across batches (fixes duckdb/sink.go duplication)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Ev]
    val q = StreamingOps.startParquetSink(
      mem.toDF(), s"$dir/data", s"$dir/ckpt", intervalMs = 100)
    try {
      mem.addData(Ev(ts("2024-01-01 10:00:00"), "a", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(ts("2024-01-01 10:01:00"), "b", 2.0))
      q.processAllAvailable()
      // reference re-persists ALL buffered batches each tick → dups;
      // checkpointed offsets must give exactly 2 rows, not 3.
      assert(spark.read.parquet(s"$dir/data").count() == 2)
    } finally q.stop()
  }

  test("stream-stream interval join matches in-window pairs, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val out = StreamingOps.streamingIntervalJoin(clicks.toDF(), purchases.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sjoin_out").start()
    try {
      clicks.addData(
        Click(1L, 100L, ts("2024-01-01 10:00:00")),
        Click(1L, 101L, ts("2024-01-01 12:00:00")))
      purchases.addData(
        Purchase(1L, 200L, ts("2024-01-01 10:20:00")),   // in window of click 100
        Purchase(1L, 201L, ts("2024-01-01 11:00:00")),   // 60 min after click 100 → out
        Purchase(2L, 202L, ts("2024-01-01 10:10:00")))   // other user → out
      q.processAllAvailable()
      // advance both watermarks so results are emitted in append mode
      // (distinct users, so the advance rows can't join each other)
      clicks.addData(Click(8L, 999L, ts("2024-01-02 00:00:00")))
      purchases.addData(Purchase(9L, 998L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val pairs = spark.table("sjoin_out")
        .select("click_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((100L, 200L)), s"expected only the 20-min pair, got $pairs")
    } finally q.stop()
  }

  test("stream-stream OUTER interval join emits unmatched clicks after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val out = StreamingOps.streamingOuterIntervalJoin(clicks.toDF(), purchases.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sojoin_out").start()
    try {
      clicks.addData(
        Click(1L, 100L, ts("2024-01-01 10:00:00")),   // will match
        Click(2L, 101L, ts("2024-01-01 10:00:00")))   // never matches
      purchases.addData(
        Purchase(1L, 200L, ts("2024-01-01 10:20:00")))
      q.processAllAvailable()
      // push both watermarks far past click 101's join horizon
      // (10:30) so the engine can prove it unmatched and emit it
      clicks.addData(Click(8L, 999L, ts("2024-01-02 00:00:00")))
      purchases.addData(Purchase(9L, 998L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sojoin_out")
        .filter(col("click_id").isin(100L, 101L))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows == Set((100L, 200L), (101L, -1L)),
        s"expected matched 100 and null-padded 101, got $rows")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join emits both unmatched sides after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val out = StreamingOps.streamingFullOuterIntervalJoin(clicks.toDF(), purchases.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fojoin_out").start()
    try {
      clicks.addData(
        Click(1L, 100L, ts("2024-01-01 10:00:00")),   // will match
        Click(2L, 101L, ts("2024-01-01 10:00:00")))   // never matches
      purchases.addData(
        Purchase(1L, 200L, ts("2024-01-01 10:20:00")),
        Purchase(3L, 201L, ts("2024-01-01 10:20:00"))) // no prior click
      q.processAllAvailable()
      // advance both watermarks past every horizon so unmatched rows
      // on BOTH sides are proven and emitted
      clicks.addData(Click(8L, 999L, ts("2024-01-02 00:00:00")))
      purchases.addData(Purchase(9L, 998L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      val rows = spark.table("fojoin_out")
        .filter(col("uid").isin(1L, 2L, 3L))
        .collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows == Set((100L, 200L), (101L, -1L), (-1L, 201L)),
        s"expected matched pair + click-only + purchase-only, got $rows")
    } finally q.stop()
  }

  test("transformWithState bounded buffer drops oldest until budget fits (O12)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[StreamingOps.BufEvent]
    val out = StreamingOps.boundedBufferTws(mem.toDS(), budgetBytes = 100L)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("buf_out").start()
    try {
      // batch 1: 3 events of 40 bytes → 120 > 100, oldest evicted
      mem.addData(
        StreamingOps.BufEvent("s1", 1L, 40L),
        StreamingOps.BufEvent("s1", 2L, 40L),
        StreamingOps.BufEvent("s1", 3L, 40L))
      q.processAllAvailable()
      // batch 2: cross-micro-batch state — 30 more bytes evicts id 2
      mem.addData(StreamingOps.BufEvent("s1", 4L, 30L))
      q.processAllAvailable()
      // single over-budget event on a fresh key is kept alone
      mem.addData(StreamingOps.BufEvent("s2", 9L, 500L))
      q.processAllAvailable()
      val rows = spark.table("buf_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      // batch 1: kept {2,3} (80 bytes), dropped 1
      assert(rows.contains(("s1", 2L, 80L, 1L, 2L, 3L)), s"got ${rows.mkString(";")}")
      // batch 2: kept {3,4} (70 bytes), dropped total 2
      assert(rows.contains(("s1", 2L, 70L, 2L, 3L, 4L)), s"got ${rows.mkString(";")}")
      // fresh key, over-budget single entry kept (reference appends unconditionally)
      assert(rows.contains(("s2", 1L, 500L, 0L, 9L, 9L)), s"got ${rows.mkString(";")}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timer closes idle sessions (O14 TTL)") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[StreamingOps.TtlEvent]
    val out = StreamingOps.sessionTtlTws(mem.toDS(), ttlMs = 60000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ttl_out").start()
    try {
      mem.addData(
        StreamingOps.TtlEvent("u1", ts("2024-01-01 10:00:00"), 1.0),
        StreamingOps.TtlEvent("u1", ts("2024-01-01 10:00:30"), 2.0))
      q.processAllAvailable()
      assert(spark.table("ttl_out").isEmpty, "session must stay open under TTL")
      // a second batch within the TTL re-arms the timer
      mem.addData(StreamingOps.TtlEvent("u1", ts("2024-01-01 10:00:50"), 4.0))
      q.processAllAvailable()
      // an event far past (10:00:50 + 60s) advances the watermark → timer fires
      mem.addData(StreamingOps.TtlEvent("u2", ts("2024-01-01 12:00:00"), 9.0))
      q.processAllAvailable()
      mem.addData(StreamingOps.TtlEvent("u2", ts("2024-01-01 12:00:01"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("ttl_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      // all three u1 events in one session, closed exactly at lastTs+ttl
      val expectClose = ts("2024-01-01 10:01:50").getTime
      assert(rows.contains(("u1", 3L, 7.0, expectClose)), s"got ${rows.mkString(";")}")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-static enrichment join aggregates per segment across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "BUILDING"), (8L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[EnrichEv]
    val out = StreamingOps.streamingEnrich(mem.toDF(), dim)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try {
      // two micro-batches: the static side is re-joined per epoch
      mem.addData(
        EnrichEv(ts("2024-01-01 10:05:00"), 7L, 1.25),
        EnrichEv(ts("2024-01-01 10:55:00"), 8L, 2.50))
      q.processAllAvailable()
      mem.addData(
        EnrichEv(ts("2024-01-01 10:59:00"), 7L, 4.00),
        EnrichEv(ts("2024-01-01 10:59:30"), 99L, 8.00)) // no dim match
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val h = ts("2024-01-01 10:00:00").getTime / 1000
      assert(rows == Set(
        (h, "BUILDING", 2L, 525L),
        (h, "MACHINERY", 1L, 250L),
        (h, "UNKNOWN", 1L, 800L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming CDC apply: foreachBatch merge is last-wins, tombstones persist") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Chg]
    val dir = java.nio.file.Files.createTempDirectory("cdc_state").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cdc_ckpt").toString
    val q = StreamingOps.cdcApply(mem.toDF(), dir, ckpt)
    try {
      mem.addData(
        Chg(1L, 1L, "insert", 1.0), Chg(2L, 1L, "insert", 2.0),
        Chg(1L, 2L, "update", 5.0))
      q.processAllAvailable()
      // epoch 2: delete key 2, insert key 3, and a LATE lower-seq
      // update for key 2 that must NOT resurrect it
      mem.addData(
        Chg(2L, 2L, "delete", 0.0), Chg(3L, 3L, "insert", 9.0),
        Chg(2L, 0L, "update", 7.0))
      q.processAllAvailable()
      val st = StreamingOps.currentCdcView(spark, dir).get.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
        .toSet
      assert(st == Set((1L, 2L, "update", 5.0), (3L, 3L, "insert", 9.0)),
        s"got $st")
      // the tombstone is still IN state (only the view filters it)
      val raw = StreamingOps.latestCdcState(spark, dir).get.collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(raw.contains((2L, "delete")), s"tombstone lost: $raw")
    } finally q.stop()
  }

  test("chained hour→day aggregation runs as one multi-stateful streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = StreamingOps.streamingChained(mem.toDF())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("chained_out").start()
    try {
      mem.addData(
        Ev(ts("2024-01-01 10:05:00"), "click", 1.0),
        Ev(ts("2024-01-01 10:55:00"), "click", 2.0),
        Ev(ts("2024-01-01 11:05:00"), "click", 4.0))
      q.processAllAvailable()
      // day 2024-01-01 is still open — nothing emitted yet
      assert(spark.table("chained_out").isEmpty)
      // push the watermark past Jan 1 (delay 1h) to finalize the day
      mem.addData(Ev(ts("2024-01-02 02:00:00"), "click", 8.0))
      q.processAllAvailable()
      val rows = spark.table("chained_out").collect()
      assert(rows.length == 1, s"expected the closed day only: ${rows.mkString(";")}")
      val r = rows.head
      assert(r.getLong(0) == ts("2024-01-01 00:00:00").getTime / 1000)
      assert(r.getLong(2) == 3L, "n_events over the day")
      assert(r.getLong(3) == 2L, "peak hour had 2 events")
      assert(r.getLong(4) == 2L, "two distinct hours")
      assert(r.getDouble(5) == 7.0)
    } finally q.stop()
  }

  test("transformWithState SpaceSaving heavy hitters: bounded state, " +
    "eviction error bounds, guarantee flags") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[StreamingOps.HhEvent]
    val out = StreamingOps.heavyHittersTws(mem.toDS(), capacity = 3, k = 2)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("hh_out").start()
    try {
      def hh(k: String, i: String) = StreamingOps.HhEvent(k, i)
      // batch 1 fits capacity exactly — counts are exact (err 0)
      mem.addData(hh("t", "a"), hh("t", "a"), hh("t", "a"),
        hh("t", "b"), hh("t", "b"), hh("t", "c"))
      q.processAllAvailable()
      // batch 2: d evicts the min counter c(1) and inherits its count
      // as error; cross-micro-batch state carries a and b
      mem.addData(hh("t", "d"), hh("t", "d"), hh("t", "d"), hh("t", "d"))
      q.processAllAvailable()
      // batch 3: c returns, evicts b(2); fresh key u stays exact
      mem.addData(hh("t", "c"), hh("t", "c"), hh("t", "c"), hh("u", "x"))
      q.processAllAvailable()
      val rows = spark.table("hh_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet
      // batch 1: exact top-2, b(2) is the runner-up cut at k
      assert(rows.contains(("t", "a", 3L, 0L, true)))
      // batch 2: d = evicted c's count 1 + 1, then +3 → (5, err 1)
      assert(rows.contains(("t", "d", 5L, 1L, true)))
      // batch 3: c = evicted b's count 2 + 1, then +2 → (5, err 2);
      // lower bound 3 exactly meets next counter a(3) → guaranteed
      assert(rows.contains(("t", "c", 5L, 2L, true)))
      assert(rows.contains(("u", "x", 1L, 0L, true)))
      // b was evicted and never re-emitted after batch 3
      assert(!rows.exists(r => r._1 == "t" && r._2 == "b" && r._3 > 2L))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

case class Click(user_id: Long, click_id: Long, click_ts: Timestamp)
case class Purchase(p_user_id: Long, purchase_id: Long, purchase_ts: Timestamp)
