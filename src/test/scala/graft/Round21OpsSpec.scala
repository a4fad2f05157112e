package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{DeltaIndex, GraftMetricsListener, IngestMetrics, IngestWriters, MetricsHttpServer, StreamStore, TextOps}
import graft.sources.GraftStoreRegistry

/** Round-21 hardening of the streaming-ingest product API for
  * LONG-LIVED operation: mid-stream DeltaIndex compaction (bounded
  * per-epoch plan depth), crash-atomic compaction recovery, the
  * single-writer-per-index guard, per-topic Prometheus ingest
  * counters, and the TTL-expiry × resuming-query contract. */
class Round21OpsSpec extends SparkSuite {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Family-disjoint text (see Round20OpsSpec): two families share no
    * 3-gram shingle, so dup statuses are by construction. */
  private def text(fam: String): String =
    (0 until 8).map(i => s"${fam}tok$i").mkString(" ")

  private def df(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows.toList), docSchema)

  private def stage(path: String, fams: Seq[String]): Unit =
    TextOps.stageNeardupIndex(
      df(fams.zipWithIndex.map { case (f, i) => Row(i.toLong, text(f)) }), path)

  test("mid-stream auto-compaction: a long-lived ingest stream folds committed deltas, bounds plan depth, and keeps every admission") {
    val dir = java.nio.file.Files.createTempDirectory("graft_autocompact")
    val idx = dir.resolve("ac_idx").toString
    val twinIdx = dir.resolve("ac_twin_idx").toString
    stage(idx, Seq("e0", "e1"))
    stage(twinIdx, Seq("e0", "e1"))
    // six 2-doc batches: a fresh base f<i> plus a copy of the PREVIOUS
    // batch's base — every epoch probes an ADMITTED delta, so folding
    // a delta that loses an admission would flip a later verdict
    val batches = (0 until 6).map { i =>
      val dup = if (i == 0) text("e0") else text(s"f${i - 1}")
      Seq(Row(100L + i * 10, dup), Row(101L + i * 10, text(s"f$i")))
    }
    def run(index: String, ckpt: String, store: String,
            compactEvery: Int): Map[Long, Map[Long, String]] = {
      val st = new StreamStore(1 << 20, Long.MaxValue / 2)
      batches.foreach(b => st.append("docs", docSchema, b))
      GraftStoreRegistry.register(store, st)
      val perEpoch = TrieMap.empty[Long, Map[Long, String]]
      val q = TextOps.startNeardupIngest(spark, store, "docs", index,
        maxBatchesPerTrigger = 1, checkpointDir = dir.resolve(ckpt).toString,
        onEpoch = (e, c) => {
          perEpoch.put(e, c.collect().map(r =>
            r.getLong(0) -> r.getString(1)).toMap)
          ()
        }, compactEvery = compactEvery)
      try q.processAllAvailable() finally q.stop()
      GraftStoreRegistry.unregister(store)
      perEpoch.toMap
    }
    val compacted = run(idx, "ac_ckpt", "s_ac", compactEvery = 2)
    val plain = run(twinIdx, "ac_twin_ckpt", "s_ac_twin", compactEvery = 0)
    // verdicts are IDENTICAL with and without mid-stream compaction
    assert(compacted == plain,
      s"compaction must not change any verdict:\n$compacted\nvs\n$plain")
    val expected = (0 until 6).map { i =>
      i.toLong -> Map(100L + i * 10 -> "dup_of_existing",
        101L + i * 10 -> "unique")
    }.toMap
    assert(compacted == expected, s"classification drifted: $compacted")
    // the delta namespace COLLAPSED mid-stream: folds fired at epochs
    // 2 (e0,e1) and 4 (e2,e3), leaving exactly e4 and e5 outstanding —
    // the un-compacted twin holds all six
    assert(DeltaIndex.outstanding(spark, idx) == 2,
      s"expected 2 outstanding deltas, got ${DeltaIndex.outstanding(spark, idx)}")
    assert(DeltaIndex.outstanding(spark, twinIdx) == 6)
    // snapshot-isolated retirement: the SECOND fold (epoch 4, -> v2)
    // physically deleted the FIRST generation's folded deltas (e0, e1)
    // and tombstoned its own (e2, e3 — files still on disk for
    // in-flight plans, excluded from every listing); e4, e5 are live
    (0 until 2).foreach(e => assert(
      !new java.io.File(s"${idx}_delta/e$e").exists,
      s"e$e (folded two generations ago) must be deleted"))
    (2 until 4).foreach(e => assert(
      new java.io.File(s"${idx}_delta/e$e/_RETIRED").exists,
      s"e$e must be tombstoned (folded last generation, files kept)"))
    (4 until 6).foreach(e => assert(
      new java.io.File(s"${idx}_delta/e$e").exists &&
        !new java.io.File(s"${idx}_delta/e$e/_RETIRED").exists,
      s"e$e must be live"))
    // two compactions -> base version 2; the superseded v1 dir is
    // retired, the previous generation (v1's predecessor, the flat
    // staging dir) was retired at the v2 flip
    assert(DeltaIndex.currentBase(spark, idx) == s"${idx}_v2")
    // folded admissions still classify: copies of f0 (folded into the
    // base) and f5 (still a delta) both read as existing
    val late = TextOps.classifyNeardupBatch(spark, idx,
        df(Seq(Row(900L, text("f0")), Row(901L, text("f5")))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(late == Map(900L -> "dup_of_existing", 901L -> "dup_of_existing"),
      s"admissions must survive compaction: $late")
  }

  test("maybeCompact folds ONLY committed epochs: a stale current-epoch delta is never folded into the base") {
    val dir = java.nio.file.Files.createTempDirectory("graft_below")
    val idx = dir.resolve("be_idx").toString
    stage(idx, Seq("e0"))
    // three deltas: e0, e1 (committed) and e5 (the CURRENT epoch's
    // stale first attempt — folding it would make the replay
    // self-match)
    Seq(0L, 1L, 5L).foreach { e =>
      TextOps.neardupIngestEpoch(spark, idx, e,
        df(Seq(Row(200L + e, text(s"g$e"))))).collect()
    }
    assert(DeltaIndex.outstanding(spark, idx) == 3)
    DeltaIndex.maybeCompact(spark, idx, epochId = 5L, every = 2)
    assert(DeltaIndex.outstanding(spark, idx) == 1, "e0, e1 folded")
    assert(new java.io.File(s"${idx}_delta/e5").exists,
      "the current epoch's delta must survive for its replay to overwrite")
    // the replay of epoch 5 must still not self-match: its own doc
    // re-classifies unique (reads base + others' deltas, not e5)
    val replay = TextOps.neardupIngestEpoch(spark, idx, 5L,
        df(Seq(Row(205L, text("g5")))))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replay == Map(205L -> "unique"),
      s"replayed epoch must not self-match after partial compaction: $replay")
    // below the threshold nothing folds
    DeltaIndex.maybeCompact(spark, idx, epochId = 6L, every = 2)
    assert(DeltaIndex.outstanding(spark, idx) == 1)
  }

  test("compact is crash-atomic: recovery from a marker finishes the fold — admissions never lost, never double-counted") {
    def build(name: String): (String, Long) = {
      val dir = java.nio.file.Files.createTempDirectory("graft_crash")
      val idx = dir.resolve(name).toString
      stage(idx, Seq("e0"))
      Seq(0L, 1L).foreach { e =>
        TextOps.neardupIngestEpoch(spark, idx, e,
          df(Seq(Row(300L + e, text(s"h$e"))))).collect()
      }
      (idx, DeltaIndex.readAll(spark, idx).count())
    }
    def marker(idx: String): java.io.File = new java.io.File(idx + "_compact_commit")
    // simulate a compact that completed step 1 (merged image in the
    // next version dir) and step 2 (marker published), then crashed
    def imageAndMarker(idx: String): Unit = {
      DeltaIndex.readAll(spark, idx).write.mode("overwrite")
        .parquet(idx + "_v1")
      val w = new java.io.PrintWriter(marker(idx), "UTF-8")
      try w.print("v1\ne0\ne1") finally w.close()
    }
    def checkRecovered(idx: String, baseline: Long): Unit = {
      assert(DeltaIndex.readAll(spark, idx).count() == baseline,
        "recovery must finish the fold and serve exactly one copy")
      assert(!marker(idx).exists, "marker retired after recovery")
      assert(DeltaIndex.outstanding(spark, idx) == 0, "deltas folded")
      assert(DeltaIndex.currentBase(spark, idx) == s"${idx}_v1",
        "pointer flipped to the merged image")
      Seq("e0", "e1").foreach(e => assert(
        new java.io.File(s"${idx}_delta/$e/_RETIRED").exists,
        s"$e tombstoned (files kept one generation for in-flight plans)"))
      val late = TextOps.classifyNeardupBatch(spark, idx,
          df(Seq(Row(990L, text("h0")))))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(late == Map(990L -> "dup_of_existing"))
    }
    // STATE A — crash right after the marker published: pointer still
    // old, deltas live, merged image complete. Recovery must replay
    // the whole publish (tombstone, flip, retire marker).
    val (idxA, baselineA) = build("cra_idx")
    imageAndMarker(idxA)
    checkRecovered(idxA, baselineA)
    // STATE B — crash after the pointer flip and the tombstones,
    // before the marker retired: without idempotent replay the folded
    // admissions would either double-count (if tombstones were
    // ignored) or the marker would wedge every later read
    val (idxB, baselineB) = build("crb_idx")
    imageAndMarker(idxB)
    Seq("e0", "e1").foreach { e =>
      new java.io.File(s"${idxB}_delta/$e/_RETIRED").createNewFile()
    }
    val pw = new java.io.PrintWriter(idxB + "_version", "UTF-8")
    try pw.print("1") finally pw.close()
    checkRecovered(idxB, baselineB)
  }

  test("single-writer guard: a second concurrent stream on a shared indexPath is rejected loudly; sequential reuse still works") {
    val dir = java.nio.file.Files.createTempDirectory("graft_writer")
    val idx = dir.resolve("sw_idx").toString
    stage(idx, Seq("e0"))
    val st = new StreamStore(1 << 20, Long.MaxValue / 2)
    st.append("t_a", docSchema, Seq(Row(1L, text("a1"))))
    st.append("t_b", docSchema, Seq(Row(2L, text("b1"))))
    GraftStoreRegistry.register("s_sw", st)
    try {
      val ck1 = dir.resolve("sw_ck1").toString
      val ck2 = dir.resolve("sw_ck2").toString
      val q1 = TextOps.startNeardupIngest(spark, "s_sw", "t_a", idx,
        maxBatchesPerTrigger = 1, checkpointDir = ck1,
        onEpoch = (_, _) => ())
      try {
        q1.processAllAvailable()
        assert(q1.isActive)
        assert(IngestWriters.liveCheckpoint(idx).contains(ck1))
        // CONCURRENT second writer, different checkpoint, same index:
        // refused before touching any state, naming both checkpoints
        val err = intercept[IllegalStateException] {
          TextOps.startNeardupIngest(spark, "s_sw", "t_b", idx,
            maxBatchesPerTrigger = 1, checkpointDir = ck2,
            onEpoch = (_, _) => ())
        }
        assert(err.getMessage.contains(ck1) && err.getMessage.contains(ck2),
          s"error must name both checkpoints: ${err.getMessage}")
        assert(DeltaIndex.outstanding(spark, idx) == 1,
          "the refused writer must not have compacted or written anything")
      } finally q1.stop()
      // SEQUENTIAL reuse: the first stream stopped, so its claim is
      // reclaimable — a fresh-checkpoint second stream compacts the
      // previous run's deltas and proceeds (the documented flow)
      assert(IngestWriters.liveCheckpoint(idx).isEmpty, "stopped claim is stale")
      val perEpoch = TrieMap.empty[Long, Map[Long, String]]
      val q2 = TextOps.startNeardupIngest(spark, "s_sw", "t_b", idx,
        maxBatchesPerTrigger = 1, checkpointDir = ck2,
        onEpoch = (e, c) => {
          perEpoch.put(e, c.collect().map(r =>
            r.getLong(0) -> r.getString(1)).toMap)
          ()
        })
      try q2.processAllAvailable() finally q2.stop()
      assert(perEpoch.values.flatten.toMap == Map(2L -> "unique"))
      // the first stream's admission (a1) survived the handover
      val late = TextOps.classifyNeardupBatch(spark, idx,
          df(Seq(Row(880L, text("a1")))))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(late == Map(880L -> "dup_of_existing"))
    } finally GraftStoreRegistry.unregister("s_sw")
  }

  test("per-topic ingest counters reach the /metrics exposition across epochs, restarts, and an eviction") {
    val dir = java.nio.file.Files.createTempDirectory("graft_imet")
    val idx = dir.resolve("im_idx").toString
    stage(idx, Seq("e0", "e1"))
    IngestMetrics.reset("docs_met")
    // budget holds two 2-doc batches (2 rows × 2 cols × 8 = 32 B each)
    val st = new StreamStore(maxBytesPerStream = 70,
      ttlMillis = Long.MaxValue / 2)
    val b1 = Seq(Row(100L, text("e0")), Row(101L, text("f1")))
    val b2 = Seq(Row(110L, text("f1")), Row(111L, text("f2")))
    val b3 = Seq(Row(120L, text("g3")), Row(121L, text("g4"))) // evicted
    val b4 = Seq(Row(130L, text("f2")), Row(131L, text("h5")))
    val b5 = Seq(Row(140L, text("h5")), Row(141L, text("k6")))
    st.append("docs_met", docSchema, b1)
    st.append("docs_met", docSchema, b2)
    GraftStoreRegistry.register("s_met", st)
    def start() = TextOps.startNeardupIngest(spark, "s_met", "docs_met", idx,
      maxBatchesPerTrigger = 1,
      checkpointDir = dir.resolve("im_ckpt").toString,
      onEpoch = (_, _) => ())
    try {
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      st.append("docs_met", docSchema, b3)
      st.append("docs_met", docSchema, b4)
      st.append("docs_met", docSchema, b5)
      assert(st.droppedRows("docs_met") > 0, "fixture must actually evict")
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      assert(IngestMetrics.docCounts.filter(_._1._1 == "docs_met").toMap ==
        Map(("docs_met", "admitted") -> 4L,
          ("docs_met", "dup_of_existing") -> 4L),
        s"counters: ${IngestMetrics.docCounts}")
      // 5 epochs ran — including the EMPTY drain of b3's evicted
      // offset (epochs advance while doc counts stand still)
      assert(IngestMetrics.epochCounts.toMap.get("docs_met").contains(5L),
        s"epochs: ${IngestMetrics.epochCounts}")
      // and the Prometheus exposition serves them
      val http = new MetricsHttpServer(st, new GraftMetricsListener)
      try {
        val body = http.render()
        assert(body.contains(
          """graft_ingest_docs_total{topic="docs_met",status="admitted"} 4"""),
          body.linesIterator.filter(_.contains("graft_ingest")).mkString("\n"))
        assert(body.contains(
          """graft_ingest_docs_total{topic="docs_met",status="dup_of_existing"} 4"""))
        assert(body.contains(
          """graft_ingest_epochs_total{topic="docs_met"} 5"""))
      } finally http.close()
    } finally GraftStoreRegistry.unregister("s_met")
  }

  test("TTL x resume contract: mid-run expiry drains EMPTY; a restart against an expired topic fails loudly at load()") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl")
    val idx = dir.resolve("ttl_idx").toString
    stage(idx, Seq("e0"))
    var clock = 0L
    val st = new StreamStore(1 << 20, ttlMillis = 100L, now = () => clock)
    st.append("docs_ttl", docSchema, Seq(Row(1L, text("p1"))))
    GraftStoreRegistry.register("s_ttl", st)
    val epochs = TrieMap.empty[Long, Int]
    def start() = TextOps.startNeardupIngest(spark, "s_ttl", "docs_ttl", idx,
      maxBatchesPerTrigger = 1,
      checkpointDir = dir.resolve("ttl_ckpt").toString,
      onEpoch = (e, c) => { epochs.put(e, c.collect().length); () })
    try {
      val q1 = start()
      try {
        q1.processAllAvailable()
        assert(epochs.keySet == Set(0L))
        // the topic idle-expires WHILE the query is running: the
        // offset axis clamps at the committed position — the query
        // drains empty and stays alive (the TTL analog of eviction's
        // missing-offsets contract), it does not crash or replay
        clock = 1000L
        assert(st.expire() == Seq("docs_ttl"), "fixture must actually expire")
        q1.processAllAvailable()
        assert(q1.isActive, "mid-run expiry must not kill the query")
        assert(epochs.keySet == Set(0L), "no phantom epochs after expiry")
      } finally q1.stop()
      // RESTART against the expired topic: the schema is gone with the
      // stream — fail loudly at load(), naming the topic and the
      // expiry possibility (a silent empty stream would read as 'no
      // data' when the truth is 'your topic was expired')
      val err = intercept[IllegalArgumentException] { start() }
      assert(err.getMessage.contains("docs_ttl") &&
        err.getMessage.contains("expired"),
        s"restart error must be actionable: ${err.getMessage}")
      // the failed start released its writer claim: re-ingesting the
      // topic (create-on-access) lets a FRESH checkpoint resume
      st.append("docs_ttl", docSchema, Seq(Row(2L, text("p2"))))
      val q2 = TextOps.startNeardupIngest(spark, "s_ttl", "docs_ttl", idx,
        maxBatchesPerTrigger = 1,
        checkpointDir = dir.resolve("ttl_ckpt2").toString,
        onEpoch = (e, c) => { epochs.put(100L + e, c.collect().length); () })
      try q2.processAllAvailable() finally q2.stop()
      assert(epochs.contains(100L), "a recreated topic serves a fresh checkpoint")
    } finally GraftStoreRegistry.unregister("s_ttl")
  }

  test("multiprobe-bits dial: at a wide bucket space (16 planes) extra probe bits recover the copies a 1-bit probe splits away") {
    import graft.engine.VectorOps
    val dir = java.nio.file.Files.createTempDirectory("graft_probebits")
    val idx = dir.resolve("pb_idx").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    VectorOps.stageAnnIndex(emb, idx, nPlanes = 16, dim = 64)
    // a jittered copy of EVERY indexed vector: deterministic md5
    // per-dim jitter up to ±0.0045 — the fixture vectors are
    // unit-norm, so cosine vs the original stays ~0.9996 (well over
    // the 0.95 threshold), while at 16 planes a fraction of copies
    // drift ≥ 2 bucket bits — exactly the copies the dial is for
    val probes = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, j) =>
        (x.cast("double") +
          (conv(substring(md5(concat(lit("pb:"),
            col("vec_id").cast("string"), lit(":"), j.cast("string"))),
            1, 8), 16, 10).cast("long") % 9001L - 4500L).cast("double")
            / 1000000.0d)
        .cast("float")).as("embedding"))
      .localCheckpoint(true)
    def outcomes(bits: Int): Map[Long, (String, Long)] =
      VectorOps.classifyAnnBatch(spark, idx, probes, nPlanes = 16,
          dim = 64, probeBits = bits)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(4), r.getLong(2))).toMap
    val one = outcomes(1)
    val two = outcomes(2)
    def matchedSet(m: Map[Long, (String, Long)]): Set[Long] =
      m.collect { case (id, ("matched", _)) => id }.toSet
    val (m1, m2) = (matchedSet(one), matchedSet(two))
    // widening the neighborhood can only ADD candidates, and the
    // verdict is the exact-cosine threshold — so matches are monotone
    // in probeBits, and every extra match is the probe's true original
    assert(m1.subsetOf(m2), s"probeBits must be monotone: ${m1 -- m2}")
    assert(m2.size > m1.size,
      s"2-bit multiprobe must recover drift-2 copies (1-bit matched ${m1.size}/${one.size}, 2-bit ${m2.size})")
    val extra = m2 -- m1
    assert(extra.forall(id => two(id)._2 == id - 1000000L),
      s"every recovered match must be the probe's own original: " +
        extra.map(id => id -> two(id)).toMap.take(5).toString)
    // mask algebra: |masks| = sum of C(n, b) for b <= bits
    assert(VectorOps.multiprobeMasks(16, 1).size == 17)
    assert(VectorOps.multiprobeMasks(16, 2).size == 137)
    assert(VectorOps.multiprobeMasks(4, 4).size == 16)
    intercept[IllegalArgumentException] {
      VectorOps.multiprobeMasks(16, 17)
    }
    intercept[IllegalArgumentException] {
      VectorOps.multiprobeMasks(16, 12) // fan-out cap
    }
  }

  test("bucket-partitioned index layout: the bounded probe-key set pushes as a static partition filter, verdicts layout-independent") {
    import graft.engine.VectorOps
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketpart")
    val flat = dir.resolve("bp_flat").toString
    val part = dir.resolve("bp_part").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // 16 planes: a 65 536-bucket space the 250-probe batch's multiprobe
    // neighborhood covers only sparsely — the regime the layout is FOR
    // (at 8 planes this batch covers all 256 buckets and the push is
    // correctly skipped as useless — asserted below)
    VectorOps.stageAnnIndex(emb.filter(col("vec_id") % 2 === 0), flat,
      nPlanes = 16)
    VectorOps.stageAnnIndex(emb.filter(col("vec_id") % 2 === 0), part,
      nPlanes = 16, bucketPartitioned = true)
    assert(new java.io.File(part).listFiles()
      .exists(_.getName.startsWith("bucket=")),
      "the partitioned layout must write one dir per LSH bucket")
    val probes = emb.filter(col("vec_id") % 2 === 1)
    def classify(idx: String, partitioned: Boolean) =
      VectorOps.classifyAnnBatch(spark, idx, probes, nPlanes = 16,
        bucketPartitioned = partitioned)
    def outcomes(idx: String, partitioned: Boolean): Map[Long, (String, Long)] =
      classify(idx, partitioned).collect()
        .map(r => r.getLong(0) -> (r.getString(4), r.getLong(2))).toMap
    // verdicts are LAYOUT-INDEPENDENT (partition values parse back as
    // ints, the probe join coerces — same matches, same best ids; the
    // IN pre-filter is an optimization under the semi-join, never a
    // semantics change)
    assert(outcomes(flat, partitioned = false) ==
      outcomes(part, partitioned = true),
      "classification must not depend on the index layout")
    // and the 100 TB claim is a PLAN property, not prose: the batch's
    // bounded multiprobe key set pushes as a STATIC partition filter
    // on the partitioned layout — only matching bucket dirs are
    // listed or read
    val plan = classify(part, partitioned = true)
      .queryExecution.executedPlan.toString
    def hasKeyFilter(p: String): Boolean = p.linesIterator
      .exists(l => l.contains("bp_part") && l.contains("PartitionFilters: [") &&
        l.contains("bucket") && (l.contains(" IN ") || l.contains("INSET")))
    assert(hasKeyFilter(plan),
      s"the partitioned index scan must carry the probe-key partition filter:\n${plan.take(3000)}")
    // and COMPACTION PRESERVES THE LAYOUT: an ingest epoch writes a
    // delta, the fold re-partitions the merged base by the detected
    // partition column — the partition dirs (and the pruned plan)
    // survive, verdicts unchanged
    VectorOps.annIngestEpoch(spark, part, 0L,
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(777777L,
          (0 until 64).map(_ => 0.5f))).toList),
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(FloatType))))),
      nPlanes = 16).collect()
    assert(graft.engine.DeltaIndex.outstanding(spark, part) == 1)
    // baseline AFTER the epoch grew the index (base + delta) — the
    // fold must serve the identical content from the partitioned base
    val beforeCompact = outcomes(part, partitioned = true)
    graft.engine.DeltaIndex.compact(spark, part)
    assert(graft.engine.DeltaIndex.outstanding(spark, part) == 0)
    // the fold produced a new base VERSION (snapshot isolation) —
    // layout preservation is judged on the dir actually served
    val served = graft.engine.DeltaIndex.currentBase(spark, part)
    assert(served == s"${part}_v1", s"compaction must publish a new version, got $served")
    assert(new java.io.File(served).listFiles()
      .exists(_.getName.startsWith("bucket=")),
      "compaction must preserve the bucket-partitioned layout")
    assert(outcomes(part, partitioned = true) == beforeCompact,
      "verdicts unchanged across a layout-preserving compaction")
    assert(hasKeyFilter(classify(part, partitioned = true)
        .queryExecution.executedPlan.toString),
      "the partition filter must still fire after compaction")
    // useless-push valve: at 8 planes this batch's multiprobe
    // neighborhood covers the whole 256-bucket space — the push is
    // skipped (filtering by every key prunes nothing), the semi-join
    // still prunes exactly
    val flat8 = dir.resolve("bp_flat8").toString
    VectorOps.stageAnnIndex(emb.filter(col("vec_id") % 2 === 0), flat8,
      bucketPartitioned = true)
    val plan8 = VectorOps.classifyAnnBatch(spark, flat8, probes,
        bucketPartitioned = true)
      .queryExecution.executedPlan.toString
    assert(!plan8.linesIterator.exists(l => l.contains("bp_flat8") &&
        l.contains("PartitionFilters") &&
        (l.contains(" IN ") || l.contains("INSET"))),
      "a whole-space key set must not be pushed")
  }
}
