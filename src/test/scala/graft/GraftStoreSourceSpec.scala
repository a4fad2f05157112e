package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.StreamStore
import graft.sources.{GraftScan, GraftStoreRegistry}

/** The DataSource V2 read path over the stream store: schema
  * inference (GetSchema analog), per-buffered-batch partitions,
  * column pruning and filter pushdown — all asserted against the
  * EXECUTED plan's BatchScanExec, not just results. */
class GraftStoreSourceSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("name", StringType),
    StructField("v", LongType)))

  private def freshStore(name: String): StreamStore = {
    val st = new StreamStore(maxBytesPerStream = 1 << 20, ttlMillis = Long.MaxValue / 2)
    st.append("t1", schema, (0L until 10L).map(i => Row(i, s"n$i", i * 10)))
    st.append("t1", schema, (10L until 15L).map(i => Row(i, s"n$i", i * 10)))
    GraftStoreRegistry.register(name, st)
    st
  }

  private def read(store: String) =
    spark.read.format("graft-store")
      .option("store", store).option("topic", "t1").load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): GraftScan = {
    df.collect() // force planning through AQE
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec in the executed plan")
    scans.head.scan.asInstanceOf[GraftScan]
  }

  test("schema inference + full read round-trips the buffered batches") {
    freshStore("s_full")
    val df = read("s_full")
    assert(df.schema.fieldNames.toSeq == Seq("k", "name", "v"))
    assert(df.count() == 15)
    assert(df.agg(sum("v")).head.getLong(0) == (0L until 15L).map(_ * 10).sum)
    GraftStoreRegistry.unregister("s_full")
  }

  test("one input partition per buffered batch (reference batch boundaries)") {
    freshStore("s_parts")
    val df = read("s_parts")
    assert(scanOf(df).toBatch.planInputPartitions().length == 2)
    GraftStoreRegistry.unregister("s_parts")
  }

  test("column pruning reaches the scan: readSchema drops unselected fields") {
    freshStore("s_prune")
    val df = read("s_prune").select("v")
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("v"))
    assert(df.agg(sum("v")).head.getLong(0) == (0L until 15L).map(_ * 10).sum)
    GraftStoreRegistry.unregister("s_prune")
  }

  test("comparison filters are pushed, evaluated in the reader, and correct") {
    freshStore("s_push")
    val df = read("s_push").filter(col("v") >= 100 && col("name") =!= "n12")
    val scan = scanOf(df)
    // v >= 100 and the IsNotNulls push; name != 'n12' (Not) stays above
    assert(scan.description().contains("GreaterThanOrEqual(v,100)"))
    assert(!scan.description().contains("n12"))
    assert(df.select("k").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 11L, 13L, 14L))
    GraftStoreRegistry.unregister("s_push")
  }

  test("pushed filter + pruning compose: count with predicate only") {
    freshStore("s_both")
    val df = read("s_both").filter(col("k") < 3).select("name")
    val scan = scanOf(df)
    assert(scan.description().contains("LessThan(k,3)"))
    assert(scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("n0", "n1", "n2"))
    GraftStoreRegistry.unregister("s_both")
  }

  test("ungrouped COUNT/MIN/MAX push COMPLETELY: no aggregate above the scan") {
    freshStore("s_agg")
    val df = read("s_agg").agg(
      count(lit(1)).as("n"), count(col("name")).as("nn"),
      min("v").as("mn"), max("v").as("mx"), max("name").as("mxs"))
    val r = df.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4)) == (15L, 15L, 0L, 140L, "n9"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"),
      s"aggregate must be fully pushed:\n$plan")
    val scan = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.scan.asInstanceOf[GraftScan]
    assert(scan.description().contains("PushedAggregation="),
      scan.description())
    GraftStoreRegistry.unregister("s_agg")
  }

  test("aggregate pushdown composes with pushed filters") {
    freshStore("s_aggf")
    val df = read("s_aggf").filter(col("v") >= 100)
      .agg(count(lit(1)).as("n"), min("k").as("mn"))
    val r = df.head
    assert((r.getLong(0), r.getLong(1)) == (5L, 10L))
    assert(!df.queryExecution.executedPlan.toString.contains("HashAggregate"))
    GraftStoreRegistry.unregister("s_aggf")
  }

  test("unsupported aggregations decline pushdown and stay correct") {
    freshStore("s_aggd")
    // SUM and grouped aggregations are not pushed — Spark computes them
    val g = read("s_aggd").groupBy("name").agg(count(lit(1)).as("n"))
    assert(g.count() == 15)
    assert(g.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val sdf = read("s_aggd").agg(sum("v"))
    assert(sdf.head.getLong(0) == (0L until 15L).map(_ * 10).sum)
    assert(sdf.queryExecution.executedPlan.toString.contains("HashAggregate"))
    // distinct count also declines
    val ddf = read("s_aggd").agg(countDistinct("name"))
    assert(ddf.head.getLong(0) == 15L)
    GraftStoreRegistry.unregister("s_aggd")
  }

  test("LIMIT pushes fully: the scan emits at most N rows") {
    freshStore("s_lim")
    val df = read("s_lim").limit(4)
    assert(df.count() == 4)
    val scan = scanOf(df)
    assert(scan.description().contains("PushedLimit=[4]"), scan.description())
    // one bounded partition answers; no per-batch fan-out
    assert(scan.toBatch.planInputPartitions().length == 1)
    GraftStoreRegistry.unregister("s_lim")
  }

  test("ORDER BY + LIMIT pushes as top-N: Spark drops its own sort") {
    freshStore("s_topn")
    val df = read("s_topn").orderBy(col("v").desc).limit(3)
    val out = df.collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((14L, 140L), (13L, 130L), (12L, 120L)))
    val scan = scanOf(df)
    assert(scan.description().contains("PushedTopN="), scan.description())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      s"top-N must be fully pushed:\n$plan")
    GraftStoreRegistry.unregister("s_topn")
  }

  test("top-N pushdown composes with pushed filters") {
    freshStore("s_topnf")
    val df = read("s_topnf").filter(col("v") < 100)
      .orderBy(col("k").desc).limit(2)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(9L, 8L))
    assert(scanOf(df).description().contains("PushedTopN="))
    GraftStoreRegistry.unregister("s_topnf")
  }

  test("unknown store or topic fails loudly") {
    intercept[IllegalArgumentException] {
      spark.read.format("graft-store")
        .option("store", "nope").option("topic", "t1").load()
    }
    freshStore("s_bad")
    intercept[IllegalArgumentException] {
      spark.read.format("graft-store")
        .option("store", "s_bad").option("topic", "missing").load()
    }
    GraftStoreRegistry.unregister("s_bad")
  }

  test("streaming source: incremental micro-batches follow the append offset") {
    val st = freshStore("s_stream")
    val q = spark.readStream.format("graft-store")
      .option("store", "s_stream").option("topic", "t1").load()
      .groupBy().agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .writeStream.format("memory").queryName("s_stream_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("s_stream_sink").head
      assert(r1.getLong(0) == 15)
      // new appends advance latestOffset; the NEXT micro-batch picks
      // up exactly the new batches, never reprocessing old offsets
      // (complete-mode totals stay consistent because state carries)
      st.append("t1", schema, (15L until 18L).map(i => Row(i, s"n$i", i * 10)))
      q.processAllAvailable()
      val r2 = spark.table("s_stream_sink").head
      assert(r2.getLong(0) == 18)
      assert(r2.getLong(1) == (0L until 18L).map(_ * 10).sum)
    } finally q.stop()
    GraftStoreRegistry.unregister("s_stream")
  }

  test("batch write: df.write lands one store batch per partition, create-on-access topic") {
    val st = new StreamStore(maxBytesPerStream = 1 << 20, ttlMillis = Long.MaxValue / 2)
    GraftStoreRegistry.register("s_bw", st)
    import spark.implicits._
    (0L until 20L).map(i => (i, s"n$i", i * 10)).toDF("k", "name", "v")
      .repartition(4)
      .write.format("graft-store")
      .option("store", "s_bw").option("topic", "fresh_topic")
      .mode("append").save()
    assert(st.listTopics().contains("fresh_topic"), "create-on-access")
    assert(st.appendedBatches("fresh_topic") == 4, "one batch per partition")
    val back = read2("s_bw", "fresh_topic")
    assert(back.count() == 20)
    assert(back.agg(sum("v")).head.getLong(0) == (0L until 20L).map(_ * 10).sum)
    GraftStoreRegistry.unregister("s_bw")
  }

  test("streaming write: each micro-batch appends ONE store batch (epoch = batch boundary)") {
    import spark.implicits._
    val st = new StreamStore(maxBytesPerStream = 1 << 20, ttlMillis = Long.MaxValue / 2)
    GraftStoreRegistry.register("s_sw", st)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)](spark)
    val q = in.toDF().toDF("k", "name", "v")
      .writeStream.format("graft-store")
      .option("store", "s_sw").option("topic", "t_sink")
      .option("checkpointLocation",
        s"${System.getProperty("java.io.tmpdir")}/graft_sw_ckpt_${System.nanoTime()}")
      .start()
    try {
      in.addData((1L, "a", 10L), (2L, "b", 20L))
      q.processAllAvailable()
      assert(st.appendedBatches("t_sink") == 1)
      in.addData((3L, "c", 30L))
      q.processAllAvailable()
      assert(st.appendedBatches("t_sink") == 2, "second epoch = second batch")
      val back = read2("s_sw", "t_sink")
      assert(back.count() == 3)
      assert(back.agg(sum("v")).head.getLong(0) == 60L)
    } finally q.stop()
    GraftStoreRegistry.unregister("s_sw")
  }

  private def read2(store: String, topic: String) =
    spark.read.format("graft-store")
      .option("store", store).option("topic", topic).load()

  test("streaming source: evicted offsets surface as missing batches, not failures") {
    // tiny byte budget: appending batch 3 evicts batch 1 BEFORE the
    // query starts; initialOffset begins at the oldest SURVIVING batch
    val st = new StreamStore(maxBytesPerStream = 600, ttlMillis = Long.MaxValue / 2)
    st.append("t1", schema, (0L until 10L).map(i => Row(i, s"n$i", i * 10)))
    st.append("t1", schema, (10L until 20L).map(i => Row(i, s"n$i", i * 10)))
    st.append("t1", schema, (20L until 30L).map(i => Row(i, s"n$i", i * 10)))
    assert(st.droppedRows("t1") > 0, "fixture must actually evict")
    assert(st.appendedBatches("t1") == 3)
    GraftStoreRegistry.register("s_evict", st)
    val q = spark.readStream.format("graft-store")
      .option("store", "s_evict").option("topic", "t1").load()
      .groupBy().agg(count(lit(1)).as("n"), min("k").as("mink"))
      .writeStream.format("memory").queryName("s_evict_sink")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val r = spark.table("s_evict_sink").head
      assert(r.getLong(0) == 20, "only the two surviving batches stream")
      assert(r.getLong(1) == 10L, "evicted head batch is absent, not re-served")
    } finally q.stop()
    GraftStoreRegistry.unregister("s_evict")
  }

  test("metadata columns: _batch_offset/_row_in_batch when selected, absent from SELECT *") {
    freshStore("s_meta")
    val df = read("s_meta")
    assert(!df.schema.fieldNames.contains("_batch_offset"),
      "metadata columns must not leak into SELECT *")
    val m = df.select(col("k"), col("_batch_offset"), col("_row_in_batch"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(m.size == 15)
    // batch 0 holds k=0..9, batch 1 holds k=10..14; row position in order
    m.foreach { case (k, b, j) =>
      assert(b == (if (k < 10) 0L else 1L), s"wrong batch offset for k=$k: $b")
      assert(j == (if (k < 10) k else k - 10), s"wrong row position for k=$k: $j")
    }
    GraftStoreRegistry.unregister("s_meta")
  }

  test("metadata offsets are ABSOLUTE: eviction moves the window, not the numbering") {
    val st = new StreamStore(maxBytesPerStream = 260, ttlMillis = Long.MaxValue / 2)
    // 10 rows x 3 cols x 8 = 240 bytes/batch: each append evicts the previous
    st.append("t1", schema, (0L until 10L).map(i => Row(i, s"n$i", i)))
    st.append("t1", schema, (10L until 20L).map(i => Row(i, s"n$i", i)))
    st.append("t1", schema, (20L until 30L).map(i => Row(i, s"n$i", i)))
    GraftStoreRegistry.register("s_meta_ev", st)
    val offs = read("s_meta_ev").select(col("_batch_offset")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(offs == Set(2L), s"only the 3rd append survives, numbered 2: $offs")
    GraftStoreRegistry.unregister("s_meta_ev")
  }

  test("SupportsReportStatistics: store-backed dims broadcast from reported stats") {
    val st = freshStore("s_stats")
    try {
      // the scan reports exactly the store's incrementally-tracked sizes
      val scan = new GraftScan("s_stats", "t1", schema, schema, Array.empty)
      val stats = scan.estimateStatistics()
      assert(stats.sizeInBytes().getAsLong == st.currentBytes("t1"))
      assert(stats.numRows().getAsLong == 15L)
      assert(st.currentBytes("t1") == 15L * 3 * 8, "rows x cols x 8 contract")
      // a probe side estimated far above the broadcast threshold joined
      // to the 360-byte store topic: the STATIC plan (pre-AQE, so the
      // decision can only come from reported stats, not runtime shuffle
      // sizes) must pick BroadcastHashJoin under the default 10 MB
      // threshold — without SupportsReportStatistics the V2 relation
      // sizes at spark.sql.defaultSizeInBytes and this is a sort-merge
      val big = spark.range(0L, 2000000L).selectExpr("id % 15 AS k", "id AS w")
      val joined = big.join(read("s_stats"), "k")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      assert(joined.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
        "store side must broadcast because of its reported statistics")
      assert(joined.head.getLong(0) == 2000000L, "join result stays correct")
      // the threshold is honored: -1 must suppress the stats-driven broadcast
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j2 = big.join(read("s_stats"), "k").agg(count(lit(1)).as("n"))
        assert(!j2.queryExecution.sparkPlan.toString.contains("BroadcastHashJoin"),
          "autoBroadcastJoinThreshold=-1 must disable the broadcast")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally GraftStoreRegistry.unregister("s_stats")
  }

  test("metadata columns compose with pushed filters and pruning") {
    freshStore("s_meta_f")
    val rows = read("s_meta_f").filter(col("v") >= 100)
      .select(col("k"), col("_batch_offset"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.map(_._1).toSet == (10L until 15L).toSet)
    assert(rows.forall(_._2 == 1L), "filtered rows keep their true provenance")
    GraftStoreRegistry.unregister("s_meta_f")
  }

  /** Store with 8 key-ranged batches of 50 rows (k in [i·50, i·50+50)):
    * 1200 B per batch (rows × cols × 8), 9600 B total — the fixture
    * for filter-aware statistics and static zone pruning. */
  private def rangedStore(name: String): StreamStore = {
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    (0 until 8).foreach { i =>
      st.append("t1", schema,
        (i * 50L until i * 50L + 50L).map(j => Row(j, s"n$j", j * 10)))
    }
    GraftStoreRegistry.register(name, st)
    st
  }

  test("filter-aware statistics: pushed zone-checked filters shrink the estimate and flip the join to broadcast") {
    rangedStore("s_zstats")
    try {
      // unit level: a pushed k < 50 keeps exactly one batch's stats
      val unfiltered = new GraftScan("s_zstats", "t1", schema, schema,
        Array.empty).estimateStatistics()
      assert(unfiltered.numRows().getAsLong == 400L)
      assert(unfiltered.sizeInBytes().getAsLong == 9600L)
      val filtered = new GraftScan("s_zstats", "t1", schema, schema,
        Array(org.apache.spark.sql.sources.LessThan("k", 50L)))
        .estimateStatistics()
      assert(filtered.numRows().getAsLong == 50L,
        "only the one batch whose zone intersects k < 50 is counted")
      assert(filtered.sizeInBytes().getAsLong == 1200L)
      // column statistics surface the merged zone ranges (real min/max
      // for CBO selectivity, the footer analog)
      val cs = unfiltered.columnStats()
      assert(!cs.isEmpty, "zoned integral columns must report column stats")
      val kStats = cs.asScala.collectFirst {
        case (ref, st) if ref.describe() == "k" => st
      }.get
      assert(kStats.min().get() == java.lang.Long.valueOf(0L))
      assert(kStats.max().get() == java.lang.Long.valueOf(399L))
      // plan level: threshold between the filtered (1200 B) and
      // unfiltered (9600 B) estimates — the SAME join goes broadcast
      // only when the selective filter is pushed. Static plan (pre-AQE)
      // so the decision can only come from the reported statistics.
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "5000")
      try {
        val big = spark.range(0L, 500000L).selectExpr("id % 400 AS k", "id AS w")
        val withFilter = big.join(read("s_zstats").filter(col("k") < 50), "k")
          .agg(count(lit(1)).as("n"))
        assert(withFilter.queryExecution.sparkPlan.toString
            .contains("BroadcastHashJoin"),
          "post-filter estimate (1200 B) is under the 5000 B threshold")
        assert(withFilter.head.getLong(0) == 500000L / 400 * 50,
          "broadcast flip never changes results")
        val noFilter = big.join(read("s_zstats"), "k")
          .agg(count(lit(1)).as("n"))
        assert(!noFilter.queryExecution.sparkPlan.toString
            .contains("BroadcastHashJoin"),
          "unfiltered estimate (9600 B) stays above the threshold — " +
            "the flip is attributable to the filter-aware statistics")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally GraftStoreRegistry.unregister("s_zstats")
  }

  test("static pushed filters zone-prune planned partitions (footer-style row-group skipping)") {
    val st = rangedStore("s_zprune")
    try {
      val zonesBefore = st.zoneComputations("t1")
      val df = read("s_zprune").filter(col("k") >= 350)
      val scan = scanOf(df)
      assert(scan.toBatch.planInputPartitions().length == 1,
        "only the batch whose zone intersects k >= 350 is planned")
      assert(df.count() == 50)
      assert(df.agg(min("k")).head.getLong(0) == 350L)
      assert(st.zoneComputations("t1") == zonesBefore,
        "planning reads append-time zones, never recomputes them")
      // an impossible predicate plans ZERO partitions and returns empty
      val none = read("s_zprune").filter(col("k") > 100000)
      assert(none.count() == 0)
      assert(scanOf(none).toBatch.planInputPartitions().isEmpty)
    } finally GraftStoreRegistry.unregister("s_zprune")
  }

  test("GraftZonePrune: intersection tests are exact on the comparison family, conservative elsewhere") {
    import org.apache.spark.sql.sources._
    import graft.engine.StreamStore.Zone
    import graft.sources.GraftZonePrune.mayMatch
    val z = Map("k" -> Zone(10L, 20L, hasNull = false),
      "n" -> Zone(5L, 5L, hasNull = true),
      "empty" -> Zone(Long.MaxValue, Long.MinValue, hasNull = true))
    def one(f: Filter): Boolean = mayMatch(z, Array(f))
    // EqualTo: inside / edges / outside
    assert(one(EqualTo("k", 15L)) && one(EqualTo("k", 10L)) && one(EqualTo("k", 20L)))
    assert(!one(EqualTo("k", 9L)) && !one(EqualTo("k", 21L)))
    // strict vs non-strict comparisons at the zone edges
    assert(!one(GreaterThan("k", 20L)) && one(GreaterThanOrEqual("k", 20L)))
    assert(!one(LessThan("k", 10L)) && one(LessThanOrEqual("k", 10L)))
    assert(one(GreaterThan("k", 19L)) && one(LessThan("k", 11L)))
    // In: any value intersecting keeps the batch
    assert(one(In("k", Array(1L, 99L, 12L))) && !one(In("k", Array(1L, 99L))))
    // null predicates read hasNull / emptiness
    assert(!one(IsNull("k")) && one(IsNull("n")) && one(IsNull("empty")))
    assert(one(IsNotNull("k")) && !one(IsNotNull("empty")))
    // all-null zone can't satisfy a comparison
    assert(!one(EqualTo("empty", 0L)))
    // conservative: unzoned column, non-integral value, unknown shape
    assert(one(EqualTo("name", "x")) && one(EqualTo("k", "notanumber")))
    assert(one(StringStartsWith("name", "a")))
    assert(one(In("k", Array[Any](1L, "weird"))))
    // conjunction: every filter must be satisfiable
    assert(!mayMatch(z, Array[Filter](EqualTo("k", 15L), EqualTo("k", 9L))))
    // property sweep vs brute force on a dense domain
    val zz = Map("k" -> Zone(100L, 110L, hasNull = false))
    for (v <- 95L to 115L) {
      assert(mayMatch(zz, Array[Filter](EqualTo("k", v))) ==
        (100L to 110L).contains(v))
      assert(mayMatch(zz, Array[Filter](GreaterThan("k", v))) ==
        (100L to 110L).exists(_ > v))
      assert(mayMatch(zz, Array[Filter](LessThan("k", v))) ==
        (100L to 110L).exists(_ < v))
    }
  }

  test("CBO surface: DSv2 column statistics reach the optimized plan's attribute stats") {
    rangedStore("s_cbo")
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val base = read("s_cbo").queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
      }.get
      val stats = base.computeStats()
      assert(stats.rowCount.contains(BigInt(400)),
        s"row count from reported statistics: ${stats.rowCount}")
      val kAttr = base.output.find(_.name == "k").get
      val colStat = stats.attributeStats.get(kAttr)
      assert(colStat.isDefined,
        "zone-derived column statistics must surface as attributeStats under CBO")
      assert(colStat.get.min.contains(0L) && colStat.get.max.contains(399L),
        s"merged zone range expected [0, 399]: ${colStat.get}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
      GraftStoreRegistry.unregister("s_cbo")
    }
  }

  test("maxBatchesPerTrigger: admission control caps offsets per micro-batch (Kafka maxOffsetsPerTrigger analog)") {
    def threeBatchStore(name: String): Unit = {
      val st = new StreamStore(maxBytesPerStream = 1 << 20,
        ttlMillis = Long.MaxValue / 2)
      (0 until 3).foreach { i =>
        st.append("t1", schema,
          (i * 10L until i * 10L + 10L).map(j => Row(j, s"n$j", j)))
      }
      GraftStoreRegistry.register(name, st)
    }
    def microBatchSizes(name: String, opt: Option[String]): Seq[Long] = {
      val sizes = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val rd = spark.readStream.format("graft-store")
        .option("store", name).option("topic", "t1")
      val q = opt.fold(rd)(v => rd.option("maxBatchesPerTrigger", v)).load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          sizes.add((id, df.count())); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      sizes.asScala.toSeq.sortBy(_._1).map(_._2).filter(_ > 0)
    }
    threeBatchStore("s_adm1")
    threeBatchStore("s_adm2")
    try {
      // capped: three appends drain as THREE micro-batches of one
      // store batch each — the reference's batch-size/fetch-window
      // backpressure (O9-O11) as admission control, not documentation
      assert(microBatchSizes("s_adm1", Some("1")) == Seq(10L, 10L, 10L))
      // uncapped default: ReadAllAvailable admits everything at once
      assert(microBatchSizes("s_adm2", None) == Seq(30L))
    } finally {
      GraftStoreRegistry.unregister("s_adm1")
      GraftStoreRegistry.unregister("s_adm2")
    }
  }

  test("eviction BETWEEN micro-batches: a slow consumer loses offsets by contract, rows are never misattributed") {
    // budget holds two 240 B batches; the consumer reads the first two
    // appends, goes away, and three more appends evict the FIRST
    // UNCONSUMED batch (absolute offset 2) before it returns. The
    // restart must surface that as missing offsets — batch 2's rows
    // absent, batches 3-4 intact — exactly the reference's drop-oldest
    // loses-data-by-contract semantics (stream/manager.go:286-310),
    // never as a failure or as rows served under wrong offsets.
    val st = new StreamStore(maxBytesPerStream = 600,
      ttlMillis = Long.MaxValue / 2)
    st.append("t1", schema, (0L until 10L).map(i => Row(i, s"n$i", i)))
    st.append("t1", schema, (10L until 20L).map(i => Row(i, s"n$i", i)))
    GraftStoreRegistry.register("s_evict_mb", st)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_evmb").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def drain(): Unit = {
      val q = spark.readStream.format("graft-store")
        .option("store", "s_evict_mb").option("topic", "t1").load()
        .select(col("k"), col("_batch_offset"))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.add((r.getLong(0), r.getLong(1))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    try {
      drain()
      assert(got.size == 20, "first drain reads both buffered batches")
      st.append("t1", schema, (20L until 30L).map(i => Row(i, s"n$i", i)))
      st.append("t1", schema, (30L until 40L).map(i => Row(i, s"n$i", i)))
      st.append("t1", schema, (40L until 50L).map(i => Row(i, s"n$i", i)))
      assert(st.appendedBatches("t1") == 5)
      assert(st.batchSlice("t1", 2, 3).isEmpty,
        "fixture must have evicted the first unconsumed batch")
      drain()
      val all = got.asScala.toSeq
      val ks = all.map(_._1).toSet
      assert(ks == ((0L until 20L) ++ (30L until 50L)).toSet,
        s"offset-2 rows (k 20..29) are MISSING by contract, the rest " +
          s"intact: got ${ks.toSeq.sorted.mkString(",")}")
      // provenance stays absolute: every served row carries the true
      // append index of its batch, so nothing is misattributed
      all.foreach { case (k, off) =>
        assert(off == k / 10, s"row k=$k served under wrong offset $off")
      }
    } finally GraftStoreRegistry.unregister("s_evict_mb")
  }

  test("maxBatchesPerTrigger validates up front: zero, negative, and non-numeric fail with the option named") {
    freshStore("s_val")
    try {
      def mk(v: String) = new graft.sources.GraftStoreTable("s_val", "t1", schema)
        .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map("maxBatchesPerTrigger" -> v).asJava))
      Seq("0", "-3", "lots").foreach { v =>
        val e = intercept[IllegalArgumentException](mk(v))
        assert(e.getMessage.contains("maxBatchesPerTrigger") &&
          e.getMessage.contains(v), s"'$v' must name option and value: ${e.getMessage}")
      }
      mk("2") // a positive integer parses
    } finally GraftStoreRegistry.unregister("s_val")
  }

  test("ReadLimit.maxRows counts BATCHES on the store offset axis: a 3-row batch is ONE unit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.sources.{GraftMicroBatchStream, GraftOffset}
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    st.append("t1", schema, (0L until 3L).map(i => Row(i, s"n$i", i)))
    st.append("t1", schema, (3L until 5L).map(i => Row(i, s"n$i", i)))
    GraftStoreRegistry.register("s_unit", st)
    try {
      val mbs = new GraftMicroBatchStream("s_unit", "t1", schema, schema,
        Array.empty, Some(1L))
      assert(mbs.getDefaultReadLimit.isInstanceOf[
        org.apache.spark.sql.connector.read.streaming.ReadMaxRows])
      val start = mbs.initialOffset()
      val end = mbs.latestOffset(start, ReadLimit.maxRows(1))
      assert(end == GraftOffset(1),
        "maxRows(1) admits ONE appended batch — the offset unit — not one row")
      // ...and the whole 3-row batch flows inside that single unit
      val parts = mbs.planInputPartitions(start, end)
      assert(parts.length == 1)
      assert(st.batchSlice("t1", 0, 1).head._2.size == 3)
    } finally GraftStoreRegistry.unregister("s_unit")
  }

  test("timestamp zones: a pushed ts-range filter shrinks the estimate and statically prunes partitions") {
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val tsSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    // four batches covering disjoint 6-hour windows
    (0 until 4).foreach { b =>
      st.append("tts", tsSchema,
        (0 until 10).map(i => Row(t(b * 6 + i % 6), b * 10L + i)))
    }
    GraftStoreRegistry.register("s_ts", st)
    try {
      val df = spark.read.format("graft-store")
        .option("store", "s_ts").option("topic", "tts").load()
        .filter(col("ts") >= lit(t(18)))
      assert(df.count() == 10, "only the last 6-hour window matches")
      val scan = scanOf(df)
      assert(scan.description().contains("GreaterThanOrEqual(ts"),
        s"ts predicate must push into the scan: ${scan.description()}")
      assert(scan.toBatch.planInputPartitions().length == 1,
        "three of four batches are zone-pruned by the ts range")
      // and the reported statistics shrink the same way (footer analog)
      val all = new GraftScan("s_ts", "tts", tsSchema, tsSchema,
        Array.empty).estimateStatistics()
      val filt = new GraftScan("s_ts", "tts", tsSchema, tsSchema,
        Array(GreaterThanOrEqual("ts", t(18)))).estimateStatistics()
      assert(all.numRows().getAsLong == 40L)
      assert(filt.numRows().getAsLong == 10L,
        "filter-aware statistics count only the surviving ts window")
      assert(filt.sizeInBytes().getAsLong < all.sizeInBytes().getAsLong)
    } finally GraftStoreRegistry.unregister("s_ts")
  }

  test("datetime literals compare across java.sql and java.time forms: stored Timestamp rows under a pushed Instant filter") {
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val tsSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    (0 until 4).foreach { b =>
      st.append("tmix", tsSchema,
        (0 until 10).map(i => Row(t(b * 6 + i % 6), b * 10L + i)))
    }
    GraftStoreRegistry.register("s_tmix", st)
    val prev = spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    // the java8 API flip makes Spark hand the pushed literal to the
    // source as java.time.Instant while the buffered rows still hold
    // java.sql.Timestamp — the reader must normalize both to the epoch
    // axis (a class-pair whitelist threw here and failed the query,
    // because pushed filters are fully consumed with no re-filter
    // above the scan)
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try {
      val df = spark.read.format("graft-store")
        .option("store", "s_tmix").option("topic", "tmix").load()
        .filter(col("ts") >= lit(t(18).toInstant))
      assert(df.count() == 10)
      val scan = scanOf(df)
      assert(scan.description().contains("GreaterThanOrEqual(ts"),
        s"the Instant literal must still push: ${scan.description()}")
      assert(scan.toBatch.planInputPartitions().length == 1,
        "zones prune identically under either datetime class")
      // and the unit eval path agrees in both directions
      val stats = new GraftScan("s_tmix", "tmix", tsSchema, tsSchema,
        Array(GreaterThanOrEqual("ts", t(18).toInstant))).estimateStatistics()
      assert(stats.numRows().getAsLong == 10L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.datetime.java8API.enabled", v)
        case None => spark.conf.unset("spark.sql.datetime.java8API.enabled")
      }
      GraftStoreRegistry.unregister("s_tmix")
    }
  }

  test("string zones: truncated footer-style bounds prune exactly when untruncated, conservatively when truncated") {
    import org.apache.spark.sql.sources._
    import graft.engine.StreamStore.strZoneOf
    import graft.sources.GraftZonePrune.mayMatch
    // untruncated zone: both bounds exact and inclusive
    val z = Map("s" -> strZoneOf("bb", "dd", hasNull = false).get)
    assert(mayMatch(z, Array[Filter](EqualTo("s", "bb"))) &&
      mayMatch(z, Array[Filter](EqualTo("s", "cc"))) &&
      mayMatch(z, Array[Filter](EqualTo("s", "dd"))))
    assert(!mayMatch(z, Array[Filter](EqualTo("s", "b"))) &&
      !mayMatch(z, Array[Filter](EqualTo("s", "dda"))))
    assert(!mayMatch(z, Array[Filter](GreaterThan("s", "dd"))) &&
      mayMatch(z, Array[Filter](GreaterThanOrEqual("s", "dd"))))
    assert(!mayMatch(z, Array[Filter](LessThan("s", "bb"))) &&
      mayMatch(z, Array[Filter](LessThanOrEqual("s", "bb"))))
    assert(mayMatch(z, Array[Filter](In("s", Array[Any]("aa", "cc")))) &&
      !mayMatch(z, Array[Filter](In("s", Array[Any]("aa", "ee")))))
    // truncated zone: 40-char values, 32-char bounds
    val zt = strZoneOf("b" * 40, "d" * 40, hasNull = false).get
    assert(zt.min == "b" * 32, "lower bound is the truncated prefix")
    assert(!zt.maxInclusive && zt.max == "d" * 31 + "e",
      s"upper bound increments the prefix's last unit: ${zt.max}")
    val zm = Map("s" -> zt)
    // sound: everything inside the true range is kept
    assert(mayMatch(zm, Array[Filter](EqualTo("s", "b" * 40))) &&
      mayMatch(zm, Array[Filter](EqualTo("s", "c" * 100))) &&
      mayMatch(zm, Array[Filter](EqualTo("s", "d" * 40))))
    // conservative: a value between the true max and the incremented
    // bound is kept (truncation loses exactness, never soundness)
    assert(mayMatch(zm, Array[Filter](EqualTo("s", "d" * 40 + "x"))))
    // pruning still fires beyond the truncated bounds
    assert(!mayMatch(zm, Array[Filter](EqualTo("s", "a"))) &&
      !mayMatch(zm, Array[Filter](EqualTo("s", "e"))))
    assert(!mayMatch(zm, Array[Filter](GreaterThanOrEqual("s", "e"))) &&
      !mayMatch(zm, Array[Filter](LessThan("s", "b"))))
    // all-Char.MaxValue prefix: no finite upper bound exists → unzoned
    assert(strZoneOf("a", Char.MaxValue.toString * 40, hasNull = false).isEmpty)
    // all-null batch: comparisons prune, IsNull keeps
    val zn = Map("s" -> strZoneOf(null, null, hasNull = true).get)
    assert(!mayMatch(zn, Array[Filter](EqualTo("s", "x"))) &&
      mayMatch(zn, Array[Filter](IsNull("s"))) &&
      !mayMatch(zn, Array[Filter](IsNotNull("s"))))
    // brute-force soundness sweep: for every 2-value batch and every
    // candidate literal, a pruned batch NEVER contains a match
    val pool = Seq("", "a", "ab", "b", "bz", "c" * 40, "c" * 40 + "a",
      "d", Char.MaxValue.toString)
    for (x <- pool; y <- pool; v <- pool) {
      val (mn, mx) = if (x.compareTo(y) <= 0) (x, y) else (y, x)
      strZoneOf(mn, mx, hasNull = false).foreach { zz =>
        val zs = Map("s" -> zz)
        val vals = Seq(x, y)
        def sound(f: Filter, matches: String => Boolean): Unit =
          assert(mayMatch(zs, Array(f)) || !vals.exists(matches),
            s"pruned a matching batch: $f over $vals")
        sound(EqualTo("s", v), _ == v)
        sound(GreaterThan("s", v), _.compareTo(v) > 0)
        sound(GreaterThanOrEqual("s", v), _.compareTo(v) >= 0)
        sound(LessThan("s", v), _.compareTo(v) < 0)
        sound(LessThanOrEqual("s", v), _.compareTo(v) <= 0)
      }
    }
    // end-to-end: a pushed string equality plans only the matching batch
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    st.append("t1", schema, (0L until 10L).map(i => Row(i, s"a$i", i)))
    st.append("t1", schema, (10L until 20L).map(i => Row(i, s"b${i - 10}", i)))
    GraftStoreRegistry.register("s_strz", st)
    try {
      val df = read("s_strz").filter(col("name") === "b3")
      assert(df.count() == 1)
      assert(scanOf(df).toBatch.planInputPartitions().length == 1,
        "the a-named batch is pruned by its string zone")
    } finally GraftStoreRegistry.unregister("s_strz")
  }

  test("runtime filterAttributes never advertise metadata columns") {
    freshStore("s_meta_attr")
    try {
      val withMeta = StructType(schema.fields :+
        StructField("_batch_offset", LongType, nullable = false))
      val scan = new GraftScan("s_meta_attr", "t1", schema, withMeta,
        Array.empty)
      assert(scan.filterAttributes().map(_.describe()).toSeq == Seq("k", "v"),
        "only DATA columns are runtime-filterable — a metadata In must " +
          "never occupy the runtime slot")
    } finally GraftStoreRegistry.unregister("s_meta_attr")
  }

  test("eviction between plan and execute: batch partitions fetch by absolute index — missing offsets, never misattributed rows") {
    val st = new StreamStore(maxBytesPerStream = 600,
      ttlMillis = Long.MaxValue / 2)
    st.append("t1", schema, (0L until 10L).map(i => Row(i, s"n$i", i)))
    st.append("t1", schema, (10L until 20L).map(i => Row(i, s"n$i", i)))
    GraftStoreRegistry.register("s_evrace", st)
    try {
      val withMeta = StructType(schema.fields :+
        StructField("_batch_offset", LongType, nullable = false))
      val scan = new GraftScan("s_evrace", "t1", schema, withMeta,
        Array.empty)
      val parts = scan.toBatch.planInputPartitions()
      assert(parts.length == 2)
      // eviction lands BETWEEN planning and reader creation
      st.append("t1", schema, (20L until 30L).map(i => Row(i, s"n$i", i)))
      assert(st.batchSlice("t1", 0, 1).isEmpty, "fixture must evict batch 0")
      val rf = scan.toBatch.createReaderFactory()
      val got = parts.flatMap { p =>
        val r = rf.createReader(p)
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (r.next()) buf += ((r.get().getLong(0), r.get().getLong(3)))
        buf.toSeq
      }
      // batch 0 surfaces as MISSING (drop-oldest contract); batch 1's
      // rows arrive intact and attributed to their true append index —
      // an ordinal read would have served batch 1's rows as batch 0
      assert(got.map(_._1).toSet == (10L until 20L).toSet,
        s"only the surviving planned batch's rows: ${got.map(_._1).sorted}")
      assert(got.forall(_._2 == 1L),
        s"provenance must stay absolute under eviction: $got")
    } finally GraftStoreRegistry.unregister("s_evrace")
  }

  test("double zones: a pushed value-range filter shrinks the estimate and statically prunes partitions") {
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val dSchema = StructType(Seq(
      StructField("value", DoubleType), StructField("v", LongType)))
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    // four batches covering disjoint value ranges [0,10), [10,20), ...
    (0 until 4).foreach { b =>
      st.append("dv", dSchema,
        (0 until 10).map(i => Row(b * 10.0 + i, b * 10L + i)))
    }
    GraftStoreRegistry.register("s_dbl", st)
    try {
      val df = spark.read.format("graft-store")
        .option("store", "s_dbl").option("topic", "dv").load()
        .filter(col("value") >= lit(30.0))
      assert(df.count() == 10, "only the last value window matches")
      val scan = scanOf(df)
      assert(scan.description().contains("GreaterThanOrEqual(value"),
        s"value predicate must push into the scan: ${scan.description()}")
      assert(scan.toBatch.planInputPartitions().length == 1,
        "three of four batches are zone-pruned by the value range")
      // filter-aware statistics shrink the same way, and the CBO
      // column stats carry the DOUBLE-boxed merged range
      val all = new GraftScan("s_dbl", "dv", dSchema, dSchema,
        Array.empty).estimateStatistics()
      val filt = new GraftScan("s_dbl", "dv", dSchema, dSchema,
        Array(GreaterThanOrEqual("value", 30.0))).estimateStatistics()
      assert(all.numRows().getAsLong == 40L)
      assert(filt.numRows().getAsLong == 10L,
        "filter-aware statistics count only the surviving value window")
      val cs = filt.columnStats().asScala.collectFirst {
        case (ref, st2) if ref.describe() == "value" => st2
      }
      assert(cs.exists(c => c.min().get() == java.lang.Double.valueOf(30.0) &&
        c.max().get() == java.lang.Double.valueOf(39.0)),
        s"double column stats must box the merged surviving range: $cs")
    } finally GraftStoreRegistry.unregister("s_dbl")
  }

  test("fractional semantics match Spark: NaN largest / NaN = NaN / -0.0 = 0.0 in pushed filters AND zones") {
    import graft.engine.StreamStore.DblZone
    import graft.sources.GraftZonePrune.mayMatch
    import org.apache.spark.sql.sources._
    val dSchema = StructType(Seq(
      StructField("value", DoubleType), StructField("v", LongType)))
    val st = new StreamStore(maxBytesPerStream = 1 << 20,
      ttlMillis = Long.MaxValue / 2)
    // batch 0: plain small values; batch 1: holds a NaN (zone max =
    // NaN under the engine order); batch 2: -0.0 only
    st.append("dn", dSchema, Seq(Row(1.0, 0L), Row(2.0, 1L)))
    st.append("dn", dSchema, Seq(Row(3.0, 2L), Row(Double.NaN, 3L)))
    st.append("dn", dSchema, Seq(Row(-0.0, 4L)))
    GraftStoreRegistry.register("s_nan", st)
    try {
      def read() = spark.read.format("graft-store")
        .option("store", "s_nan").option("topic", "dn").load()
      // Spark's NaN semantics: NaN > 100.0 is TRUE — the fully-consumed
      // pushed filter must agree (java.lang.Double.compare would too,
      // but the ZONE must not prune the NaN batch either)
      val gt = read().filter(col("value") > lit(100.0))
      assert(gt.select("v").collect().map(_.getLong(0)).toSet == Set(3L),
        "the NaN row is larger than any value under Spark semantics")
      assert(scanOf(gt).toBatch.planInputPartitions().length == 1,
        "only the NaN-holding batch survives the upper-side zone test")
      // -0.0 = 0.0: a pushed EqualTo(value, 0.0) must keep the stored
      // -0.0 row exactly as Spark's own evaluation would
      val eq = read().filter(col("value") === lit(0.0))
      assert(eq.select("v").collect().map(_.getLong(0)).toSet == Set(4L),
        "-0.0 equals 0.0 under Spark semantics — the pushed filter must not drop it")
      assert(scanOf(eq).toBatch.planInputPartitions().length == 1,
        "zones ordered by nanSafe compare keep exactly the -0.0 batch")
      // NaN equality: Spark says NaN = NaN is true
      val eqNaN = read().filter(col("value") === lit(Double.NaN))
      assert(eqNaN.select("v").collect().map(_.getLong(0)).toSet == Set(3L))
      // unit-level zone algebra
      val nanZone = Map[String, graft.engine.StreamStore.ColZone](
        "value" -> DblZone(3.0, Double.NaN, hasNull = false))
      assert(mayMatch(nanZone, Array(GreaterThan("value", 1e18))),
        "a NaN max keeps the batch under any upper-side predicate")
      assert(!mayMatch(nanZone, Array(LessThan("value", 3.0))),
        "the lower bound still prunes exactly")
      // an all-NaN batch zones to [+inf, NaN]: LessThan prunes (no row
      // can pass), GreaterThan keeps (every row passes)
      val allNaN = Map[String, graft.engine.StreamStore.ColZone](
        "value" -> DblZone(Double.PositiveInfinity, Double.NaN, hasNull = false))
      assert(!mayMatch(allNaN, Array(LessThan("value", 1e18))))
      assert(mayMatch(allNaN, Array(GreaterThan("value", 1e18))))
      // empty (all-null) batch: inverted range prunes value predicates,
      // IsNull keeps it
      val empty = Map[String, graft.engine.StreamStore.ColZone](
        "value" -> DblZone(Double.PositiveInfinity, Double.NegativeInfinity,
          hasNull = true))
      assert(!mayMatch(empty, Array(EqualTo("value", 5.0))))
      assert(mayMatch(empty, Array(IsNull("value"))))
      assert(!mayMatch(empty, Array(IsNotNull("value"))))
    } finally GraftStoreRegistry.unregister("s_nan")
  }
}
