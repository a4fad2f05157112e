package graft.engine

import org.apache.arrow.memory.{BufferAllocator, RootAllocator}
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import scala.jdk.CollectionConverters._

/** The reference's Arrow Flight serving surface re-expressed as an
  * in-process Arrow-IPC layer over the [[StreamStore]]:
  *
  *   - `listFlights`  ↔ FlightService/ListFlights (flight/server.go:82-117:
  *     one FlightInfo per live stream with row/byte counts)
  *   - `getSchema`    ↔ GetSchema (flight/server.go:119-146: the
  *     stream's Arrow schema, IPC-serialized)
  *   - `doGet`        ↔ DoGet (flight/server.go:171-245: every buffered
  *     RecordBatch streamed in order, one IPC message per batch)
  *
  * WHY NOT grpc: Flight's transport is gRPC; the flight-rpc +
  * grpc-java jars are NOT in the offline Spark 4.1.2 distribution
  * (only arrow-{vector,memory,format} 18.3.0 ship — see README).
  * The payloads a Flight server puts on the wire, however, are
  * exactly the Arrow IPC stream format this object produces, so a
  * transport drop-in inherits `doGet`'s bytes unchanged. Clients that
  * speak Arrow IPC (pyarrow.ipc, DuckDB's arrow scan, arrow-rs) read
  * these bytes as-is.
  *
  * Scale note: this serves the PARITY-MODE driver-side store (bounded
  * by GraftConfig.bufferLimitBytes per stream); the 100 TB serve path
  * is parquet/temp-view scans, as documented on StreamStore. */
object FlightServe {

  /** ListFlights row (flight/server.go:95-116: descriptor + total
    * rows/bytes per stream). */
  final case class FlightInfo(topic: String, rows: Long, bytes: Long, nBatches: Int)

  /** Spark→Arrow field mapping for every type the ingest pipeline
    * produces (string / long / int / double / boolean / timestamp /
    * binary — SchemaRules' closed lattice plus metadata columns). */
  private[engine] def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case StringType    => ArrowType.Utf8.INSTANCE
      case LongType      => new ArrowType.Int(64, true)
      case IntegerType   => new ArrowType.Int(32, true)
      case DoubleType    => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case BooleanType   => ArrowType.Bool.INSTANCE
      case BinaryType    => ArrowType.Binary.INSTANCE
      case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
      case other => throw new IllegalArgumentException(
        s"FlightServe: unsupported type $other for field ${f.name}")
    }
    new Field(f.name, new FieldType(f.nullable, t, null), java.util.Collections.emptyList())
  }

  def arrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(arrowField).toList.asJava)

  /** ListFlights: one info row per live stream. */
  def listFlights(store: StreamStore): Seq[FlightInfo] =
    store.listTopics().flatMap { t =>
      store.batchesOf(t).map { case (_, batches) =>
        FlightInfo(t, batches.map(_.size.toLong).sum, store.currentBytes(t), batches.size)
      }
    }

  /** GetSchema: the stream's schema in Arrow form. */
  def getSchema(store: StreamStore, topic: String): Option[ArrowSchema] =
    store.schemaOf(topic).map(arrowSchema)

  private def setValue(v: FieldVector, i: Int, value: Any): Unit = (v, value) match {
    case (x: VarCharVector, s: String)          => x.setSafe(i, s.getBytes("UTF-8"))
    case (x: BigIntVector, n: Long)             => x.setSafe(i, n)
    case (x: IntVector, n: Int)                 => x.setSafe(i, n)
    case (x: Float8Vector, n: Double)           => x.setSafe(i, n)
    case (x: BitVector, b: Boolean)             => x.setSafe(i, if (b) 1 else 0)
    case (x: VarBinaryVector, b: Array[Byte])   => x.setSafe(i, b)
    case (x: TimeStampMicroTZVector, ts: java.sql.Timestamp) =>
      x.setSafe(i, ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L)
    case (x: TimeStampMicroTZVector, inst: java.time.Instant) =>
      x.setSafe(i, inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
    case _ => throw new IllegalArgumentException(
      s"FlightServe: cannot write ${value.getClass} into ${v.getClass.getSimpleName}")
  }

  private def fillRoot(root: VectorSchemaRoot, schema: StructType, rows: Seq[Row]): Unit = {
    root.allocateNew()
    rows.zipWithIndex.foreach { case (row, i) =>
      schema.fields.indices.foreach { j =>
        val vec = root.getVector(j)
        if (row.isNullAt(j)) vec.setNull(i) else setValue(vec, i, row.get(j))
      }
    }
    root.setRowCount(rows.size)
  }

  /** DoGet: serialize every buffered batch of `topic` as ONE Arrow
    * IPC stream (schema message + one record batch per store batch,
    * preserving the reference's batch boundaries). Returns None for
    * an unknown stream — the NotFound status (flight/server.go:175). */
  def doGet(store: StreamStore, topic: String,
            allocator: BufferAllocator = defaultAllocator): Option[Array[Byte]] =
    store.batchesOf(topic).map { case (schema, batches) =>
      val root = VectorSchemaRoot.create(arrowSchema(schema), allocator)
      try {
        val bos = new ByteArrayOutputStream()
        val w = new ArrowStreamWriter(root, null, bos)
        w.start()
        batches.foreach { rows =>
          fillRoot(root, schema, rows)
          w.writeBatch()
        }
        w.end()
        w.close()
        bos.toByteArray
      } finally root.close()
    }

  /** Arrow→Spark field mapping — the inverse of [[arrowField]] over
    * the same closed type lattice, used by the DoPut ingest
    * direction. */
  private[engine] def sparkField(f: Field): StructField = {
    val t: DataType = f.getType match {
      case _: ArrowType.Utf8 => StringType
      case i: ArrowType.Int if i.getBitWidth == 64 => LongType
      case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
      case _: ArrowType.FloatingPoint => DoubleType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Binary => BinaryType
      case _: ArrowType.Timestamp => TimestampType
      case other => throw new IllegalArgumentException(
        s"FlightServe: unsupported Arrow type $other for field ${f.getName}")
    }
    StructField(f.getName, t, f.isNullable)
  }

  def sparkSchema(as: ArrowSchema): StructType =
    StructType(as.getFields.asScala.map(sparkField).toArray)

  private def fromArrow(v: Any): Any = v match {
    case t: org.apache.arrow.vector.util.Text => t.toString
    case other => other
  }

  /** DoPut: read ONE Arrow IPC stream from `in` and append each
    * record batch to `topic` (the reference's ingest-serve symmetry —
    * flight DoPut is the write half of DoGet). Values convert through
    * the same closed lattice as [[arrowField]]; timestamps arrive as
    * epoch-micros and land as java.time.Instant (what [[setValue]]
    * writes back out). Returns (rows, batches) appended. */
  def doPut(store: StreamStore, topic: String, in: java.io.InputStream,
            allocator: BufferAllocator = defaultAllocator): (Long, Int) = {
    val r = new ArrowStreamReader(in, allocator)
    try {
      val root0 = r.getVectorSchemaRoot
      val schema = sparkSchema(root0.getSchema)
      val tsIdx = schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == TimestampType => i
      }.toSet
      var rows = 0L
      var batches = 0
      while (r.loadNextBatch()) {
        val root = r.getVectorSchemaRoot
        val batch = (0 until root.getRowCount).map { i =>
          Row.fromSeq((0 until root.getFieldVectors.size()).map { j =>
            val raw = root.getVector(j).getObject(i)
            if (raw == null) null
            else if (tsIdx(j)) {
              val us = raw.asInstanceOf[java.lang.Long].longValue()
              java.time.Instant.ofEpochSecond(
                Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
            } else fromArrow(raw)
          })
        }
        store.append(topic, schema, batch)
        rows += batch.size
        batches += 1
      }
      (rows, batches)
    } finally r.close(false) // keep the source open: over a socket the
    // "OK" response still has to go out on the same connection
  }

  /** Client-side decode of a DoGet payload (what pyarrow.ipc /
    * arrow-rs would do): returns (schema, per-batch row values) with
    * Arrow-native values (UTF-8 Text, epoch-micros longs, …). */
  def readIpc(bytes: Array[Byte],
              allocator: BufferAllocator = defaultAllocator): (ArrowSchema, Seq[Seq[Seq[Any]]]) = {
    val r = new ArrowStreamReader(new ByteArrayInputStream(bytes), allocator)
    try {
      val schema = r.getVectorSchemaRoot.getSchema
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[Any]]]
      while (r.loadNextBatch()) {
        val root = r.getVectorSchemaRoot
        out += (0 until root.getRowCount).map { i =>
          (0 until root.getFieldVectors.size()).map { j =>
            root.getVector(j).getObject(i)
          }
        }
      }
      (schema, out.toSeq)
    } finally r.close()
  }

  private lazy val defaultAllocator: BufferAllocator = new RootAllocator()

  /** End-to-end Arrow-IPC serve roundtrip as an ORACLE-GATED query:
    * a deterministic fiftieth of orders lands in a store, DoGet
    * serializes the buffer as one Arrow IPC stream (the reference's
    * client wire format, flight/server.go:171-208), [[readIpc]]
    * decodes it client-side, and the decoded rows aggregate back in
    * Spark — any value corruption in the Arrow encode/decode path
    * breaks the DuckDB hash. Money rides as integer cents (the IPC
    * path carries them as Arrow BigInt, lossless by construction). */
  def qArrowRoundtrip(s: org.apache.spark.sql.SparkSession,
                      d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(500).foreach(rs => store.append("orders", schema, rs.toSeq))
    val bytes = doGet(store, "orders").get
    val (_, batches) = readIpc(bytes)
    val rows = batches.flatten.map { vs =>
      Row(vs(0).asInstanceOf[java.lang.Long].longValue(),
        vs(1).toString,
        vs(2).asInstanceOf[java.lang.Long].longValue())
    }
    s.createDataFrame(s.sparkContext.parallelize(rows.toList), schema)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum("cents").as("sum_cents"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("status")
  }

  /** The aggregate-pushdown serve path, differential-gated: a
    * deterministic orders slice lands in the store, the graft-store
    * V2 connector reads it, and the ungrouped COUNT/MIN/MAX
    * aggregation pushes COMPLETELY into the scan (no Aggregate node —
    * asserted: the buffer answers the summary itself, one row out,
    * the Flight-server analog of a summary action that never ships
    * batches). Any error in the pushdown evaluation breaks the
    * DuckDB hash. */
  def qStoreAggPushdown(s: org.apache.spark.sql.SparkSession,
                        d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(500).foreach(rs => store.append("orders", schema, rs.toSeq))
    graft.sources.GraftStoreRegistry.register("agg_push_store", store)
    try {
      val df = s.read.format("graft-store")
        .option("store", "agg_push_store").option("topic", "orders").load()
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderstatus")).as("n_status"),
          min("o_orderkey").as("min_key"),
          max("o_orderkey").as("max_key"),
          min("cents").as("min_cents"),
          max("cents").as("max_cents"))
      val out = df.collect().toSeq // settle before unregistering
      require(!df.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "store aggregation must push completely into the scan")
      s.createDataFrame(s.sparkContext.parallelize(out.toList), df.schema)
    } finally graft.sources.GraftStoreRegistry.unregister("agg_push_store")
  }

  /** One staged parquet dim per (JVM, sfDir) for the runtime-pruning
    * audit — a REAL parquet scan, because a literal LocalRelation dim
    * constant-folds during optimization and Spark's PartitionPruning
    * rule then sees no selective build side (the round-13 DPP
    * gotcha). */
  private val runtimeDims =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def ensureRuntimeDim(s: org.apache.spark.sql.SparkSession,
                               d: String): String =
    runtimeDims.computeIfAbsent(d, _ => {
      import org.apache.spark.sql.functions._
      val path = StagedPaths.tmp("graft_rtp_dim")
      Tables.orders(s, d).filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey").as("dk"))
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Runtime-filter (DPP-style) batch pruning through the V2 store
    * scan, differential-gated: the store lands a key-SORTED orders
    * slice in 50-row batches (so each buffered batch covers a
    * contiguous key range — the arrival-order clustering a CDC/append
    * stream naturally has), a staged parquet dimension joins it under
    * a selective bottom-third-of-the-key-domain predicate, and Spark's PartitionPruning
    * rule pushes the build side's IN-values into
    * [[graft.sources.GraftScan.filter]] at runtime — the scan's zone
    * check then PLANS ONLY the batches whose [min, max] key range can
    * match (asserted: the executed plan carries dynamicpruning AND
    * [[graft.sources.GraftScanMetrics]] shows fewer planned than
    * buffered batches). The reference ships whole buffers per DoGet
    * (flight/server.go:171-208); this is the join-driven analog of
    * Iceberg's runtime file pruning on the same buffer. The DuckDB
    * oracle replays the join from the parquet fixtures — pruning that
    * ever changed RESULTS would break the hash, pinning the
    * semantics-preserving contract runtime filters rely on. */
  def qStoreRuntimePrune(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.orders(s, d)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .orderBy("o_orderkey")
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(50).foreach(rs => store.append("orders", schema, rs.toSeq))
    graft.sources.GraftStoreRegistry.register("rtp_store", store)
    try {
      // scale-relative selectivity: the bottom third of the key domain
      // (a fixed cutoff would cover the whole domain at the smallest
      // SF and prune nothing); the 1-row max is a bounded collect
      val maxKey = Tables.orders(s, d)
        .agg(max("o_orderkey")).head().getLong(0)
      val dim = Tables.parquetMemo(s, ensureRuntimeDim(s, d))
        .filter(col("dk") < lit(maxKey / 3))
      val fact = s.read.format("graft-store")
        .option("store", "rtp_store").option("topic", "orders").load()
      val df = fact.join(broadcast(dim), col("o_orderkey") === col("dk"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          min("o_orderkey").as("min_key"), max("o_orderkey").as("max_key"))
        .orderBy("o_orderstatus")
      val out = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      require(plan.toLowerCase(java.util.Locale.ROOT).contains("dynamicpruning"),
        "the store scan must carry a runtime (DPP) filter")
      val (kept, total) = graft.sources.GraftScanMetrics
        .lastPlanned("rtp_store", "orders").getOrElse((0, 0))
      require(kept < total,
        s"runtime zone pruning must drop batches (planned $kept of $total)")
      s.createDataFrame(s.sparkContext.parallelize(out.toList), df.schema)
        .orderBy("o_orderstatus")
    } finally graft.sources.GraftStoreRegistry.unregister("rtp_store")
  }

  /** DuckDB oracle for [[qStoreRuntimePrune]]: the same join replayed
    * from the parquet fixtures with no store and no pruning — results
    * must be identical regardless of which batches were planned. */
  val storeRuntimePruneOracleSql: String =
    """WITH f AS (SELECT o_orderkey, o_orderstatus,
      |             CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      |           FROM orders WHERE o_orderkey % 10 = 0),
      |dm AS (SELECT o_orderkey AS dk FROM orders
      |       WHERE o_orderkey % 50 = 0
      |         AND o_orderkey < (SELECT MAX(o_orderkey) // 3 FROM orders))
      |SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |       CAST(MIN(f.o_orderkey) AS BIGINT) AS min_key,
      |       CAST(MAX(f.o_orderkey) AS BIGINT) AS max_key
      |FROM f JOIN dm ON dm.dk = f.o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** STATIC timestamp-zone pruning through the V2 store scan,
    * differential-gated: the store lands a ts-SORTED event slice in
    * contiguous-time batches (the arrival-order clustering every event
    * stream naturally has — each buffered batch covers a disjoint time
    * window, the buffer analog of time-partitioned files), and a plain
    * ts-range predicate — the hottest filter shape on any event
    * table — pushes into the scan as a Timestamp literal. Append-time
    * zones store epoch-micros min/max per batch, so planning keeps
    * ONLY the batches whose window intersects the range (asserted:
    * fewer planned than buffered, with the predicate visible under
    * PushedFilters) — at 100 TB this is parquet-footer time-range
    * skipping applied to the serving buffer, no row touched for the
    * pruned past. The cutoff is scale-relative (last third of the
    * fixture's time domain, floored to a whole second so the Spark
    * Timestamp literal and the DuckDB epoch arithmetic agree exactly);
    * the oracle replays the same range over the parquet fixture with
    * no store and no pruning — a zone bug that dropped or double-kept
    * a batch shifts counts and breaks the hash. */
  def qStoreTsPrune(s: org.apache.spark.sql.SparkSession,
                    d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("event_type"),
        expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .orderBy("ts", "event_id")
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(125).foreach(rs => store.append("events", schema, rs.toSeq))
    graft.sources.GraftStoreRegistry.register("tsp_store", store)
    try {
      // scale-relative cutoff: last third of the time domain, floored
      // to the second (1-row bounded collect; same arithmetic in the
      // oracle — positive micros, so truncating and floor division
      // agree)
      val b = Tables.events(s, d)
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx")).head()
      val cut = (b.getLong(0) + (b.getLong(1) - b.getLong(0)) * 2 / 3) /
        1000000L * 1000000L
      val cutTs = new java.sql.Timestamp(cut / 1000L)
      val df = s.read.format("graft-store")
        .option("store", "tsp_store").option("topic", "events").load()
        .filter(col("ts") >= lit(cutTs))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          min(unix_micros(col("ts"))).as("min_ts_us"),
          max(unix_micros(col("ts"))).as("max_ts_us"))
        .orderBy("event_type")
      val out = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("GreaterThanOrEqual(ts"),
        "the ts range must push into the store scan:\n" + plan.take(2000))
      val (kept, total) = graft.sources.GraftScanMetrics
        .lastPlanned("tsp_store", "events").getOrElse((0, 0))
      require(kept > 0 && kept < total,
        s"ts zones must statically prune batches (planned $kept of $total)")
      s.createDataFrame(s.sparkContext.parallelize(out.toList), df.schema)
        .orderBy("event_type")
    } finally graft.sources.GraftStoreRegistry.unregister("tsp_store")
  }

  /** DuckDB oracle for [[qStoreTsPrune]]: the same time-range rollup
    * replayed from the parquet fixture with no store and no pruning
    * (ts CAST to µs-TIMESTAMP first — the fixture file is ns-typed;
    * epoch arithmetic in BIGINT micros mirrors the Spark cutoff
    * exactly). */
  val storeTsPruneOracleSql: String =
    """WITH b AS (SELECT CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS mn,
      |                  CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS mx
      |           FROM events),
      |c AS (SELECT (mn + (mx - mn) * 2 // 3) // 1000000 * 1000000 AS cut FROM b)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS min_ts_us,
      |       CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS max_ts_us
      |FROM events, c WHERE epoch_us(CAST(ts AS TIMESTAMP)) >= cut
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** STATIC string-zone pruning through the V2 store scan,
    * differential-gated — the text sibling of [[qStoreTsPrune]]: the
    * store lands a NAME-SORTED customer slice in contiguous-range
    * batches, and a lexicographic range predicate on the string column
    * pushes into the scan. Append-time string zones (parquet-style
    * truncated bounds — untruncated here, TPC-H names fit the 32-char
    * budget) plan ONLY the batches whose [min, max] name range
    * intersects the predicate (asserted in-query: kept < total). The
    * cutoff is scale-relative (the zero-padded name at two-thirds of
    * the key domain, so lexicographic order coincides with numeric) and
    * the oracle replays the rollup from the parquet fixture with no
    * store and no pruning — a string-zone bug that dropped or
    * double-kept a batch shifts counts and breaks the hash. */
  def qStoreStrPrune(s: org.apache.spark.sql.SparkSession,
                     d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        expr("CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)").as("cents"))
      .orderBy("c_name")
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(40).foreach(rs => store.append("customer", schema, rs.toSeq))
    graft.sources.GraftStoreRegistry.register("strp_store", store)
    try {
      // cutoff from the NAME domain (the zero-padded numeric suffix),
      // not the key domain: derived benchmarking corpora shift keys
      // without re-deriving names, and a key-based cutoff would then
      // exceed every name and prune everything
      val maxName = Tables.customer(s, d)
        .agg(max(substring(col("c_name"), 10, 9).cast("long")))
        .head().getLong(0)
      val cutoff = f"Customer#${maxName * 2 / 3}%09d"
      val df = s.read.format("graft-store")
        .option("store", "strp_store").option("topic", "customer").load()
        .filter(col("c_name") >= lit(cutoff))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
          min("c_name").as("min_name"), max("c_name").as("max_name"))
        .orderBy("c_nationkey")
      val out = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("GreaterThanOrEqual(c_name"),
        "the name range must push into the store scan:\n" + plan.take(2000))
      val (kept, total) = graft.sources.GraftScanMetrics
        .lastPlanned("strp_store", "customer").getOrElse((0, 0))
      require(kept > 0 && kept < total,
        s"string zones must statically prune batches (planned $kept of $total)")
      s.createDataFrame(s.sparkContext.parallelize(out.toList), df.schema)
        .orderBy("c_nationkey")
    } finally graft.sources.GraftStoreRegistry.unregister("strp_store")
  }

  /** DuckDB oracle for [[qStoreStrPrune]]: the same lexicographic
    * range rollup replayed from the parquet fixture with no store and
    * no pruning (zero-padded names make the string cutoff exact in
    * both engines). */
  val storeStrPruneOracleSql: String =
    """WITH c AS (SELECT 'Customer#' ||
      |             lpad(CAST((SELECT MAX(CAST(substr(c_name, 10) AS BIGINT))
      |                        * 2 // 3 FROM customer)
      |                  AS VARCHAR), 9, '0') AS cut)
      |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       MIN(c_name) AS min_name, MAX(c_name) AS max_name
      |FROM customer, c WHERE c_name >= cut
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** STATIC double-zone pruning through the V2 store scan,
    * differential-gated — the fractional sibling of [[qStoreTsPrune]]:
    * the store lands a value-SORTED event slice in contiguous-range
    * batches, and a `value >= cut` range predicate — after `ts`, the
    * hottest pushed shape on the events fixture — pushes into the scan
    * as a Double literal. Append-time [[StreamStore.DblZone]] stats
    * (min/max under Spark's NaN-largest / -0.0 = 0.0 order) plan ONLY
    * the batches whose value range intersects the predicate (asserted
    * in-query: 0 < kept < total) — parquet-footer range skipping on
    * the one axis zones previously couldn't see. The cutoff is
    * scale-relative and derived through BIGINT cents (floor(v·100+0.5))
    * so Spark and DuckDB compute the IDENTICAL IEEE double before the
    * raw-double comparison; the oracle replays the rollup from the
    * parquet fixture with no store and no pruning — a double-zone bug
    * that dropped or double-kept a batch shifts counts and breaks the
    * hash. */
  def qStoreDblPrune(s: org.apache.spark.sql.SparkSession,
                     d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("value", "event_id")
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(125).foreach(rs => store.append("events", schema, rs.toSeq))
    graft.sources.GraftStoreRegistry.register("dblp_store", store)
    try {
      // scale-relative cutoff at two-thirds of the value domain,
      // computed in exact BIGINT cents and divided back once (1-row
      // bounded collect; the oracle runs the same integer arithmetic,
      // so both engines compare against the same double)
      val b = Tables.events(s, d)
        .agg(min(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("mn"),
          max(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("mx"))
        .head()
      val cut = (b.getLong(0) + (b.getLong(1) - b.getLong(0)) * 2 / 3) / 100.0
      val df = s.read.format("graft-store")
        .option("store", "dblp_store").option("topic", "events").load()
        .filter(col("value") >= lit(cut))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("sum_cents"),
          min("value").as("min_value"), max("value").as("max_value"))
        .orderBy("event_type")
      val out = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("GreaterThanOrEqual(value"),
        "the value range must push into the store scan:\n" + plan.take(2000))
      val (kept, total) = graft.sources.GraftScanMetrics
        .lastPlanned("dblp_store", "events").getOrElse((0, 0))
      require(kept > 0 && kept < total,
        s"double zones must statically prune batches (planned $kept of $total)")
      s.createDataFrame(s.sparkContext.parallelize(out.toList), df.schema)
        .orderBy("event_type")
    } finally graft.sources.GraftStoreRegistry.unregister("dblp_store")
  }

  /** DuckDB oracle for [[qStoreDblPrune]]: the same value-range rollup
    * replayed from the parquet fixture with no store and no pruning —
    * the cutoff built from the identical BIGINT-cents arithmetic, so
    * the boundary double agrees bit-for-bit. */
  val storeDblPruneOracleSql: String =
    """WITH b AS (SELECT MIN(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS mn,
      |                  MAX(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS mx
      |           FROM events),
      |c AS (SELECT (mn + (mx - mn) * 2 // 3) / 100.0 AS cut FROM b)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |       MIN(value) AS min_value, MAX(value) AS max_value
      |FROM events, c WHERE value >= cut
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The top-N-pushdown serve path, differential-gated: the V2
    * connector receives ORDER BY cents DESC, key ASC LIMIT 20 and
    * answers it INSIDE the scan (no TakeOrderedAndProject — asserted)
    * — the reference's client-side `--limit` (cmd/client.go:193)
    * moved into the server, with the sort the reference cannot do at
    * all (data is served in arrival order, stream/manager.go:376). */
  def qStoreTopNPushdown(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(500).foreach(rs => store.append("orders", schema, rs.toSeq))
    graft.sources.GraftStoreRegistry.register("topn_push_store", store)
    try {
      val df = s.read.format("graft-store")
        .option("store", "topn_push_store").option("topic", "orders").load()
        .orderBy(col("cents").desc, col("o_orderkey").asc)
        .limit(20)
      val out = df.collect().toSeq
      val plan = df.queryExecution.executedPlan.toString
      require(!plan.contains("TakeOrderedAndProject"),
        "top-N must push completely into the store scan")
      s.createDataFrame(s.sparkContext.parallelize(out.toList), df.schema)
        .orderBy(col("cents").desc, col("o_orderkey").asc)
    } finally graft.sources.GraftStoreRegistry.unregister("topn_push_store")
  }
}
