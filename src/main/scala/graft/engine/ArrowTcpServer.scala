package graft.engine

import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** A network-reachable Arrow-IPC serving endpoint over the
  * [[StreamStore]] — the reference's remote-client surface
  * (flight/server.go:82-245) WITHOUT gRPC: Flight's transport jars
  * (flight-rpc, grpc-java) are not in the offline Spark distribution,
  * but the bytes a Flight server puts on the wire for DoGet are
  * exactly the Arrow IPC stream format [[FlightServe.doGet]] already
  * produces. This class gives those bytes a live `localhost:port`
  * socket with zero new dependencies, so an external pyarrow /
  * DuckDB / arrow-rs client can connect, list topics, fetch a
  * schema, and stream record batches.
  *
  * Protocol (one request per connection, HTTP/1.0-style — the
  * response framing is the Arrow stream format itself, which is
  * self-delimiting via its end-of-stream marker):
  *
  *   - `LIST\n`          → UTF-8 text: `OK <n>\n` then n lines
  *                          `<topic>\t<rows>\t<bytes>\t<nBatches>\n`
  *   - `LIST <criteria>\n` → same, filtered to topics CONTAINING the
  *                          criteria string (ListFlights' criteria
  *                          expression, app-defined bytes in Flight)
  *   - `ACTION health\n`  → `OK OK\n`; `ACTION listTopics\n` →
  *                          `OK <t1,t2,…>\n` (sorted) — the
  *                          reference's two DoAction verbs; other
  *                          types → `ERR action … not implemented\n`
  *   - `SCHEMA <topic>\n` → raw Arrow IPC stream, schema message +
  *                          EOS, zero batches (what GetSchema carries)
  *   - `GET <topic>\n`    → raw Arrow IPC stream, schema + one record
  *                          batch per buffered store batch (identical
  *                          bytes to [[FlightServe.doGet]])
  *   - `PUT <topic>\n` + raw Arrow IPC stream body
  *                        → appends every record batch to the topic
  *                          (the DoPut ingest half of the reference's
  *                          ingest-serve symmetry), replies
  *                          `OK <rows> <batches>\n`
  *   - unknown topic      → `ERR not found\n`
  *   - malformed request  → `ERR bad request\n`
  *
  * A pyarrow client is three lines:
  * {{{
  *   sock.sendall(b"GET orders\n")
  *   reader = pyarrow.ipc.open_stream(sock.makefile("rb"))
  *   table = reader.read_all()
  * }}}
  *
  * Scale note: like [[FlightServe]], this serves the bounded
  * parity-mode store (GraftConfig.bufferLimitBytes per stream); the
  * 100 TB serve path stays parquet/temp-view scans. The accept loop
  * and per-connection handlers run on daemon threads so an
  * embedding JVM exits cleanly. */
final class ArrowTcpServer(store: StreamStore, port: Int = 0)
    extends AutoCloseable {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", port))

  /** The bound (possibly ephemeral) port clients connect to. */
  val boundPort: Int = server.getLocalPort

  @volatile private var running = true

  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-arrow-tcp-conn")
      t.setDaemon(true)
      t
    })

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        pool.submit(new Runnable { def run(): Unit = handle(sock) })
        ()
      } catch {
        case _: Throwable if !running => // closed during shutdown
        case _: Throwable => // transient accept/submit failure: the
          // acceptor must survive (a dead acceptor leaves a bound
          // port that never serves again); drop this connection only
      }
    }
  }, "graft-arrow-tcp-accept")
  acceptor.setDaemon(true)
  acceptor.start()

  private def text(out: OutputStream, s: String): Unit =
    out.write(s.getBytes(UTF_8))

  /** Read the request line byte-by-byte from the RAW stream — a
    * BufferedReader would read ahead and swallow the Arrow IPC body
    * that follows a PUT line. */
  private def readLine(in: java.io.InputStream, max: Int = 4096): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c >= 0 && c != '\n' && sb.length < max) {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  private def handle(sock: Socket): Unit = {
    try {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      val line = readLine(in)
      line.trim.split("\\s+", 2) match {
        case Array("LIST") =>
          val infos = FlightServe.listFlights(store)
          text(out, s"OK ${infos.size}\n")
          infos.foreach { i =>
            text(out, s"${i.topic}\t${i.rows}\t${i.bytes}\t${i.nBatches}\n")
          }
        case Array("LIST", criteria) =>
          // ListFlights criteria (flight/server.go:82 accepts the
          // expression; Flight leaves its bytes app-defined): here a
          // topic-substring filter — the natural criteria for a
          // topic-per-table store.
          val infos = FlightServe.listFlights(store)
            .filter(_.topic.contains(criteria.trim))
          text(out, s"OK ${infos.size}\n")
          infos.foreach { i =>
            text(out, s"${i.topic}\t${i.rows}\t${i.bytes}\t${i.nBatches}\n")
          }
        case Array("ACTION", actionType) =>
          // DoAction verbs, exactly the reference's two
          // (flight/server.go:233-245): health → "OK", listTopics →
          // comma-joined topic names; anything else unimplemented.
          actionType.trim match {
            case "health"     => text(out, "OK OK\n")
            case "listTopics" =>
              text(out, s"OK ${store.listTopics().sorted.mkString(",")}\n")
            case other => text(out, s"ERR action $other not implemented\n")
          }
        case Array("SCHEMA", topic) =>
          store.schemaOf(topic) match {
            case Some(schema) =>
              // An IPC stream with zero batches: schema message + EOS.
              val root = org.apache.arrow.vector.VectorSchemaRoot.create(
                FlightServe.arrowSchema(schema), allocator)
              try {
                val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null, out)
                w.start(); w.end(); w.close()
              } finally root.close()
            case None => text(out, "ERR not found\n")
          }
        case Array("GET", topic) =>
          FlightServe.doGet(store, topic, allocator) match {
            case Some(bytes) => out.write(bytes)
            case None        => text(out, "ERR not found\n")
          }
        case Array("PUT", topic) =>
          // DoPut: the rest of the connection is one Arrow IPC
          // stream; every record batch appends to the topic.
          try {
            val (rows, batches) = FlightServe.doPut(store, topic, in, allocator)
            text(out, s"OK $rows $batches\n")
          } catch {
            case e: Exception =>
              text(out, s"ERR put failed: ${e.getClass.getSimpleName}\n")
          }
        case _ => text(out, "ERR bad request\n")
      }
      out.flush()
    } catch {
      case _: Throwable => // client went away mid-response
    } finally {
      try sock.close() catch { case _: Throwable => }
    }
  }

  private val allocator =
    new org.apache.arrow.memory.RootAllocator()

  override def close(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => }
    pool.shutdown()
    // direct Arrow memory is not GC-reclaimed — release it with the
    // endpoint (waiting briefly for in-flight handlers to drain)
    try {
      pool.awaitTermination(2, java.util.concurrent.TimeUnit.SECONDS)
      allocator.close()
    } catch { case _: Throwable => }
  }
}

object ArrowTcpServer {

  /** The TCP serve path as an ORACLE-GATED query: the same
    * deterministic orders slice as [[FlightServe.qArrowRoundtrip]]
    * lands in a store, an [[ArrowTcpServer]] binds an ephemeral
    * localhost port, and a PLAIN `java.net.Socket` client — no graft
    * classes on the "wire" side beyond the Arrow reader any IPC
    * client embeds — sends `GET orders\n` and decodes the response
    * directly off the socket stream with ArrowStreamReader. The
    * decoded rows re-aggregate in Spark against the DuckDB oracle:
    * any corruption in the socket framing or IPC encode/decode
    * breaks the hash. */
  def qArrowTcpServe(s: org.apache.spark.sql.SparkSession,
                     d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Row
    val sub = Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val schema = sub.schema
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    sub.collect().grouped(500).foreach(rs => store.append("orders", schema, rs.toSeq))
    val srv = new ArrowTcpServer(store)
    val rows =
      try socketGet(srv.boundPort, "orders")
      finally srv.close()
    s.createDataFrame(s.sparkContext.parallelize(rows), schema)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum("cents").as("sum_cents"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("status")
  }

  /** Plain-socket GET client: sends `GET <topic>`, decodes the IPC
    * response off the stream, closes its allocator. */
  private def socketGet(port: Int, topic: String): List[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.Row
    val sock = new Socket("127.0.0.1", port)
    try {
      sock.getOutputStream.write(s"GET $topic\n".getBytes(UTF_8))
      sock.getOutputStream.flush()
      val alloc = new org.apache.arrow.memory.RootAllocator()
      try {
        val r = new org.apache.arrow.vector.ipc.ArrowStreamReader(
          sock.getInputStream, alloc)
        try {
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (r.loadNextBatch()) {
            val root = r.getVectorSchemaRoot
            (0 until root.getRowCount).foreach { i =>
              out += Row(
                root.getVector(0).getObject(i)
                  .asInstanceOf[java.lang.Long].longValue(),
                root.getVector(1).getObject(i).toString,
                root.getVector(2).getObject(i)
                  .asInstanceOf[java.lang.Long].longValue())
            }
          }
          out.toList
        } finally r.close()
      } finally alloc.close()
    } finally sock.close()
  }

  /** The DoPut ingest path as an ORACLE-GATED query — the write half
    * of the reference's ingest-serve symmetry over the same real
    * socket: a deterministic orders slice is IPC-serialized by a
    * plain-socket CLIENT writer into `PUT orders`, the server appends
    * it to a fresh store through [[FlightServe.doPut]] (exercising
    * the Arrow→Spark reverse mapping), and a second connection GETs
    * the bytes back for the aggregate — both wire directions in one
    * differential: corruption in either framing, the IPC encode, or
    * the type round-trip breaks the DuckDB hash. */
  def qArrowTcpPut(s: org.apache.spark.sql.SparkSession,
                   d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sub = Tables.orders(s, d)
      .filter(col("o_orderkey") % 50 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)").as("cents"))
    val schema = sub.schema
    val data = sub.collect()
    val store = new StreamStore(1L << 30, Long.MaxValue / 2)
    val srv = new ArrowTcpServer(store)
    val rows =
      try {
        val sock = new Socket("127.0.0.1", srv.boundPort)
        try {
          val out = sock.getOutputStream
          out.write("PUT orders\n".getBytes(UTF_8))
          val alloc = new org.apache.arrow.memory.RootAllocator()
          try {
            val root = org.apache.arrow.vector.VectorSchemaRoot.create(
              FlightServe.arrowSchema(schema), alloc)
            try {
              val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null, out)
              w.start()
              data.grouped(500).foreach { batch =>
                root.allocateNew()
                batch.zipWithIndex.foreach { case (r, i) =>
                  root.getVector(0)
                    .asInstanceOf[org.apache.arrow.vector.BigIntVector]
                    .setSafe(i, r.getLong(0))
                  root.getVector(1)
                    .asInstanceOf[org.apache.arrow.vector.VarCharVector]
                    .setSafe(i, r.getString(1).getBytes(UTF_8))
                  root.getVector(2)
                    .asInstanceOf[org.apache.arrow.vector.BigIntVector]
                    .setSafe(i, r.getLong(2))
                }
                root.setRowCount(batch.size)
                w.writeBatch()
              }
              w.end() // EOS marker only — the socket stays open for the ack
            } finally root.close()
          } finally alloc.close()
          out.flush()
          val ack = new String(sock.getInputStream.readNBytes(3), UTF_8)
          require(ack == "OK ", s"PUT not acknowledged: $ack")
        } finally sock.close()
        socketGet(srv.boundPort, "orders")
      } finally srv.close()
    s.createDataFrame(s.sparkContext.parallelize(rows), schema)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        sum("cents").as("sum_cents"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      .orderBy("status")
  }
}
