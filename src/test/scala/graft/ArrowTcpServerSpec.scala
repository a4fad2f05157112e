package graft

import graft.engine.{ArrowTcpServer, FlightServe, StreamStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** The TCP Arrow-IPC serve endpoint: every command exercised by a
  * plain java.net.Socket client — the "external process" view — with
  * the GET payload decoded straight off the socket stream by
  * ArrowStreamReader, proving the wire bytes are a self-delimiting
  * Arrow stream any IPC client reads as-is. */
class ArrowTcpServerSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("v", LongType)))

  private def storeWith2Batches(): StreamStore = {
    val st = new StreamStore()
    st.append("orders", schema, (0L until 3L).map(i => Row(s"k$i", i)))
    st.append("orders", schema, (3L until 5L).map(i => Row(s"k$i", i)))
    st
  }

  private def send(port: Int, cmd: String): Socket = {
    val sock = new Socket("127.0.0.1", port)
    sock.getOutputStream.write(s"$cmd\n".getBytes(UTF_8))
    sock.getOutputStream.flush()
    sock
  }

  private def readAllText(sock: Socket): String =
    try new String(sock.getInputStream.readAllBytes(), UTF_8)
    finally sock.close()

  test("LIST returns one tab-separated info line per live stream") {
    val st = storeWith2Batches()
    st.append("other", StructType(Seq(StructField("a", LongType))), Seq(Row(1L)))
    val srv = new ArrowTcpServer(st)
    try {
      val resp = readAllText(send(srv.boundPort, "LIST")).split("\n").toSeq
      assert(resp.head == "OK 2")
      val byTopic = resp.tail.map(_.split("\t")).map(a => a(0) -> a).toMap
      assert(byTopic.keySet == Set("orders", "other"))
      assert(byTopic("orders")(1) == "5" && byTopic("orders")(3) == "2")
    } finally srv.close()
  }

  test("GET streams the exact doGet Arrow-IPC bytes, decodable off the socket") {
    val st = storeWith2Batches()
    val srv = new ArrowTcpServer(st)
    try {
      val sock = send(srv.boundPort, "GET orders")
      try {
        val r = new org.apache.arrow.vector.ipc.ArrowStreamReader(
          sock.getInputStream, new org.apache.arrow.memory.RootAllocator())
        try {
          val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
          val vals = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (r.loadNextBatch()) {
            val root = r.getVectorSchemaRoot
            sizes += root.getRowCount
            (0 until root.getRowCount).foreach { i =>
              vals += root.getVector(1).getObject(i)
                .asInstanceOf[java.lang.Long].longValue()
            }
          }
          assert(sizes.toSeq == Seq(3, 2), "one IPC batch per store batch")
          assert(vals.toSeq == (0L until 5L).toSeq)
        } finally r.close()
      } finally sock.close()
      // wire bytes == in-process doGet bytes (transport adds nothing)
      val sock2 = send(srv.boundPort, "GET orders")
      val wire = try sock2.getInputStream.readAllBytes() finally sock2.close()
      assert(java.util.Arrays.equals(wire, FlightServe.doGet(st, "orders").get))
    } finally srv.close()
  }

  test("SCHEMA returns a zero-batch IPC stream carrying the Arrow schema") {
    val st = storeWith2Batches()
    val srv = new ArrowTcpServer(st)
    try {
      val sock = send(srv.boundPort, "SCHEMA orders")
      try {
        val r = new org.apache.arrow.vector.ipc.ArrowStreamReader(
          sock.getInputStream, new org.apache.arrow.memory.RootAllocator())
        try {
          val as = r.getVectorSchemaRoot.getSchema
          assert(as.getFields.size() == 2)
          assert(as.findField("v").getType ==
            new org.apache.arrow.vector.types.pojo.ArrowType.Int(64, true))
          assert(!r.loadNextBatch(), "schema response carries no batches")
        } finally r.close()
      } finally sock.close()
    } finally srv.close()
  }

  test("unknown topic and malformed requests answer ERR; server survives") {
    val st = storeWith2Batches()
    val srv = new ArrowTcpServer(st)
    try {
      assert(readAllText(send(srv.boundPort, "GET nope")).startsWith("ERR not found"))
      assert(readAllText(send(srv.boundPort, "SCHEMA nope")).startsWith("ERR not found"))
      assert(readAllText(send(srv.boundPort, "FROB x")).startsWith("ERR bad request"))
      // still serving after errors
      assert(readAllText(send(srv.boundPort, "LIST")).startsWith("OK 1"))
    } finally srv.close()
  }

  test("qArrowTcpServe aggregates the socket-decoded rows (oracle shape)") {
    val df = ArrowTcpServer.qArrowTcpServe(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(df.columns.toSeq == Seq("status", "n", "sum_cents", "min_key", "max_key"))
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(4) >= r.getLong(3))
      assert(r.getLong(3) % 50 == 0 && r.getLong(4) % 50 == 0)
    }
  }

  test("PUT appends an Arrow IPC stream over the wire and GET reads it back") {
    val st = new StreamStore()
    val srv = new ArrowTcpServer(st)
    try {
      val sock = new Socket("127.0.0.1", srv.boundPort)
      try {
        val out = sock.getOutputStream
        out.write("PUT wired\n".getBytes(UTF_8))
        val alloc = new org.apache.arrow.memory.RootAllocator()
        try {
          val root = org.apache.arrow.vector.VectorSchemaRoot.create(
            FlightServe.arrowSchema(schema), alloc)
          try {
            val w = new org.apache.arrow.vector.ipc.ArrowStreamWriter(root, null, out)
            w.start()
            root.allocateNew()
            (0 until 3).foreach { i =>
              root.getVector(0).asInstanceOf[org.apache.arrow.vector.VarCharVector]
                .setSafe(i, s"p$i".getBytes(UTF_8))
              root.getVector(1).asInstanceOf[org.apache.arrow.vector.BigIntVector]
                .setSafe(i, i * 100L)
            }
            root.setRowCount(3)
            w.writeBatch()
            w.end()
          } finally root.close()
        } finally alloc.close()
        out.flush()
        val ack = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, UTF_8)).readLine()
        assert(ack == "OK 3 1", s"unexpected PUT ack: $ack")
      } finally sock.close()
      // the store now holds the pushed rows…
      val (sch, batches) = st.batchesOf("wired").get
      assert(sch.fieldNames.toSeq == Seq("k", "v"))
      assert(batches.flatten.map(r => (r.getString(0), r.getLong(1))) ==
        Seq(("p0", 0L), ("p1", 100L), ("p2", 200L)))
      // …and GET serves them back over a second connection
      val sock2 = send(srv.boundPort, "GET wired")
      try {
        val r = new org.apache.arrow.vector.ipc.ArrowStreamReader(
          sock2.getInputStream, new org.apache.arrow.memory.RootAllocator())
        try {
          assert(r.loadNextBatch())
          val root = r.getVectorSchemaRoot
          assert(root.getRowCount == 3)
          assert(root.getVector(1).getObject(2)
            .asInstanceOf[java.lang.Long].longValue() == 200L)
        } finally r.close()
      } finally sock2.close()
    } finally srv.close()
  }

  test("LIST <criteria> filters to topics containing the criteria string") {
    val st = storeWith2Batches()
    st.append("order_deltas", StructType(Seq(StructField("a", LongType))), Seq(Row(1L)))
    st.append("events", StructType(Seq(StructField("a", LongType))), Seq(Row(2L)))
    val srv = new ArrowTcpServer(st)
    try {
      val resp = readAllText(send(srv.boundPort, "LIST order")).split("\n").toSeq
      assert(resp.head == "OK 2", s"criteria must match orders + order_deltas: $resp")
      assert(resp.tail.map(_.split("\t")(0)).toSet == Set("orders", "order_deltas"))
      val none = readAllText(send(srv.boundPort, "LIST zebra")).split("\n").toSeq
      assert(none.head == "OK 0")
      // bare LIST stays unfiltered
      val all = readAllText(send(srv.boundPort, "LIST")).split("\n").toSeq
      assert(all.head == "OK 3")
    } finally srv.close()
  }

  test("ACTION carries the reference's two DoAction verbs; unknown types are unimplemented") {
    val st = storeWith2Batches()
    st.append("events", StructType(Seq(StructField("a", LongType))), Seq(Row(2L)))
    val srv = new ArrowTcpServer(st)
    try {
      assert(readAllText(send(srv.boundPort, "ACTION health")).trim == "OK OK")
      assert(readAllText(send(srv.boundPort, "ACTION listTopics")).trim ==
        "OK events,orders")
      val bad = readAllText(send(srv.boundPort, "ACTION reboot")).trim
      assert(bad.startsWith("ERR action reboot not implemented"))
    } finally srv.close()
  }
}
