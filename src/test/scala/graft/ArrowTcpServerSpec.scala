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
}
