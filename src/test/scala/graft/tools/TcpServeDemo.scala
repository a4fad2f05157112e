package graft.tools

import graft.engine.{ArrowTcpServer, StreamStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Manual cross-process harness (Test scope, not shipped): binds an
  * ArrowTcpServer on the given port and blocks, so an external
  * pyarrow/DuckDB client in another process can exercise the wire
  * protocol. `sbt "Test/runMain graft.tools.TcpServeDemo 18137"`. */
object TcpServeDemo {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(18137)
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val st = new StreamStore()
    st.append("orders", schema, (0L until 3L).map(i => Row(s"k$i", i)))
    st.append("orders", schema, (3L until 5L).map(i => Row(s"k$i", i)))
    val srv = new ArrowTcpServer(st, port)
    println(s"SERVING ${srv.boundPort}")
    Thread.sleep(120000)
    srv.close()
  }
}
