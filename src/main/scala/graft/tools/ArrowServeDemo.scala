package graft.tools

import graft.engine.{ArrowTcpServer, StreamStore}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Dev utility: stand up an [[ArrowTcpServer]] on a known port so an
  * EXTERNAL process (pyarrow, arrow-rs, DuckDB) can exercise the wire
  * protocol — LIST / SCHEMA / GET / PUT — against a live store.
  * Prints `PORT=<n>` and serves until killed (or for args(1) seconds
  * if given). */
object ArrowServeDemo {
  def main(args: Array[String]): Unit = {
    val port = if (args.nonEmpty) args(0).toInt else 0
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val store = new StreamStore()
    store.append("seed", schema, (0L until 4L).map(i => Row(s"k$i", i)))
    val srv = new ArrowTcpServer(store, port)
    println(s"PORT=${srv.boundPort}")
    Console.out.flush()
    val secs = if (args.length > 1) args(1).toLong else 3600L
    Thread.sleep(secs * 1000L)
    srv.close()
  }
}
