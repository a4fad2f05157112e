package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.engine.StreamingOps
import java.sql.Timestamp
/** Dev-only: drive the streaming near-dup filter end-to-end. */
object NearDupDemo {
  case class Doc(ts: Timestamp, doc_id: Long, text: String)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingOps.streamingNearDupFilter(mem.toDF(), "ts", "text", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("nd").start()
    mem.addData(Doc(Timestamp.valueOf("2024-01-01 10:00:00"), 1, "alpha beta gamma delta"))
    q.processAllAvailable()
    mem.addData(
      Doc(Timestamp.valueOf("2024-01-01 10:10:00"), 2, "alpha beta gamma delta"),
      Doc(Timestamp.valueOf("2024-01-01 10:11:00"), 3, "totally different words here"))
    q.processAllAvailable(); q.stop()
    println("KEPT=" + spark.table("nd").select("doc_id").collect().map(_.getLong(0)).sorted.mkString(","))
    spark.stop()
  }
}
