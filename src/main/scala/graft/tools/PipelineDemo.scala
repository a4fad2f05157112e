package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.engine.{Ddl, StreamPipeline, StreamStore}
import java.sql.Timestamp
/** Dev-only end-to-end demo: Kafka-shaped stream → infer → parse →
  * bounded store → catalog serve → ASCII format (O1-O20 composed). */
object PipelineDemo {
  case class KMsg(key: String, value: String, timestamp: Timestamp, offset: Long, partition: Int)
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store = new StreamStore()
    val pipe = new StreamPipeline(store)
    val mem = MemoryStream[KMsg]
    val q = pipe.start(spark, mem.toDF(), "demo_topic", intervalMs = 100)
    mem.addData(
      KMsg("k1", """{"amount": 12, "item": "widget", "when": "2024-01-01T10:00:00Z"}""", Timestamp.valueOf("2024-01-01 10:00:00"), 0, 0),
      KMsg("k2", """{"amount": 3.5, "item": "gadget", "when": "2024-01-01T11:00:00Z"}""", Timestamp.valueOf("2024-01-01 10:00:01"), 1, 1))
    q.processAllAvailable(); q.stop()
    println("TOPICS=" + store.listTopics().mkString(","))
    println("SCHEMA=" + pipe.schemaFor("demo_topic").get.simpleString)
    println("DDL=" + Ddl.createTableSql("demo_topic", pipe.schemaFor("demo_topic").get))
    println(Ddl.formatTable(spark.table("demo_topic").orderBy("kafka_offset"), limit = 10))
    spark.stop()
  }
}
