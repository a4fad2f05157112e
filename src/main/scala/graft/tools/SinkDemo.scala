package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Sinks, Tables}
/** Dev-only: drive partitioned + JSON sinks end-to-end. */
object SinkDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_sinkdemo").toString
    Sinks.writePartitioned(Tables.events(spark, "/root/testdata/sf0.001"), s"$dir/p", "event_type")
    println("DIRS=" + new java.io.File(s"$dir/p").list().filter(_.startsWith("event_type=")).sorted.mkString(","))
    val back = spark.read.parquet(s"$dir/p").filter(col("event_type") === "purchase")
    println("PRUNED=" + back.queryExecution.executedPlan.toString.contains("PartitionFilters: [isnotnull(event_type"))
    println("ROWS=" + back.count())
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").select("doc_id","lang")
    Sinks.writeJsonLines(docs, s"$dir/j")
    println("JSON_ROUNDTRIP=" + (Sinks.readJsonLines(spark, s"$dir/j", docs.schema).count() == docs.count()))
    spark.stop()
  }
}
