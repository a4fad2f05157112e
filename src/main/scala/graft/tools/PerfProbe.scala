package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    time("warmup read")(Tables.documents(spark, d).count())
    time("text_stats run1")(TextOps.qTextStats(spark, d).count())
    time("text_stats run2")(TextOps.qTextStats(spark, d).count())
    time("embed_dup run1")(VectorOps.qEmbedCosineDup(spark, d).count())
    time("embed_dup run2")(VectorOps.qEmbedCosineDup(spark, d).count())
    time("ngram run1")(TextOps.qDedupNgramJaccard(spark, d).count())
    time("ngram run2")(TextOps.qDedupNgramJaccard(spark, d).count())
    spark.stop()
  }
}
