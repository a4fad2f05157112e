package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.TextOps

/** Dev-only: stage timings for the simhash dedup pipeline at sf0.1. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    // warm
    TextOps.qDedupSimhash(spark, d).count()
    time("corpusWithDups scan")(TextOps.corpusWithDups(spark, d).count())
    time("simhash fingerprints")(TextOps.simhashFingerprints(
      TextOps.corpusWithDups(spark, d).select("doc_id", "text"), "doc_id", "text").count())
    time("full qDedupSimhash")(TextOps.qDedupSimhash(spark, d).count())
    time("full qDedupMinhash")(TextOps.qDedupMinhash(spark, d).count())
    time("minhash shingles only")(TextOps.corpusWithDups(spark, d)
      .select(col("doc_id"), TextOps.shingleHashes(TextOps.tokens(col("text")), 3).as("sh"))
      .count())
    spark.stop()
  }
}
