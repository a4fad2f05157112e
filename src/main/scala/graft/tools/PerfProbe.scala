package graft.tools
import org.apache.spark.sql.{Column, SparkSession}
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
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    val corpus = TextOps.corpusWithDups(spark, d).select("doc_id", "text").cache()
    corpus.count()
    val withSh = corpus.withColumn("sh", TextOps.shingleHashes(TextOps.tokens(col("text")), 3))
      .filter(size(col("sh")) > 0).select("doc_id", "sh")
    // variant A: current 32 independent folds
    val sigA = withSh.withColumn("sig", TextOps.minhashSignature(col("sh"), 32))
    time("sigA 32 folds (cold)")(sigA)
    time("sigA 32 folds (warm)")(sigA)
    // variant B: one fold, 32-wide array accumulator
    val coeffs = TextOps.hashCoeffs(32)
    def sigB(sh: Column): Column = aggregate(
      sh, array_repeat(lit(TextOps.Prime), 32),
      (acc, x) => array(coeffs.zipWithIndex.map { case ((a, b), i) =>
        least(element_at(acc, i + 1), pmod(x * a + b, lit(TextOps.Prime)))
      }: _*))
    val dfB = withSh.withColumn("sig", sigB(col("sh")))
    time("sigB 1 fold 32-wide (cold)")(dfB)
    time("sigB 1 fold 32-wide (warm)")(dfB)
    spark.stop()
  }
}
