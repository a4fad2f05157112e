package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._
/** Stage decomposition of q_dedup_simhash at sf0.1. */
object PerfProbe2 {
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
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warm-up
    spark.read.parquet(s"$d/documents.parquet").count()
    time("corpusWithDups")(TextOps.corpusWithDups(spark, d).count())
    time("corpusWithDups x2")(TextOps.corpusWithDups(spark, d).count())
    val corpus = TextOps.corpusWithDups(spark, d).select("doc_id", "text")
    time("fingerprints")(
      TextOps.simhashFingerprints(corpus, "doc_id", "text").count())
    time("fingerprints x2")(
      TextOps.simhashFingerprints(corpus, "doc_id", "text").count())
    val fps = TextOps.simhashFingerprints(corpus, "doc_id", "text")
    val chunks = fps.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("fp"), c * 16).bitwiseAND(0xFFFF).as("ch"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("fp"), col("b.chunk"), col("b.ch"))
    time("chunks")(chunks.count())
    val l = chunks.select(col("chunk"), col("ch"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val r = chunks.select(col("chunk"), col("ch"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val joined = l.join(r, Seq("chunk", "ch")).filter(col("doc_a") < col("doc_b"))
    time("bucket join")(joined.count())
    time("bucket join x2")(joined.count())
    val ham = joined
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).cast("long"))
      .filter(col("hamming") <= 8)
    time("+hamming filter")(ham.count())
    time("+distinct+sort")(ham.select("doc_a", "doc_b", "hamming").distinct()
      .orderBy("doc_a", "doc_b").count())
    time("full query")(TextOps.qDedupSimhash(spark, d).count())
    spark.stop()
  }
}
