package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine._
/** Dev-only: native vs HOF cosine micro-bench on the pair hot path. */
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
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s")
    }
    val emb = Tables.embeddings(spark, d).cache(); emb.count()
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))   // ~2M pairs at sf0.1
    val hof = pairs.select(VectorOps.cosine(
      transform(col("a"), _.cast("double")),
      transform(col("b"), _.cast("double"))).as("c"))
    val native = pairs.select(VectorOps.nativeCosine(spark, col("a"), col("b")).as("c"))
    time("HOF cosine 2M pairs")(hof)
    time("HOF cosine 2nd")(hof)
    time("native cosine 2M pairs")(native)
    time("native cosine 2nd")(native)
    spark.stop()
  }
}
