package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val c = spark.read.parquet(s"$d/customer.parquet").select(
      col("c_custkey"), col("c_name"),
      (col("c_custkey") / 100).cast("long").as("blk"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"LEVPROBE $tag n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val j = c.repartition(col("blk")).alias("a")
      .join(broadcast(c).alias("b"),
        col("a.blk") === col("b.blk") && col("a.c_custkey") =!= col("b.c_custkey"))
    time("join_only")(j.count())
    time("join_only2")(j.count())
    time("lev")(j.select(levenshtein(col("a.c_name"), col("b.c_name")).as("l")).filter(col("l") <= 1).count())
    time("lev2")(j.select(levenshtein(col("a.c_name"), col("b.c_name")).as("l")).filter(col("l") <= 1).count())
    time("lev_thresh")(j.select(levenshtein(col("a.c_name"), col("b.c_name"), 1).as("l")).filter(col("l") >= 0).count())
    spark.stop()
  }
}
