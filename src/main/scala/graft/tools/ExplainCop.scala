package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainCop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: $n rows, ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    for (i <- 1 to 3) {
      t(s"scan#$i")(graft.engine.Tables.lineitem(spark, d).agg(sum("l_quantity")).count())
      t(s"baskets#$i")(graft.engine.Tables.lineitem(spark, d)
        .groupBy("l_orderkey").agg(sort_array(collect_set(col("l_partkey"))).as("ps")).count())
      t(s"copurchase#$i")(graft.engine.RelationalExt.qCopurchase(spark, d).count())
      t(s"triangle#$i")(graft.engine.RelationalExt.qTriangleCount(spark, d).count())
      t(s"linkpredict#$i")(graft.engine.RelationalExt.qLinkPredict(spark, d).count())
    }
    spark.stop()
  }
}
