package graft.tools
import org.apache.spark.sql.SparkSession
import graft.engine._
/** Cold/warm timing of the bench hot spots: the delta between run 1
  * and run 2 of the same plan is planning + codegen + JIT, the warm
  * number is the steady-state operator cost. */
object PerfProbe {
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
    // same warm-up as Bench
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$d/region.parquet").count()
      val a = spark.range(1000).toDF("id").withColumn("g", col("id") % 7)
      a.groupBy("g").count().count()
      a.join(broadcast(spark.range(10).toDF("g")), "g").count()
      a.repartition(2, col("g")).sortWithinPartitions("id").count()
    }
    val hot = Seq("q_dedup_minhash", "q_dedup_simhash", "q_agg_cube",
      "q_ann_ivf", "q_agg_approx_distinct", "q_dedup_ngram_jaccard",
      "q_embed_cosine_dup", "q_ann_lsh", "q_grouping_sets", "q_histogram")
    hot.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-26s cold ${times(0)}%6.2f  warm ${times(1)}%6.2f")
    }
    spark.stop()
  }
}
