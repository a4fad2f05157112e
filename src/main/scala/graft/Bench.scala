package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: the first action in a fresh session pays several
    // seconds of one-time initialization (whole-stage-codegen compiler,
    // shuffle machinery, parquet reader pools, broadcast threads) that
    // previously landed entirely on the alphabetically-first query.
    // Exercise each machine once on tiny inputs so the per-query
    // numbers measure the operators, not session startup.
    locally {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/region.parquet").count()
      val a = spark.range(1000).toDF("id").withColumn("g", col("id") % 7)
      a.groupBy("g").count().count()
      a.join(broadcast(spark.range(10).toDF("g")), "g").count()
      a.repartition(2, col("g")).sortWithinPartitions("id").count()
    }
    // stable alphabetical order: Map iteration order varies across
    // builds, which made per-query timings incomparable across rounds
    // (each query's time includes position-dependent JIT/GC warmup)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
