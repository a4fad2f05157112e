package graft.tools
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reps = sys.env.getOrElse("TIMEQ_RUNS", "3").toInt
    names.foreach { n =>  // warm + N timed, report each + min
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      val ts = (1 to reps).map { i =>
        // drop cached localCheckpoint blocks from the previous run so
        // storage-memory churn doesn't inflate later repetitions
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"TIMEQ $n run$i $dt%.3f s")
        dt
      }
      println(f"TIMEQ $n min ${ts.min}%.3f s")
    }
    spark.stop()
  }
}
