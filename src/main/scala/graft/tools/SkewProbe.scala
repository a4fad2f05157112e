package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe for q_skew_join_aqe: print the final adaptive plan of the
  * collapsed-key join under the query's skew confs (the lesson it
  * captured: AQE splits a skewed reducer partition by regrouping
  * MAPPER chunks, so a single-row-group parquet scan — one mapper —
  * makes the hot partition atomic; the upstream repartition is what
  * gives the join shuffle something to regroup). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.engine.ScaleOps.qSkewJoinAqe(s,
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.01")
    // scalastyle:off println
    println("=== RESULT ===")
    df.show(10, truncate = false)
    // scalastyle:on println
    s.stop()
  }
}
