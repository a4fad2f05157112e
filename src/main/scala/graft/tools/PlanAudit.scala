package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: dump plan-health signals for every contract query. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        // collect() executes THIS queryExecution (count() would plan a
        // separate one), so the audit sees AQE's FINAL plan with its
        // codegen stages
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val exchanges = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition".r
          .findAllIn(plan).size
        // codegen stages render as "*(n) Node" in the tree string
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        val flags = Seq(
          if (plan.contains("BroadcastHashJoin")) "BHJ" else "",
          if (plan.contains("SortMergeJoin")) "SMJ" else "",
          if (plan.contains("PushedFilters: [") &&
              !plan.contains("PushedFilters: []")) "PUSH" else "",
          if (plan.contains("TakeOrderedAndProject")) "TOPN" else "",
          if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin")) "!!CARTESIAN" else "",
          if (plan.contains("InMemoryTableScan")) "CACHE" else ""
        ).filter(_.nonEmpty).mkString(",")
        println(f"$name%-24s exch=$exchanges%-3d codegen=$wsc%-3d $flags")
      } catch { case e: Throwable => println(f"$name%-24s AUDIT-ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
