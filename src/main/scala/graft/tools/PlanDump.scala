package graft.tools

/** Dumps `.explain("formatted")` for the named queries to
  * `<outDir>/<key>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/. Uses the shared
  * BenchProtocol session (AQE on, shuffle partitions = cpus) so the
  * captured plan is the one the bench actually runs.
  *
  * Usage: runMain graft.tools.PlanDump <keys,csv> <outDir> <tag> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val outDir = new java.io.File(args(1))
    val tag = args(2)
    val d = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    outDir.mkdirs()
    val spark = graft.BenchProtocol.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(new java.io.File(outDir, s"${n}_$tag.txt"))
        try w.println(txt) finally w.close()
        println(s"PLANDUMP $n ok (${txt.length} chars)")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP $n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
