package graft.tools

/** Dev probe: print one oracle SQL by key (for piping into DuckDB
  * while iterating on a generated oracle without a full Verify run). */
object PrintOracle {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql(args(0)))
}
