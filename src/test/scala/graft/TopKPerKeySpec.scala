package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.plans.TopKPerKey

/** The custom physical operator (logical node + strategy + exec):
  * exactness vs the window-rank formulation, plan shape, and
  * partitioning invariance. */
class TopKPerKeySpec extends SparkSuite {

  private def dailyCounts = Tables.events(spark, sf)
    .select((unix_timestamp(col("ts")) / 21600).cast("long").as("w"),
      col("user_id"))
    .groupBy("w", "user_id").agg(count(lit(1)).as("n"))

  test("top-k per key matches the window-rank formulation exactly") {
    val viaOp = TopKPerKey.topKPerKey(dailyCounts, Seq("w"),
      Seq(("n", false), ("user_id", true)), 3)
      .orderBy("w", "user_id").collect().map(_.toString)
    val wdw = org.apache.spark.sql.expressions.Window
      .partitionBy("w").orderBy(col("n").desc, col("user_id"))
    val viaWindow = dailyCounts
      .withColumn("rn", row_number().over(wdw))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("w", "user_id").collect().map(_.toString)
    assert(viaOp.sameElements(viaWindow),
      s"operator and window rank disagree:\n${viaOp.take(5).mkString("\n")}")
  }

  test("plan: two heap passes, a planner-inserted exchange, no WindowExec") {
    val df = TopKPerKey.topKPerKey(dailyCounts, Seq("w"),
      Seq(("n", false), ("user_id", true)), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // exec nodes render as "TopKPerKey [keys], [orders], k, partial"
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2,
      s"expected partial+final exec:\n${plan.take(1500)}")
    assert(plan.contains("Exchange hashpartitioning"),
      s"EnsureRequirements must insert the key shuffle:\n${plan.take(1500)}")
    assert(!plan.contains("WindowExec"), "no per-key sort window")
  }

  test("result is invariant to input partitioning (partial pass is a combiner)") {
    val base = dailyCounts
    val a = TopKPerKey.topKPerKey(base, Seq("w"),
      Seq(("n", false), ("user_id", true)), 3)
      .collect().map(_.toString).sorted
    val b = TopKPerKey.topKPerKey(base.repartition(17), Seq("w"),
      Seq(("n", false), ("user_id", true)), 3)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("k larger than any group degrades to identity") {
    val all = TopKPerKey.topKPerKey(dailyCounts, Seq("w"),
      Seq(("n", false), ("user_id", true)), 1000000)
      .count()
    assert(all == dailyCounts.count())
  }
}
