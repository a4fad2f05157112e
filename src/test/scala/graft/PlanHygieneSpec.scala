package graft

/** Plan-level hygiene asserted over the ENTIRE query inventory: no
  * query may plan a true `CartesianProduct` (the non-broadcast cross
  * join whose cost is |L|·|R| rows — the one join shape that cannot
  * survive a 100× scale-up). `BroadcastNestedLoopJoin` is NOT flagged:
  * every occurrence in this inventory is a deliberate
  * `crossJoin(broadcast(<1-row aggregate>))` (a scalar fan-in, cost
  * |L|), which is the documented idiom for attaching corpus totals.
  * The check reads the physical plan WITHOUT executing it, so it
  * covers all queries at planning cost.
  *
  * Queries whose construction runs eager work (driver-loop graph
  * iterations, streaming sinks, file roundtrips) still only plan
  * their FINAL DataFrame here — that final plan is exactly what
  * would scale with data volume. */
class PlanHygieneSpec extends SparkSuite {

  /** The one deliberate exception: the planning-class demo whose
    * POINT is the CartesianProduct node (bounded 25×5 sides). */
  private val intendedCartesian = Set("q_cross_join")

  test("no query plans a non-broadcast CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !intendedCartesian(name) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"queries planning a true cartesian product: $offenders")
  }
}
