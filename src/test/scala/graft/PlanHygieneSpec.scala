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

  /** The quantile/classification family must never run an
    * unpartitioned window DIRECTLY over an entity-keyed aggregate
    * (|customers|/|users|/|parts| grow with the corpus and would
    * funnel through one task's sort): their global windows may only
    * sit on value-domain-bounded histograms (day counts, whole-dollar
    * grids). Guarded structurally: for each key, every unpartitioned
    * logical Window's nearest descendant Aggregate must not group by
    * an entity key. */
  test("no unpartitioned window over an entity-keyed aggregate (quantile family)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val entityKeys =
      Seq("custkey", "user_id", "partkey", "orderkey", "suppkey", "doc_id")
    val keys = Seq("q_rfm", "q_lorenz", "q_lift_gains", "q_abc_class")
    val bad = keys.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty =>
          w.child.collectFirst { case a: Aggregate => a }.flatMap { a =>
            val refs = a.groupingExpressions
              .flatMap(_.references.map(_.name.toLowerCase))
            val hits = refs.filter(r => entityKeys.exists(r.contains))
            if (hits.nonEmpty) Some(s"$name grouping=$refs") else None
          }
      }.flatten
    }
    assert(bad.isEmpty,
      s"unpartitioned window over an entity-keyed aggregate: $bad")
  }
}
