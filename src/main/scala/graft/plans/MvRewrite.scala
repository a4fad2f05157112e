package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeReference, Cast, Expression, Floor, Literal, Multiply, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, lit, max, min, sum}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Materialized-view aggregate rewrite — the optimizer capability the
  * reference lacks entirely (SURVEY §4.1 "Optimizer: none"), expressed
  * as a genuine Catalyst `Rule[LogicalPlan]`: an `Aggregate` whose
  * grouping is a subset of a registered MV's grouping and whose
  * measures are re-aggregable (COUNT/MIN/MAX/SUM-of-exact-cents) is
  * redirected to scan the pre-aggregated MV and MERGE its partial
  * states (count→sum of counts, min→min of mins, …) — the classic
  * rollup-rewrite every warehouse optimizer ships, here over a parquet
  * summary ~10⁶× smaller than the fact table at 100 TB.
  *
  * Deliberately conf-gated and registry-scoped: the rewrite only
  * fires when `graft.mv.path` is set in the session conf AND the
  * aggregate's scan is rooted at `graft.mv.base` — a global rewrite
  * of every matching aggregate would silently change OTHER queries'
  * plans mid-suite, which is exactly the kind of spooky action a
  * verification pipeline can't tolerate. Semantics preservation is
  * oracle-checked (q_mv_rewrite's result must hash-match DuckDB
  * computing from the BASE table), and the rewrite's firing is
  * plan-asserted (the executed plan must scan the MV path).
  *
  * Matching is strict: a bare Project-of-attributes chain over one
  * parquet `LogicalRelation` under the base path, groupings drawn
  * from {l_returnflag, l_linestatus}, and every aggregate one of the
  * four registered templates. Anything else — a filter, an expression
  * projection, an unknown measure — bails to the normal plan. */
object MvAggregateRewrite extends Rule[LogicalPlan] {

  private def conf(key: String): String =
    org.apache.spark.sql.internal.SQLConf.get.getConfString(key, "")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvPath = conf("graft.mv.path")
    val base = conf("graft.mv.base")
    if (mvPath.isEmpty || base.isEmpty) return plan
    plan.transform {
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if isBareBaseScan(child, base) &&
            groupings.forall(g => g.isInstanceOf[AttributeReference] &&
              MvGroupCols.contains(g.asInstanceOf[AttributeReference].name)) &&
            groupings.nonEmpty =>
        rewrite(agg, groupings, aggExprs, mvPath).getOrElse(agg)
    }
  }

  private val MvGroupCols = Set("l_returnflag", "l_linestatus")

  /** child is Project-of-plain-attributes* over ONE parquet relation
    * rooted under `base` (no filters, no computed columns — the MV
    * pre-aggregates the FULL table). */
  private def isBareBaseScan(p: LogicalPlan, base: String): Boolean = p match {
    case Project(exprs, c) =>
      exprs.forall(_.isInstanceOf[AttributeReference]) && isBareBaseScan(c, base)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      // contains, not startsWith: rootPaths carry a scheme prefix
      // ("file:/…") the conf-supplied base path does not
      fs.location.rootPaths.exists(_.toString.contains(base))
    case _ => false
  }

  /** The exact-cents template [[graft.engine.Tables]]-style queries
    * use: floor(price · 100.0 + 0.5), possibly under a (no-op) long
    * cast the optimizer hasn't stripped. */
  private def isCentsOf(e: Expression, name: String): Boolean = e match {
    case Cast(f, LongType, _, _) => isCentsOf(f, name)
    case Floor(Add(Multiply(a: AttributeReference, Literal(m, DoubleType), _),
        Literal(h, DoubleType), _)) =>
      a.name == name && m == 100.0 && h == 0.5
    case _ => false
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      mvPath: String): Option[LogicalPlan] = {
    val groupNames = groupings.map(_.asInstanceOf[AttributeReference].name)
    // map each output column to its MV merge expression; bail on any
    // shape outside the registered templates
    val merged: Seq[Option[Column]] = aggExprs.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(col(a.name))
      case Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _), _) =>
        Some(coalesce(sum(col("mv_cnt")), lit(0L)))
      case Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _)
          if a.name == "l_extendedprice" =>
        Some(min(col("mv_min_price")))
      case Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _)
          if a.name == "l_extendedprice" =>
        Some(max(col("mv_max_price")))
      case Alias(AggregateExpression(Sum(e, _), _, false, None, _), _)
          if isCentsOf(e, "l_extendedprice") =>
        Some(sum(col("mv_sum_price_cents")))
      case _ => None
    }
    if (merged.exists(_.isEmpty)) return None
    val spark = SparkSession.active
    val cols = merged.flatten
    val mv = spark.read.parquet(mvPath)
    val groupedCols = groupNames.map(col)
    val nonGroup = aggExprs.zip(cols).collect {
      case (e, c) if !e.isInstanceOf[AttributeReference] => c.as(e.name)
    }
    if (nonGroup.isEmpty) return None // a pure DISTINCT — nothing to merge
    val rewrittenDf = mv.groupBy(groupedCols: _*)
      .agg(nonGroup.head, nonGroup.tail: _*)
      // restore the ORIGINAL output order (groupings may interleave)
      .select(aggExprs.map(e => col(e.name)): _*)
    val newPlan = rewrittenDf.queryExecution.analyzed
    // rebind the original output attribute ids so parents resolve
    val proj = agg.output.zip(newPlan.output).map { case (o: Attribute, n) =>
      Alias(Cast(n, o.dataType), o.name)(exprId = o.exprId)
    }
    Some(Project(proj, newPlan))
  }
}
