package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, If, IsNull, Literal, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (the custom-operator ladder's option (c) plumbing,
  * here a genuine `Rule[LogicalPlan]`): fold self-similarity.
  *
  * `graft_jaccard_sorted(a, a)` over a deterministic `a` is decided
  * without the two-pointer merge: null input → null (BinaryExpression
  * null semantics), empty set → 0.0 (the expression's 0/0 convention),
  * otherwise 1.0. Pair-generation stages that fail to exclude the
  * diagonal (a common LSH bug turned harmless here) pay O(1) instead
  * of O(|shingles|) per self-pair — on a 100 TB dedup run the
  * diagonal alone is one full pass over every document's shingle set.
  *
  * Cosine is deliberately NOT folded: `graft_cosine(x, x)` is NaN for
  * zero-norm vectors, so deciding it still requires scanning `x`.
  *
  * Installed session-wide by `VectorExpressions.register` (via
  * `experimental.extraOptimizations`, which reaches an already-built
  * session) and by `GraftExtensions` (the `spark.sql.extensions`
  * config path for new sessions). */
object SelfSimilarityFold extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case JaccardSorted(a, b) if a.deterministic && a.semanticEquals(b) =>
        foldSelfJaccard(a)
    }

  private def foldSelfJaccard(a: Expression): Expression =
    If(IsNull(a), Literal(null, DoubleType),
      If(EqualTo(Size(a), Literal(0)), Literal(0.0), Literal(1.0)))
}
