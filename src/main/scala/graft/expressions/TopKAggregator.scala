package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

final case class ScoredRow(score: Double, id: Long)

/** Bounded top-k as a typed Aggregator (the custom-operator ladder's
  * option (b), aggregate form): each partition keeps AT MOST k rows
  * per group and partial buffers merge associatively, so only
  * k·partitions rows per group ever cross the shuffle — versus the
  * window-function formulation (row_number ≤ k), which shuffles and
  * sorts EVERY row of the group. At 100 TB with a hot group this is
  * the difference between a bounded buffer and a spilling sort.
  *
  * Deterministic: ordering is (score DESC, id ASC) everywhere, so
  * reduce/merge order cannot change the result. The buffer stays a
  * sorted Seq — k is small (top-k means k ≪ group size); insertion
  * into a k-element sorted list is the cheap path, not the bottleneck
  * the shuffle is. */
final class TopKByScore(k: Int)
    extends Aggregator[ScoredRow, Seq[ScoredRow], Seq[ScoredRow]] {

  private def trim(s: Seq[ScoredRow]): Seq[ScoredRow] =
    s.sortBy(r => (-r.score, r.id)).take(k)

  override def zero: Seq[ScoredRow] = Seq.empty

  override def reduce(b: Seq[ScoredRow], a: ScoredRow): Seq[ScoredRow] =
    if (b.length == k && (b.last.score > a.score ||
        (b.last.score == a.score && b.last.id <= a.id))) b
    else trim(b :+ a)

  override def merge(x: Seq[ScoredRow], y: Seq[ScoredRow]): Seq[ScoredRow] =
    trim(x ++ y)

  override def finish(b: Seq[ScoredRow]): Seq[ScoredRow] = trim(b)

  override def bufferEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()

  override def outputEncoder: Encoder[Seq[ScoredRow]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredRow]]()
}

object TopKAggregator {
  /** Column-level UDAF over a struct<score: double, id: bigint>. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k), Encoders.product[ScoredRow])
}
