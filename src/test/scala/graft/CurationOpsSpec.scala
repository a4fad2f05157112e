package graft

import graft.engine.{CurationOps, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for the corpus-curation operators. */
class CurationOpsSpec extends SparkSuite {

  test("vocab ids are dense from 1 and cumulative share ends at 1 when vocab fits") {
    val rows = CurationOps.qVocabBuild(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    // counts are non-increasing along ids
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val vocabSize = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+"))).distinct().count()
    if (vocabSize <= 200)
      assert(math.abs(rows.last.getDouble(3) - 1.0) < 1e-9,
        s"full vocab must cover the corpus: ${rows.last}")
  }

  test("length buckets partition the corpus and bound token counts by 2^b") {
    val rows = CurationOps.qLengthBuckets(spark, sf).collect()
    val share = rows.map(_.getDouble(5)).sum
    assert(math.abs(share - 1.0) < 0.001, s"shares must sum to ~1: $share")
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b holds out-of-range lengths [$lo, $hi]")
    }
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == Tables.documents(spark, sf).count())
  }

  test("inverse-frequency weights rebalance to the corpus total") {
    val rows = CurationOps.qClassWeights(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum.toDouble
    val rebalanced = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(rebalanced - total) / total < 0.01,
      s"sum(n_c * w_c) = $rebalanced, expected ~$total")
  }

  test("dictionary codes are dense and functionally consistent") {
    val rows = CurationOps.qDictEncode(spark, sf).collect()
    val bySource = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).toSet)
    assert(bySource.values.forall(_.size == 1), "source code not functional")
    val codes = bySource.values.map(_.head).toSeq.sorted
    assert(codes == (1L to codes.length).toSeq, s"codes not dense: $codes")
    // lexicographic: larger source string gets larger code
    val pairs = bySource.map { case (s0, c) => (s0, c.head) }.toSeq.sortBy(_._1)
    assert(pairs.map(_._2) == pairs.map(_._2).sorted)
  }
}
