package graft

import graft.engine.VectorOps
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0, 0.0, 2.0), Seq(1.0, 0.0, 2.0), Seq(0.0, 3.0, 0.0)))
      .toDF("a", "b", "c")
    val r = df.select(
      round(VectorOps.cosine(col("a"), col("b")), 6).as("self"),
      round(VectorOps.cosine(col("a"), col("c")), 6).as("orth")).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("brute-force top-k is ordered and bounded") {
    val r = VectorOps.qVectorTopK(spark, sf, k = 10).collect()
    assert(r.length == 10)
    val sims = r.map(_.getDouble(2))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("LSH ANN candidates come from the query's bucket and are ranked") {
    val r = VectorOps.qAnnLsh(spark, sf, k = 5)
    val ranks = r.groupBy("q_id").agg(max("rn").as("m")).collect()
    assert(ranks.forall(_.getLong(1) <= 5))
  }

  test("embedding near-dup finds every planted perturbed pair") {
    val n = graft.engine.Tables.embeddings(spark, sf).count()
    val dups = VectorOps.qEmbedCosineDup(spark, sf)
      .filter(col("id_b") === col("id_a") + 1000000)
    // each original must match its 1%-perturbed copy at cos ≥ 0.95
    assert(dups.count() == n)
    assert(dups.agg(min("cos_sim")).head().getDouble(0) >= 0.99)
  }
}
