package graft

import graft.engine.{CurationOps, RelationalExt, VectorOps}

/** Semantic checks for PMI collocations, vector quantization, and
  * triangle counting. */
class CurationMoreSpec extends SparkSuite {

  test("pmi rows respect min support and are rank-ordered") {
    val rows = CurationOps.qPmi(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach(r => assert(r.getLong(1) >= 5, s"support violated: $r"))
    val ps = rows.map(_.getDouble(2))
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b })
  }

  test("vector quantization reconstruction error is small relative to the norm") {
    val q = VectorOps.qVectorQuantize(spark, sf).collect()
    val norms = VectorOps.qVectorNorm(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.foreach { r =>
      val (id, dims, err) = (r.getLong(0), r.getLong(1), r.getDouble(4))
      assert(dims == 64)
      // int8 symmetric quantization: per-dim error ≤ maxAbs/254,
      // so L2 err ≤ sqrt(dims)·maxAbs/254 — and far below the norm
      val bound = math.sqrt(dims.toDouble) * r.getDouble(2) / 254.0 + 1e-9
      assert(err <= bound, s"vec $id err $err above bound $bound")
      assert(err < norms(id) * 0.05, s"vec $id err $err not << norm ${norms(id)}")
    }
  }

  test("triangles are canonical and every edge pair has support >= 2") {
    val tri = RelationalExt.qTriangleCount(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    tri.foreach { case (a, b, c) => assert(a < b && b < c) }
    assert(tri.distinct.length == tri.length, "each triangle exactly once")
  }

  test("vocab-sized tables join WITHOUT a broadcast hint (bm25 df, pmi unigrams)") {
    // A broadcast() on a vocabulary-sized side is an OOM at 100 TB; the
    // hint must be absent from the LOGICAL plan (AQE may still pick a
    // broadcast strategy at this sf — that's fine, it's size-driven).
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedHint}
    def hintCount(p: LogicalPlan): Int =
      p.collect { case h: UnresolvedHint => h }.size
    // qBm25: only the 1-row corpus-stats crossJoin may carry a hint
    val bm25Hints = hintCount(
      graft.engine.TextOps.qBm25(spark, sf).queryExecution.logical)
    assert(bm25Hints <= 1, s"qBm25 has $bm25Hints broadcast hints; only the 1-row stats crossJoin is allowed")
    // qPmi: only the two 1-row total crossJoins may carry hints
    val pmiHints = hintCount(
      CurationOps.qPmi(spark, sf).queryExecution.logical)
    assert(pmiHints <= 2, s"qPmi has $pmiHints broadcast hints; only the two 1-row total crossJoins are allowed")
  }

  test("basket-size skew valve is inert on the fixture (property: output stable)") {
    // MaxBasketSize bounds pair fan-out per order; TPC-H orders hold ≤7
    // items so the valve must not change fixture output.
    import org.apache.spark.sql.functions._
    val li = graft.engine.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
    val maxBasket = li.groupBy("l_orderkey").count()
      .agg(max("count")).first().getLong(0)
    assert(maxBasket <= RelationalExt.MaxBasketSize,
      s"fixture basket $maxBasket exceeds valve ${RelationalExt.MaxBasketSize} — valve would alter output")
    assert(RelationalExt.MaxBasketSize == 120, "documented constant")
  }

  test("zipf fit: negative slope, one row, rank-1 frequency dominates") {
    val r = CurationOps.qZipfSlope(spark, sf).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) > 1, "needs a multi-term vocabulary")
    assert(r.head.getDouble(1) < 0.0, s"zipf slope must be negative: ${r.head}")
  }

  test("kl divergence: non-negative per source, covers every source") {
    val rows = CurationOps.qKlDivergence(spark, sf).collect()
    val nSources = graft.engine.Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0, s"negative KL: $r"))
  }

  test("unigram logprob: scores negative, ascending, capped at 100 docs") {
    val rows = graft.engine.TextOps.qUnigramLogprob(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getDouble(2) < 0.0, s"logprob must be < 0: $r"))
    val ss = rows.map(_.getDouble(2))
    assert(ss.zip(ss.tail).forall { case (a, b) => a <= b }, "not ascending")
  }

  test("shard assignment: 16 shards partition the corpus, balance ~1") {
    val rows = CurationOps.qShardAssign(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "shards must partition corpus")
    rows.foreach(r => assert(r.getDouble(3) > 0.3 && r.getDouble(3) < 3.0,
      s"shard badly unbalanced: $r"))
  }

  test("crossval folds partition the corpus and cover every lang") {
    val rows = CurationOps.qCrossvalFolds(spark, sf).collect()
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 5L).toSet))
  }

  test("prefix dedup: groups have >1 doc and canonical is the min id") {
    val rows = graft.engine.TextOps.qPrefixDedup(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach(r => assert(r.getLong(1) > 1))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not desc")
  }

  test("dim stats: one row per dimension, std>0, bounds ordered") {
    val rows = VectorOps.qDimStats(spark, sf).collect()
    assert(rows.length == 64, s"fixture embeddings are 64-dim: ${rows.length}")
    val n = graft.engine.Tables.embeddings(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getDouble(3) > 0.0, s"degenerate dim: $r")
      assert(r.getDouble(4) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(5),
        s"mean outside [min,max]: $r")
    }
  }

  test("bpe merge: 20 two-char pairs, descending frequency") {
    val rows = graft.engine.TextOps.qBpeMerge(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getString(0).length == 2))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("rank fusion: both-list hits outrank single-list hits") {
    val rows = VectorOps.qRankFusion(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 10)
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        "rrf not descending within query")
      // a candidate present in BOTH rankings beats one present in only
      // the weakest single slot (1/61+1/80 > 1/61): rank-1 must be a
      // both-lists hit whenever any both-lists hit exists
      val both = rs.filter(r => r.getLong(3) > 0 && r.getLong(4) > 0)
      if (both.nonEmpty) {
        val top = rs.minBy(_.getLong(1))
        assert(both.map(_.getDouble(5)).max <= top.getDouble(5) + 1e-9)
      }
    }
  }

  test("pq assign: codebook vectors code to themselves with zero error") {
    val rows = VectorOps.qPqAssign(spark, sf).collect()
    val n = graft.engine.Tables.embeddings(spark, sf).count()
    assert(rows.length == n)
    rows.filter(_.getLong(0) < 8).foreach { r =>
      val id = r.getLong(0)
      assert((1 to 4).forall(i => r.getLong(i) == id),
        s"centroid $id must self-assign: $r")
      assert(r.getDouble(5) == 0.0, s"centroid $id must have zero error: $r")
    }
    // non-codebook vectors: codes in range, error non-negative
    rows.foreach { r =>
      assert((1 to 4).forall(i => r.getLong(i) >= 0 && r.getLong(i) < 8))
      assert(r.getDouble(5) >= 0.0)
    }
  }
}
