package graft

import graft.engine.{MiningOps, QualityOps, RelationalExt, StatsOps, StreamingOps, VectorOps}

/** Invariant checks for the round-6 (driver round 11) additions —
  * graph mining, model eval, time-series decomposition, spatial
  * join. The DuckDB differential at all three SFs is the primary
  * gate; these pin the algorithmic laws the hash-compare can't
  * express. */
class Round11OpsSpec extends SparkSuite {

  test("k-core peel is monotone: node and edge counts never grow per round") {
    val rows = RelationalExt.qKcore(spark, sf).collect()
    assert(rows.length == 3)
    val byRound = rows.sortBy(_.getInt(0))
    byRound.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1), s"nodes grew: $a -> $b")
      assert(b.getLong(2) <= a.getLong(2), s"edges grew: $a -> $b")
    }
    // a surviving 3-core edge set needs >= k+1 nodes if nonempty
    byRound.foreach { r =>
      if (r.getLong(2) > 0) assert(r.getLong(1) >= 4, s"3-core too small: $r")
    }
  }

  test("item-item cosine similarity is bounded by (0, 1]") {
    val rows = RelationalExt.qItemSim(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sim = r.getDouble(5)
      assert(sim > 0.0 && sim <= 1.0, s"cosine out of range: $r")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        s"pair support exceeds item support: $r")
    }
  }

  test("assortativity is a correlation: within [-1, 1]") {
    val r = RelationalExt.qAssortativity(spark, sf).head
    val a = r.getDouble(1)
    assert(a >= -1.0 && a <= 1.0, s"assortativity out of range: $a")
  }

  test("recommender eval: hits bounded by scored baskets, rate in [0,1]") {
    val r = RelationalExt.qRecommenderEval(spark, sf).head
    val (nTest, nScored, hits, rate) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nScored <= nTest, "can't score more baskets than exist")
    assert(hits <= nScored, "can't hit more than scored")
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("FD audit: a primary key FD holds with zero violations; g3 in [0,1]") {
    val rows = QualityOps.qFdAudit(spark, sf).collect()
    val byName = rows.map(r => r.getString(0) -> r).toMap
    val pk = byName("o_orderkey->o_custkey")
    assert(pk.getLong(2) == 0L && pk.getInt(5) == 1, s"PK FD must hold: $pk")
    assert(pk.getDouble(4) == 0.0)
    rows.foreach { r =>
      val g3 = r.getDouble(4)
      assert(g3 >= 0.0 && g3 <= 1.0, s"g3 out of range: $r")
    }
  }

  test("ACF sweep: lag-k coefficients are within [-1, 1], 5 lags per type") {
    val rows = StatsOps.qAcfSweep(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val acf = r.getDouble(3)
      assert(acf >= -1.0001 && acf <= 1.0001, s"acf out of range: $r")
    }
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.map(_.getInt(1)).toSet.subsetOf(Set(1, 2, 3, 4, 5)), t)
    }
  }

  test("Holt smoothing: forecast equals level + 7*trend (display identity)") {
    val rows = StatsOps.qHoltLinear(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lvl, trd, fc) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // both sides rounded at 4dp from the same unrounded state —
      // allow one display-rounding ulp of slack
      assert(math.abs(fc - (lvl + 7 * trd)) < 2e-3, s"forecast drifted: $r")
    }
  }

  test("Naive Bayes confusion matrix: counts cover the whole test split") {
    val rows = MiningOps.qNaiveBayes(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val nTest = graft.engine.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 5 === 0).count()
    assert(total == nTest, s"confusion counts $total != test docs $nTest")
    // the synthetic corpus is only weakly separable (langs share most
    // vocabulary), so the honest bar is beating uniform chance (1/5),
    // not the majority prior
    val correct = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    assert(correct * 5 > total, s"no better than chance: $correct/$total")
  }

  test("silhouette: means within [-1, 1], every vector assigned") {
    val rows = VectorOps.qSilhouette(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val nVecs = graft.engine.Tables.embeddings(spark, sf).count()
    assert(n == nVecs, s"members $n != vectors $nVecs")
    rows.foreach { r =>
      val m = r.getDouble(2)
      assert(m >= -1.0 && m <= 1.0, s"silhouette out of range: $r")
    }
  }

  test("conformal intervals: coverage near or above the 90% target") {
    val rows = MiningOps.qConformalInterval(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val cov = r.getDouble(6)
      // finite-sample guarantee is >= 90% in EXPECTATION; allow slack
      // for the small per-priority test splits at sf0.001
      assert(cov >= 0.75 && cov <= 1.0, s"coverage implausible: $r")
      assert(r.getLong(4) >= 0L, s"negative qhat: $r")
    }
  }

  test("seasonal decomposition: weekly seasonal components sum to ~zero per type") {
    val rows = StatsOps.qSeasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    val dailyMean = graft.engine.Tables.events(spark, sf)
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")))
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr(
          "CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("c"))
      .agg(org.apache.spark.sql.functions.avg("c")).head.getDouble(0)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      assert(rs.length <= 7, s"$t has more than 7 dow cells")
      // the weighted seasonal mean equals the mean detrended value —
      // zero for a stationary series; the centered-MA edge bias on a
      // growing series leaves a small remainder, bounded RELATIVE to
      // the daily magnitude (observed ~0.1%)
      val weighted = rs.map(r => r.getLong(3) * r.getLong(2)).sum.toDouble
      val nDays = rs.map(_.getLong(2)).sum
      assert(math.abs(weighted / nDays) <= math.max(5.0, 0.02 * dailyMean),
        s"$t seasonal mean too far from 0: ${weighted / nDays} vs daily $dailyMean")
    }
  }

  test("lateness audit: late counts bounded by event counts, lateness nonnegative") {
    val rows = QualityOps.qLatenessAudit(spark, sf).collect()
    assert(rows.nonEmpty, "jittered stream must contain disorder")
    rows.foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(2) <= r.getLong(1), s"bad counts: $r")
      assert(r.getLong(3) > 0 && r.getLong(4) >= r.getLong(3),
        s"max/total lateness inconsistent: $r")
    }
  }

  test("entity resolution: every cluster has >= 2 names and parts >= names") {
    val rows = MiningOps.qEntityResolution(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 2, s"singleton cluster leaked: $r")
      assert(r.getLong(2) >= r.getLong(1), s"fewer parts than names: $r")
    }
  }

  test("HITS: hub score bounded by out_deg * max authority") {
    val rows = RelationalExt.qHitsIter(spark, sf).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    // scores sorted descending by construction
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) >= b.getLong(2), "not sorted by hub score")
    }
  }

  test("geo grid join: bands within the 100 km cap, pairs positive") {
    val rows = RelationalExt.qGeoGridJoin(spark, sf).collect()
    assert(rows.nonEmpty, "dense lattice must produce near pairs")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 4, s"band beyond cap: $r")
      assert(r.getLong(1) > 0)
    }
  }

  test("RAKE: phrases contain no stopwords and scores are positive") {
    val rows = graft.engine.TextOps.qRakeKeywords(spark, sf).collect()
    assert(rows.nonEmpty)
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length >= 2 && words.length <= 4, s"phrase length: $r")
      assert(!words.exists(stop), s"stopword inside phrase: $r")
      assert(r.getLong(2) > 0, s"nonpositive score: $r")
    }
  }

  test("store-source streaming query equals the batch aggregate") {
    val streamed = StreamingOps.qStreamStoreSource(spark, sf).collect()
    val batch = graft.engine.Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_id") % 20 === 0)
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(batch(r.getString(0)) == r.getLong(1),
        s"stream/batch count mismatch for ${r.getString(0)}")
    }
  }
}
