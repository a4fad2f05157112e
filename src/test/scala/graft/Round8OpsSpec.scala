package graft

import graft.engine.{AnalyticsOps, CurationOps, ScaleOps, StatsOps, Tables, TextOps, VectorOps}

/** Invariant checks for the round-8 additions (the DuckDB
  * differential at all three SFs is the primary gate — these pin the
  * algorithmic laws the hash-compare can't express). */
class Round8OpsSpec extends SparkSuite {

  test("domain cap: kept counts never exceed the quota or the domain size") {
    val rows = CurationOps.qDomainCap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nKept) = (r.getLong(1), r.getLong(2))
      assert(nKept <= 10L, s"quota is 10: $r")
      assert(nKept <= nDocs && nKept == math.min(10L, nDocs),
        s"kept must be min(10, domain size): $r")
    }
  }

  test("domain cap is deterministic across partitionings") {
    val a = CurationOps.qDomainCap(spark, sf).collect().map(_.toString)
    val b = CurationOps.qDomainCap(spark, sf)
      .repartition(7).collect().map(_.toString).sorted
    assert(a.sorted.sameElements(b), "hash-ordered sample must be stable")
  }

  test("dataset card: one row, shares in [0,1], vocab bounded by tokens") {
    val rows = CurationOps.qDatasetCard(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(4) <= r.getLong(3), "vocab_size <= n_tokens")
    val dup = r.getDouble(8)
    assert(dup >= 0.0 && dup <= 1.0, s"dup_rate in [0,1]: $dup")
    val share = r.getDouble(7)
    assert(share > 0.0 && share <= 1.0, s"top_lang_share in (0,1]: $share")
  }

  test("quality funnel: stages chain (stage k+1 reads stage k's survivors)") {
    val rows = CurationOps.qQualityFunnel(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2), s"n_out <= n_in: $r"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(3),
        s"stage ${b.getLong(0)} must start from stage ${a.getLong(0)}'s output")
    }
  }

  test("gram novelty: the first document is 100% novel, shares in [0,1]") {
    val rows = TextOps.qGramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) == 1.0, "lowest doc_id sees every gram first")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "novel <= total")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("bigram logprob: corpus-trained model gives finite non-positive scores") {
    val rows = TextOps.qBigramLogprob(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "only docs with bigrams are scored")
      val lp = r.getDouble(2)
      assert(!lp.isNaN && !lp.isInfinite && lp <= 0.0,
        s"unsmoothed in-corpus bigram logprob must be finite and <= 0: $r")
    }
    val lps = rows.map(_.getDouble(2))
    assert(lps.zip(lps.tail).forall { case (a, b) => a <= b }, "asc order")
  }

  test("skew audit: ratios are consistent with their definitions") {
    val rows = ScaleOps.qSkewAudit(spark, sf).collect()
    assert(rows.length == 3)
    val nRows = Tables.lineitem(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) == nRows, "every key column counts all rows")
      assert(r.getDouble(4) >= 1.0, s"max/avg ratio >= 1: $r")
      val share = r.getDouble(5)
      assert(share > 0.0 && share <= 1.0, s"top share in (0,1]: $r")
      assert(r.getLong(3) <= nRows && r.getLong(1) <= nRows)
    }
  }

  test("event pattern: conversions imply the converted flag, one row per user") {
    val rows = AnalyticsOps.qEventPattern(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length == nUsers, "exactly one row per user")
    rows.foreach { r =>
      assert((r.getLong(2) > 0) == (r.getInt(3) == 1),
        s"converted flag must mirror n_conversions: $r")
      assert(r.getLong(2) <= r.getLong(1) / 3,
        s"each vc+p match consumes >= 3 events: $r")
    }
  }

  test("event pattern is deterministic across partitionings") {
    val a = AnalyticsOps.qEventPattern(spark, sf).collect().map(_.toString)
    val b = AnalyticsOps.qEventPattern(spark, sf).repartition(13)
      .collect().map(_.toString).sorted
    assert(a.sorted.sameElements(b), "ordered-struct sort must be stable")
  }

  test("knn eval: accuracy consistent with counts, every query voted once") {
    val rows = VectorOps.qKnnEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val nQ = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 10 === 0).count()
    assert(rows.map(_.getLong(1)).sum == nQ, "every sampled query predicted")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "correct <= total")
      val acc = r.getDouble(3)
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("random projection: 16 components per vector, deterministic") {
    val df = VectorOps.qRandomProjection(spark, sf)
    val rows = df.collect()
    val nVec = Tables.embeddings(spark, sf).count()
    assert(rows.length == nVec * 16, "16 out-dims per vector")
    val again = VectorOps.qRandomProjection(spark, sf)
      .repartition(9).collect().map(_.toString).sorted
    assert(rows.map(_.toString).sorted.sameElements(again),
      "md5 sign matrix must be partition-invariant")
  }

  test("compaction plan: bins conserve rows and cover disjoint date ranges") {
    val rows = ScaleOps.qCompactionPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == total, "bins conserve all rows")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getString(4) < b.getString(3),
          s"each day lands in exactly one bin, ranges disjoint: $a | $b")
      case _ => () // a single bin has nothing to compare
    }
  }

  test("join cardinality estimate: actual matches the executed join exactly") {
    val rows = ScaleOps.qJoinCardEst(spark, sf).collect()
    assert(rows.length == 2)
    val actualOl = Tables.orders(spark, sf).join(
      Tables.lineitem(spark, sf),
      org.apache.spark.sql.functions.col("o_orderkey") ===
        org.apache.spark.sql.functions.col("l_orderkey")).count()
    val r = rows.find(_.getString(0) == "orders_lineitem_on_orderkey").get
    assert(r.getLong(2) == actualOl,
      "sum of count products must equal the real join cardinality")
    rows.foreach(x => assert(x.getLong(1) >= 0))
  }

  test("bootstrap CI: interval brackets the mean of means, 50 resamples") {
    val rows = StatsOps.qBootstrapCi(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 50, "B=50 resamples")
    val (lo, mid, hi) = (r.getDouble(3), r.getDouble(2), r.getDouble(4))
    assert(lo <= mid && mid <= hi, s"p05 <= mean <= p95: $r")
    assert(r.getLong(0) > 0)
  }

  test("seasonal dow: indices average to ~1 weighted by counts") {
    val rows = AnalyticsOps.qSeasonalDow(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      val n = grp.map(_.getLong(2)).sum.toDouble
      val weighted = grp.map(r => r.getDouble(4) * r.getLong(2)).sum / n
      assert(math.abs(weighted - 1.0) < 0.01,
        s"count-weighted mean seasonal index must be ~1, got $weighted")
    }
    rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) <= 6))
  }

  test("cusum drift: exactly the peak rows flagged, final cusum ~0") {
    val rows = AnalyticsOps.qCusumDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getInt(4) == 1) >= 1, "at least one peak")
    val maxAbs = rows.map(r => math.abs(r.getDouble(3))).max
    rows.filter(_.getInt(4) == 1).foreach(r =>
      assert(math.abs(math.abs(r.getDouble(3)) - maxAbs) < 1e-9))
    // CUSUM telescopes: the last value is cum deviation of ALL events = 0
    assert(math.abs(rows.last.getDouble(3)) < 0.01,
      s"final cusum must telescope to ~0: ${rows.last}")
  }

  test("rolling corr: values in [-1,1], only full 7-day windows emitted") {
    val rows = AnalyticsOps.qRollingCorr(spark, sf).collect()
    val nDays = spark.read.parquet(s"$sf/events.parquet")
      .select(org.apache.spark.sql.functions.date_format(
        org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd"))
      .distinct().count()
    assert(rows.length == math.max(0L, nDays - 6),
      "one row per day from the 7th onward")
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val c = r.getDouble(3)
        assert(c >= -1.0001 && c <= 1.0001, s"corr in [-1,1]: $r")
      }
    }
  }

  test("calibration: bins partition all docs, accuracy and conf in range") {
    val rows = TextOps.qCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "bins cover every document")
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 19)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(3) >= r.getDouble(1) - 1e-9,
        s"mean conf at or above the bin floor: $r")
    }
  }

  test("weighted sample: exactly 50, biased toward longer documents") {
    val rows = CurationOps.qWeightedSample(spark, sf).collect()
    assert(rows.length == math.min(50L, Tables.documents(spark, sf).count()))
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq,
      "ranks are 1..k")
    val ks = rows.map(_.getDouble(3))
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b }, "keys ascend")
    val sampleMean = rows.map(_.getLong(2)).sum.toDouble / rows.length
    val popMean = Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head().getDouble(0)
    assert(sampleMean > popMean,
      s"length-weighted sample must skew long: $sampleMean vs $popMean")
  }

  test("target encoding: LOO mean excludes the row's own value") {
    val rows = StatsOps.qTargetEncoding(spark, sf).collect()
    assert(rows.length == 100)
    // recompute one row's LOO by hand from the full table
    val r = rows.head
    val all = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === r.getString(1))
      .select(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value") * 100).cast("long"))
      .collect().map(_.getLong(0))
    val c = math.round(r.getDouble(2) * 100)
    val expect = (all.sum - c).toDouble / ((all.length - 1) * 100.0)
    assert(math.abs(r.getDouble(3) - expect) < 1e-3,
      s"LOO mismatch: got ${r.getDouble(3)}, want ~$expect")
  }

  test("group scale: scaled values in [0,1] with min->0 and max->1") {
    val rows = StatsOps.qGroupScale(spark, sf).collect()
    assert(rows.length == 100)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      val v = r.getDouble(3)
      assert(v >= 0.0 && v <= 1.0, s"scaled in [0,1]: $r")
    }
  }

  test("split leakage: overlap bounded by both sides") {
    val rows = StatsOps.qSplitLeakage(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val (tr, te, ov) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(ov <= tr && ov <= te, "overlap is an intersection")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("md5 simhash twin: exact copies collide at hamming 0, pairs ordered") {
    val rows = TextOps.qDedupSimhashMd5(spark, sf).collect()
    assert(rows.nonEmpty)
    // planted exact copies (doc_id + 1000000) share the identical
    // fingerprint -> must appear at hamming 0 unless their buckets
    // were valve-dropped (all four bands identical => all dropped
    // together only if EVERY band is boilerplate, not on this fixture)
    val zeroPairs = rows.filter(_.getLong(2) == 0)
    assert(zeroPairs.exists(r => r.getLong(1) - r.getLong(0) == 1000000L),
      "at least one planted exact copy at hamming 0")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs ordered doc_a < doc_b")
      assert(r.getLong(2) <= 7, "hamming within threshold")
    }
  }

  test("window topk: at most 3 per window, counts non-increasing in rank") {
    val rows = AnalyticsOps.qWindowTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, grp) =>
      assert(grp.length <= 3)
      val sorted = grp.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to grp.length).toSeq)
      val ns = sorted.map(_.getLong(3))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b },
        "counts non-increasing within a window")
    }
  }

  test("psi drift: non-negative, halves partition each type's events") {
    val rows = AnalyticsOps.qPsiDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val perType = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"PSI is a sum of (p-q)ln(p/q) >= 0: $r")
      assert(r.getLong(1) + r.getLong(2) == perType(r.getString(0)),
        "before + after = all events of the type")
    }
  }

  test("data contract: fixture satisfies every declared check") {
    val rows = graft.engine.QualityOps.qDataContract(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getInt(4) == (if (r.getLong(3) == 0) 1 else 0),
        s"pass flag mirrors violation count: $r")
    }
    // the generated fixture is referentially intact and in-range
    assert(rows.forall(_.getInt(4) == 1), s"fixture passes its contract")
  }

  test("stats merge: Chan's merged variance equals the direct variance") {
    val rows = StatsOps.qStatsMerge(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) < 1e-4, s"merge error must be float dust: $r")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) <= 1e-3,
        s"direct and merged variances agree: $r")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("burst detect: peak count at least the mean, bursts bounded by hours") {
    val rows = AnalyticsOps.qBurstDetect(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5).toDouble >= r.getDouble(2) - 1e-9,
        s"the peak hour's count is at least the average: $r")
      assert(r.getLong(3) <= r.getLong(1), s"bursts <= hours: $r")
      assert(r.getLong(4) % 3600 == 0, "peak hour is hour-aligned epoch")
    }
  }

  test("heldout perplexity: scores only odd docs, finite and non-positive") {
    val rows = TextOps.qHeldoutPerplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 2 == 1, "only heldout (odd) docs are scored")
      val lp = r.getDouble(2)
      assert(!lp.isNaN && !lp.isInfinite && lp <= 0.0,
        s"backoff keeps every score finite: $r")
    }
  }

  test("dup profile: planted exact copies put >=2/3 of docs in 2+ buckets") {
    val rows = TextOps.qDupProfile(spark, sf).collect()
    // corpusWithDups plants an exact copy of every doc (bucket >= 2);
    // the one-token-shorter near-copies may land in singleton groups
    val dupDocs = rows.filter(_.getLong(0) >= 2).map(_.getLong(2)).sum
    val allDocs = rows.map(_.getLong(2)).sum
    assert(dupDocs * 3 >= allDocs * 2,
      s"original+exact-copy pairs alone are 2/3 of the corpus: $dupDocs/$allDocs")
    val share = rows.map(_.getDouble(3)).sum
    assert(math.abs(share - 1.0) < 0.01, s"doc shares sum to ~1: $share")
  }

  test("optimizer stats: NDV bounded by rows, ranges ordered, keys dense") {
    val rows = ScaleOps.qOptimizerStats(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"ndv <= n_rows: $r")
      assert(r.getLong(4) == 0, s"key columns are never null: $r")
      assert(r.getLong(5) <= r.getLong(6), s"min <= max: $r")
    }
    val ok = rows.find(r => r.getString(0) == "orders" &&
      r.getString(1) == "o_orderkey").get
    assert(ok.getLong(2) == ok.getLong(3), "o_orderkey is unique")
  }

  test("IVM audit: merged refresh reproduces the full recompute exactly") {
    val rows = ScaleOps.qIvmAudit(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 0, s"merge and recompute must agree: $r")
    assert(r.getLong(2) == Tables.events(spark, sf).count(),
      "view covers every event")
  }

  test("tail index: positive alpha from at most k strictly-top values") {
    val rows = StatsOps.qTailIndex(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) >= 1 && r.getLong(0) <= 100, s"n_top in [1,100]: $r")
    assert(r.getDouble(1) > 0.0, "boundary value positive")
    assert(r.getDouble(2) > 0.0, s"Hill alpha positive: $r")
  }

  test("churn features: counts consistent, recency non-negative") {
    val rows = AnalyticsOps.qChurnFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "purchases <= events")
      assert(r.getLong(5) >= 0, s"recency from the global high-water mark: $r")
      assert(math.abs(r.getLong(6)) <= r.getLong(2), "trend bounded by events")
      assert(r.getDouble(4) >= 0.0, "monetary non-negative")
    }
  }

  test("equiheight hist: nine non-decreasing boundaries splitting ~deciles") {
    val rows = ScaleOps.qEquiheightHist(spark, sf).collect()
    assert(rows.length == 9)
    val bs = rows.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b }, "monotone cuts")
    // the median boundary holds at least half the mass at-or-below it
    val li = Tables.lineitem(spark, sf)
      .select(org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.col("l_extendedprice"))
        .cast("long").as("c"))
    val n = li.count().toDouble
    val below = li.filter(
      org.apache.spark.sql.functions.col("c") <= bs(4)).count()
    assert(below / n >= 0.5 && below / n <= 0.52,
      s"median cut holds ~half the mass: ${below / n}")
  }

  test("confusion matrix: row shares sum to 1, counts conserve docs") {
    val rows = TextOps.qConfusionMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum ==
      Tables.documents(spark, sf).count(), "every doc lands in one cell")
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      val share = grp.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) < 0.001, s"row shares sum to 1: $share")
    }
  }

  test("embed health: fixture vectors are clean, norm envelope ordered") {
    val rows = VectorOps.qEmbedHealth(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == Tables.embeddings(spark, sf).count())
    assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0,
      s"fixture embeddings must be 64-dim, non-zero, finite: $r")
    assert(r.getDouble(4) <= r.getDouble(6) && r.getDouble(6) <= r.getDouble(5),
      s"min <= mean <= max norm: $r")
  }
}
