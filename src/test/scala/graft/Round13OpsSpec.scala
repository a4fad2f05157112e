package graft

import graft.engine.{AnalyticsOps, CurationOps, MultimodalOps, ScaleOps, StatsOps, TextOps, VectorOps}

/** Invariant checks for the round-13 additions — Gopher rule report,
  * encoding audit, URL canonicalization dedup, Matryoshka truncation
  * eval, PR threshold sweep, l-diversity. The DuckDB differential at
  * all three SFs is the primary gate; these pin the algorithmic laws
  * the hash-compare can't express. */
class Round13OpsSpec extends SparkSuite {

  test("gopher rules: every per-rule count ≤ n_docs; all_pass ≤ min rule; keep_rate ∈ [0,1]") {
    val rows = CurationOps.qGopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val passes = (2 to 6).map(r.getLong)
      val allPass = r.getLong(7)
      assert(passes.forall(p => p >= 0 && p <= n), s"rule count out of range: $r")
      assert(allPass <= passes.min, s"conjunction exceeds a conjunct: $r")
      val rate = r.getDouble(8)
      assert(rate >= 0.0 && rate <= 1.0)
      // word-count bounds [30,90] must actually bite on this corpus (10..99 tokens)
      assert(r.getLong(2) < n, s"word-count rule should reject some docs: $r")
    }
  }

  test("encoding audit finds exactly the injected corruption (1/7 replacement, 1/11 control)") {
    val rows = TextOps.qEncodingAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    val withRepl = rows.map(_.getLong(5)).sum
    val withCtrl = rows.map(_.getLong(6)).sum
    // fixture corpus is pure ASCII, so corruption counts are the doc_id
    // residue classes exactly (doc_ids are 0..n-1 contiguous)
    assert(withRepl == (0L until nDocs).count(_ % 7 == 0),
      s"replacement-char docs: got $withRepl of $nDocs")
    assert(withCtrl == (0L until nDocs).count(_ % 11 == 0),
      s"control-char docs: got $withCtrl of $nDocs")
    rows.foreach { r =>
      // injected tail ' �你好' = 4 chars, 1+3+3+3=10 bytes: bytes > chars iff non-ASCII present
      assert(r.getLong(3) >= r.getLong(2), s"bytes < chars: $r")
      assert(r.getDouble(7) <= 1.0 && r.getDouble(7) > 0.9,
        s"ascii_ratio implausible for a 4-char injection: $r")
    }
  }

  test("url dedup: canonical groups merge case/utm/slash/fragment variants, never ids") {
    val rows = CurationOps.qUrlDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val url = r.getString(0)
      assert(url == url.toLowerCase || !url.startsWith("https://shop.example.com") == false,
        s"canonical host must be lowercased: $url")
      assert(!url.contains("utm_") && !url.contains("#"), s"tracking/fragment survived: $url")
      assert(!url.stripSuffix(s"?${url.split('?').last}").endsWith("/"),
        s"trailing slash survived: $url")
      assert(r.getLong(2) <= r.getLong(1), s"more variants than events: $r")
    }
    // synthesis produces ≥2 raw variants for any canonical group with both parities
    assert(rows.exists(_.getLong(2) >= 2), "no group merged multiple raw variants")
  }

  test("matryoshka eval: overlap@10 ≤ 10, full-dim (64) overlap is exactly k, monotone-ish in dim") {
    val rows = VectorOps.qMatryoshkaEval(spark, sf).collect()
    assert(rows.length == 30, s"10 probes × 3 dims expected, got ${rows.length}")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10, s"overlap out of range: $r")
    }
    // dim=64 truncation is the identity: overlap must be exactly k
    rows.filter(_.getLong(1) == 64).foreach { r =>
      assert(r.getLong(2) == 10, s"full-dim overlap must be 10: $r")
    }
    // averaged over probes, more dims cannot hurt much: mean(32) ≥ mean(16) - 1
    def mean(dim: Long) = {
      val xs = rows.filter(_.getLong(1) == dim).map(_.getLong(2).toDouble)
      xs.sum / xs.length
    }
    assert(mean(32) >= mean(16) - 1.0, s"32-dim much worse than 16-dim: ${mean(32)} vs ${mean(16)}")
  }

  test("pr curve: recall monotone non-increasing in threshold; counts conserve positives") {
    val rows = VectorOps.qPrCurve(spark, sf).collect()
    assert(rows.length == 11)
    val sorted = rows.sortBy(_.getDouble(0))
    val positives = sorted.map(r => r.getLong(1) + r.getLong(3)).distinct
    assert(positives.length == 1, s"tp+fn must be constant: ${positives.toSeq}")
    val recalls = sorted.map(_.getDouble(5))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"recall must fall as threshold rises: ${recalls.toSeq}")
    // extreme thresholds: at -0.5 everything is predicted positive (scores > -0.37)
    assert(sorted.head.getDouble(5) == 1.0, "recall at lowest threshold must be 1")
  }

  test("l-diversity: distinct sensitive ≤ min(n, 5 segments); modal count consistent") {
    val rows = StatsOps.qLDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ds, modal, flag) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))
      assert(ds >= 1 && ds <= math.min(n, 5L), s"distinct sensitive out of range: $r")
      assert(modal >= (n + ds - 1) / ds && modal <= n - ds + 1,
        s"modal count outside pigeonhole bounds: $r")
      assert((flag == 1) == (ds >= 3), s"flag disagrees with l=3: $r")
    }
    // the audit must be non-trivial both ways on the fixture
    assert(rows.exists(_.getInt(5) == 1) && rows.exists(_.getInt(5) == 0),
      "fixture should contain both diverse and non-diverse classes")
  }

  test("PCM decode roundtrip: known sawtooth samples come back bit-exact") {
    val wav = MultimodalOps.makeWavPcm(8000, 5, 100, 64)
    val samples = MultimodalOps.decodeWavPcm(wav).get
    assert(samples.length == 64)
    (0 until 64).foreach { i =>
      assert(samples(i) == ((5 * i + 100) % 2048 - 1024).toShort,
        s"sample $i mismatch")
    }
    // the header-only parser agrees on the same payload
    val (rate, bits, ch, _) = MultimodalOps.decodeWavHeader(wav).get
    assert(rate == 8000 && bits == 16 && ch == 1)
    // non-PCM / malformed payloads refuse rather than misread
    assert(MultimodalOps.decodeWavPcm("not audio".getBytes).isEmpty)
  }

  test("audio pcm stats: peak ≤ 1024, |sum| bounds consistent, rms ≤ peak") {
    val rows = MultimodalOps.qAudioPcmStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, peak, sumAbs, sumSq, zc, rms) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(peak <= 1024 && peak >= 1, s"sawtooth peak out of range: $r")
      assert(sumAbs <= n * peak && sumSq <= n * peak * peak, s"sum bounds: $r")
      assert(zc < n, s"more crossings than samples: $r")
      assert(rms <= peak * 1000, s"rms exceeds peak: $r")
    }
  }

  test("pixel dedup: gradient PNGs with identical (a,b,c) collide; groups partition the corpus") {
    val rows = MultimodalOps.qPixelDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).length == 64, s"aHash must be 64 bits: $r")
      assert(r.getString(0).forall(c => c == '0' || c == '1'))
    }
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "groups must partition all docs")
    // only 105 parameter triples exist, so grouping must actually dedup
    assert(rows.length < nDocs, "no deduplication happened")
    // decode really ran: a known gradient's hash matches a direct recompute
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(MultimodalOps.makeGradPng(2, 1, 32)))
    assert(img.getRaster.getSample(3, 4, 0) == (2 * 3 + 1 * 4 + 32) % 256,
      "PNG roundtrip must be pixel-lossless")
  }

  test("zone map: clustered layout always skips at least as much as write order") {
    val rows = ScaleOps.qZoneMap(spark, sf).collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      val (wSkip, cSkip) = (r.getDouble(4), r.getDouble(8))
      assert(cSkip >= wSkip - 1e-9,
        s"value-clustered zones must dominate write-order zones: $r")
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(6) <= r.getLong(5),
        s"skipped zones exceed zone count: $r")
    }
    // the sweep must be non-trivial: clustered skipping grows with threshold
    val cRatios = rows.sortBy(_.getLong(0)).map(_.getDouble(8))
    assert(cRatios.last > cRatios.head,
      s"clustered skip ratio should rise across thresholds: ${cRatios.toSeq}")
  }

  test("feature hashing: load histogram covers exactly 1024 buckets and the whole vocabulary") {
    val rows = CurationOps.qFeatureHashing(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == 1024, "histogram must sum to the bucket count")
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1),
        s"token types must equal load × buckets: $r")
      assert(r.getLong(0) > 0 || r.getLong(3) == 0, s"empty buckets carry no occurrences: $r")
    }
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("explode(split(trim(text), '\\\\s+')) AS t").distinct().count()
    assert(rows.map(_.getLong(2)).sum == vocab, "every token type lands in exactly one bucket")
  }

  test("dp noise: released counts stay within the Laplace tail bound and noise is seeded-stable") {
    val once = StatsOps.qDpNoise(spark, sf).collect()
    val twice = StatsOps.qDpNoise(spark, sf).collect()
    assert(once.map(_.toString).toSeq == twice.map(_.toString).toSeq,
      "seeded mechanism must be reproducible")
    once.foreach { r =>
      val (n, noise, released) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      // |noise| = |ln(1-2|u|)| ≤ ln(1e6) ≈ 13.8 for the u grid
      assert(math.abs(noise) <= 14.0, s"noise outside the inverse-CDF range: $r")
      assert(math.abs(released - n) <= 15, s"released count drifted past the bound: $r")
      assert(r.getDouble(4) == 1.0)
    }
  }

  test("ips eval: uniform-weight policy would reproduce the logged average; 3x-purchase shifts it") {
    val rows = AnalyticsOps.qIpsEval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (logged, ips) = (r.getDouble(3), r.getDouble(4))
      assert(logged > 0 && ips > 0, s"degenerate averages: $r")
      // IPS reweights toward purchase rewards: the estimate moves, but by
      // less than the 3x weight cap
      assert(ips <= logged * 3.0 + 1e-6 && ips >= logged / 3.0 - 1e-6,
        s"IPS outside the weight envelope: $r")
    }
  }

  test("pseudonymize: cardinality conserved up to collisions and rekeyed counts lossless") {
    val r = StatsOps.qPseudonymize(spark, sf).head
    val (users, tokens, coll, ev, evTok, lossless) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))
    assert(tokens + coll == users, s"token accounting broken: $r")
    assert(ev == evTok && lossless == 1, s"rekeying lost events: $r")
    assert(coll <= users / 100, s"8-hex token space should rarely collide: $r")
  }

  test("word analogy: best match excludes the triple and scores within [-1,1]") {
    val rows = VectorOps.qWordAnalogy(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (a, b, c, best, cos) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(best != a && best != b && best != c, s"triple leaked into answer: $r")
      assert(cos >= -1.0 && cos <= 1.0000001, s"cosine out of range: $r")
    }
  }

  test("incremental dedup: classes partition the odd batch; planted copies guarantee all classes") {
    val rows = TextOps.qIncrementalDedup(spark, sf).collect()
    val byStatus = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // every even doc has an odd exact copy at +1000000 parity... the planted
    // corpus guarantees a non-empty dup_of_existing class and shares sum to 1
    assert(byStatus.keySet.subsetOf(Set("dup_of_existing", "dup_in_batch", "unique")))
    assert(byStatus.getOrElse("dup_of_existing", 0L) > 0, s"planted cross-parity dups missing: $byStatus")
    val shares = rows.map(_.getDouble(2)).sum
    assert(math.abs(shares - 1.0) < 0.001, s"shares must sum to ~1: $shares")
    val nOdd = TextOps.corpusWithDups(spark, sf).filter("doc_id % 2 = 1").count()
    assert(rows.map(_.getLong(1)).sum == nOdd, "classes must partition the batch")
  }

  test("geohash: 8 chars from the base-32 alphabet, cells partition users, prefixes consistent") {
    val rows = StatsOps.qGeohashEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz".toSet
    rows.foreach { r =>
      val (cell, first, last) = (r.getString(0), r.getString(2), r.getString(3))
      assert(cell.length == 3 && first.length == 8 && last.length == 8)
      assert(first.forall(alphabet) && last.forall(alphabet), s"non-base32 char: $r")
      assert(first.startsWith(cell) && last.startsWith(cell),
        s"group member outside its own cell: $r")
      assert(first <= last)
    }
    val users = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users, "cells must partition all users")
  }

  test("lr step: sigma=1/2 start means gradient flips sign with label majority; weights tiny") {
    val rows = VectorOps.qLrStep(spark, sf).collect()
    assert(rows.length == 64)
    val n = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) == n), "every dimension sees every row")
    rows.foreach { r =>
      // |per-row quantized grad| ≤ 0.5 * |x| * 1e6 ≤ 0.5e6 → |sum| ≤ n*0.5e6
      assert(math.abs(r.getLong(2)) <= n * 500000L, s"gradient outside bound: $r")
      assert(math.abs(r.getDouble(3)) <= 0.05 + 1e-9, s"eta=0.1 step too large: $r")
    }
  }

  test("ctr smoothing: shrinkage pulls extreme small-sample rates toward the prior mean") {
    val rows = AnalyticsOps.qCtrSmoothing(spark, sf).collect()
    assert(rows.nonEmpty)
    val grand = rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      val (raw, shrunk) = (r.getDouble(3), r.getDouble(4))
      assert(shrunk >= 0.0 && shrunk <= 1.0, s"rate out of range: $r")
      // shrunk sits between raw and the pooled mean (within rounding)
      assert(shrunk >= math.min(raw, grand) - 0.06 &&
        shrunk <= math.max(raw, grand) + 0.06, s"shrinkage overshot: $r")
    }
  }

  test("pinball loss: q=0.9 penalizes under-forecast 9x; loss nonneg; both quantiles present") {
    val rows = StatsOps.qPinballLoss(spark, sf).collect()
    assert(rows.map(_.getDouble(1)).distinct.sorted.toSeq == Seq(0.5, 0.9))
    rows.foreach { r =>
      assert(r.getLong(3) >= 0, s"pinball loss must be nonnegative: $r")
      assert(r.getDouble(4) >= 0.0)
    }
    // per type, the q=0.5 loss is half the MAE — so 2*pin(0.5) == MAE exactly
    val mae = StatsOps.qForecastBaseline(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // sum_abs_err_c
    rows.filter(_.getDouble(1) == 0.5).foreach { r =>
      assert(r.getLong(3) == mae(r.getString(0)) * 5,
        s"10*pinball(0.5) must equal 5*sum|err|: $r")
    }
  }

  test("removal effect: effects in [0, 1e6]; removing any channel cannot raise conversion") {
    val rows = AnalyticsOps.qRemovalEffect(spark, sf).collect()
    assert(rows.length == 5)
    val full = rows.find(_.getString(0) == "none").get.getLong(1)
    assert(full > 0, "baseline chain must convert someone")
    rows.filter(_.getString(0) != "none").foreach { r =>
      assert(r.getLong(1) <= full, s"removal increased conversion: $r")
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000000L, s"effect outside ppm range: $r")
    }
  }

  test("dpp join: runtime partition filter planned (require inside the query) and result sane") {
    val rows = graft.engine.Sinks.qDppJoin(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("purchase", "signup"),
      "only the conversion category's partitions should survive")
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("yule's K: identity sum_m2vm ≥ n_tokens with equality iff all types are hapax") {
    val rows = TextOps.qYuleK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, types, s2, k) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(s2 >= n, s"sum m^2 Vm < N impossible: $r")
      assert(types <= n)
      assert(k >= 0.0, s"K negative: $r")
      // word-soup corpus repeats heavily: K far from the hapax-only zero
      assert(k > 10.0, s"repetitive corpus should have substantial K: $r")
    }
  }

  test("rendezvous resize: HRW moves only to new shards (~2/10); mod-N reshuffles most keys") {
    val r = CurationOps.qRendezvousResize(spark, sf).head
    val (n, hrwMoved, toNew, hrwShare, modShare) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(5))
    assert(hrwMoved == toNew,
      s"HRW monotonicity: every moved key must land on a NEW shard: $r")
    assert(hrwShare < 0.5 && hrwShare > 0.0, s"HRW move share implausible: $r")
    assert(modShare > hrwShare, s"mod-N must move more keys than HRW: $r")
    assert(n > 0)
  }

  test("hll md5 twin: estimate within 10% of exact (1.04/sqrt(256) ≈ 6.5% expected)") {
    val r = graft.engine.ScaleOps.qHllMd5(spark, sf).head
    val (filled, exact, est, relErr) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(filled <= 256 && filled > 0)
    assert(exact > 0 && est > 0)
    assert(math.abs(relErr) < 0.10, s"HLL error outside 10%: $r")
    assert(math.abs(est / exact - 1.0 - relErr) < 0.01, "rel_err must restate estimate/exact")
  }

  test("bloom fpr: no false negatives possible by construction; fpr consistent with load^k") {
    val r = TextOps.qBloomFpr(spark, sf).head
    val (m, k, bitsSet, load, probes, fps, fpr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
    assert(m == 65536 && k == 3)
    assert(bitsSet <= m && load <= 1.0)
    assert(fps <= probes, s"more false positives than probes: $r")
    // measured FPR tracks the theoretical load^k within a loose factor
    val theory = math.pow(load, k.toDouble)
    assert(fpr <= theory * 3 + 0.01 && fpr >= theory / 5 - 0.01,
      s"FPR $fpr inconsistent with load^k = $theory")
  }

  test("datetime parse: every format round-trips every row to the exact second") {
    val rows = graft.engine.IngestQueries.qDatetimeParse(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"lossy roundtrip for format: $r")
      assert(r.getLong(3) <= r.getLong(4))
    }
  }

  test("num parse: all five wire shapes parse back to the exact cents") {
    val rows = graft.engine.IngestQueries.qNumParse(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1), s"inexact parse in shape: $r")
    }
    // the parenthesized shape (its own row subset) parses negative
    val byShape = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byShape(3L) < 0 && byShape(0L) > 0, "(x) must parse with flipped sign")
  }

  test("robots filter: longest prefix wins — Allow:/p/click beats Disallow:/p; default deny via /p") {
    val rows = CurationOps.qRobotsFilter(spark, sf).collect()
    val verdict = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    Seq("/p/click", "/p/click/", "/p/purchase").foreach(p =>
      assert(verdict(p) == 1L, s"$p should be allowed by its specific rule"))
    Seq("/p/error", "/p/view", "/p/signup").foreach(p =>
      assert(verdict(p) == 0L, s"$p should fall to Disallow:/p"))
    rows.foreach(r => assert(r.getLong(1) >= 1, s"every path matches at least /p: $r"))
  }

  test("rate limit: admissions bounded by capacity + refill budget; first events always admitted") {
    val rows = AnalyticsOps.qRateLimit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, adm, rej) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(adm + rej == n, s"decisions must partition events: $r")
      assert(adm >= 1, s"the first event always finds a full bucket: $r")
      assert(adm <= n)
    }
    // on a bursty fixture the limiter must actually bite somewhere
    assert(rows.exists(_.getLong(3) > 0), "no user was ever rate-limited — limiter inert")
  }

  test("ua parse: families and versions recovered exactly from the synthesized strings") {
    val rows = graft.engine.IngestQueries.qUaParse(spark, sf).collect()
    assert(rows.nonEmpty)
    val osSet = rows.map(_.getString(0)).toSet
    assert(osSet == Set("Windows", "Macintosh", "X11"))
    assert(rows.map(_.getString(1)).toSet == Set("Chrome", "Firefox"))
    rows.foreach { r =>
      assert(r.getLong(2) >= 100 && r.getLong(2) <= 129, s"major version out of range: $r")
    }
  }

  test("skipgram: adjacent pairs carry double the distance-2 weight; top-50 well-ordered") {
    val rows = TextOps.qSkipgram(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (n, w) = (r.getLong(2), r.getLong(3))
      // each pair occurrence contributes 1 or 2 half-units
      assert(w >= n && w <= 2 * n, s"weight outside the per-pair bounds: $r")
    }
    val ws = rows.map(_.getLong(3))
    assert(ws.zip(ws.tail).forall { case (a, b) => b <= a }, "must be sorted by weight desc")
  }

  test("unicode fold: planted accent/case copies merge into exactly 2-variant groups") {
    val rows = TextOps.qUnicodeFold(spark, sf).collect()
    val byKey = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byKey.contains((2L, 2L)), s"no folded groups found: ${byKey}")
    assert(byKey.keySet.forall { case (v, d) => d <= v && v <= 3 },
      s"unexpected group shapes: $byKey")
    // planted copies: every doc with id%7==0 or id%5==0 gets exactly one variant
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val planted = (0L until nDocs).count(i => i % 7 == 0 || i % 5 == 0)
    assert(byKey((2L, 2L)) == planted, "every planted variant must fold into its original")
  }

  test("mmr rerank: 5 distinct picks per probe, scores in the rel±maxsim envelope, deterministic") {
    val rows = VectorOps.qMmrRerank(spark, sf).collect()
    assert(rows.length == 25, "5 probes × 5 picks")
    rows.groupBy(_.getLong(0)).foreach { case (q, ps) =>
      assert(ps.map(_.getLong(2)).distinct.length == 5, s"repeat pick for probe $q")
    }
    // score = rel − max_sim with rel, sim ∈ [−1, 1]: bounded by ±2e6 µ-units
    rows.foreach(r => assert(math.abs(r.getLong(3)) <= 2000000L,
      s"score outside the cosine envelope: $r"))
    // greedy over quantized integers must be run-to-run stable
    val again = VectorOps.qMmrRerank(spark, sf).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("entry/exit: session counts conserve; bounces only where entry == exit") {
    val rows = AnalyticsOps.qEntryExit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), s"more bounces than sessions: $r")
      if (r.getString(0) != r.getString(1))
        assert(r.getLong(3) == 0, s"a 1-event session cannot have entry != exit: $r")
    }
    val totalSessions = rows.map(_.getLong(2)).sum
    val viaSessionize = {
      import org.apache.spark.sql.functions._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      spark.read.parquet(s"$sf/events.parquet")
        .withColumn("ms", unix_millis(col("ts")))
        .withColumn("prev", lag("ms", 1).over(w))
        .withColumn("is_new", when(col("prev").isNull ||
          col("ms") - col("prev") > 1800000L, 1L).otherwise(0L))
        .agg(sum("is_new")).head.getLong(0)
    }
    assert(totalSessions == viaSessionize, "entry/exit pairs must cover every session")
  }
}
