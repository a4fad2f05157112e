package graft

import graft.engine.{MultimodalOps, TextOps, VectorOps}
import graft.expressions.MultiPatternOps

/** Invariant checks for the round-15 additions — G.711 μ-law sample
  * decode, the Aho–Corasick multi-pattern scan, and the PQ
  * asymmetric-distance scan. The DuckDB differential at all three SFs
  * is the primary gate; these pin the laws the hash-compare can't
  * express. */
class Round15OpsSpec extends SparkSuite {

  test("u-law expansion: CCITT endpoint and zero codes decode to the spec values") {
    // code 0x00 → u=0xFF → sign, exp 7, mant 15 → −32124 (the G.711 max)
    assert(MultimodalOps.ulawToLinear(0x00) == -32124)
    assert(MultimodalOps.ulawToLinear(0x80) == 32124)
    // code 0xFF → u=0 → +0; code 0x7F → u=0x80 → −0 = 0
    assert(MultimodalOps.ulawToLinear(0xFF) == 0)
    assert(MultimodalOps.ulawToLinear(0x7F) == 0)
    // first positive segment steps by 8: u = 0..15 → 0, 8, 16, …
    (0 until 15).foreach { m =>
      assert(MultimodalOps.ulawToLinear(0xFF - (m + 1)) -
        MultimodalOps.ulawToLinear(0xFF - m) == 8)
    }
  }

  test("u-law expansion: monotone decreasing over positive codes, odd symmetry") {
    // u in 0..127 (codes 0xFF down to 0x80) is the positive half,
    // strictly non-decreasing in u; negative half mirrors it exactly.
    val pos = (0 to 127).map(u => MultimodalOps.ulawToLinear(~u & 0xff))
    assert(pos.zip(pos.tail).forall { case (a, b) => a <= b })
    (0 to 127).foreach { u =>
      val p = MultimodalOps.ulawToLinear(~u & 0xff)
      val n = MultimodalOps.ulawToLinear(~(u | 0x80) & 0xff)
      assert(n == -p, s"u=$u: negative half must mirror positive")
    }
  }

  test("u-law synth/decode twin: every sample equals the closed-form expansion") {
    (0L until 40L).foreach { id =>
      val a = 3 + (id % 11).toInt
      val b = (id % 256).toInt
      val n = 300 + (id % 150).toInt
      val out = MultimodalOps.decodeWavUlaw(MultimodalOps.makeWavUlaw(8000, a, b, n)).get
      assert(out.length == n)
      (0 until n).foreach { i =>
        val code = ((a * i + b + i * i) % 256 + 256) % 256
        assert(out(i) == MultimodalOps.ulawToLinear(code).toShort)
      }
    }
  }

  test("u-law decoder rejects non-mu-law containers") {
    assert(MultimodalOps.decodeWavUlaw(MultimodalOps.makeWavPcm(8000, 3, 5, 100)).isEmpty)
    assert(MultimodalOps.decodeWavUlaw(MultimodalOps.makeWavAdpcm(8000, 3, 5, 121)).isEmpty)
    assert(MultimodalOps.decodeWavUlaw(Array.fill[Byte](50)(0)).isEmpty)
  }

  test("Aho-Corasick: counts equal brute-force all-occurrence counts on random text") {
    val patterns = Array("ab", "bca", "aa", "abab", "c")
    val key = patterns.mkString(" ")
    val rng = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val text = Array.fill(rng.nextInt(60))("abc".charAt(rng.nextInt(3))).mkString
      val got = MultiPatternOps.automaton(key).countAll(text.getBytes("UTF-8"))
      patterns.zipWithIndex.foreach { case (p, i) =>
        var cnt = 0L
        var from = 0
        while ({ val k = text.indexOf(p, from); if (k >= 0) { cnt += 1; from = k + 1; true } else false }) ()
        assert(got(i) == cnt, s"pattern=$p text=$text got=${got(i)} want=$cnt")
      }
    }
  }

  test("Aho-Corasick: overlapping occurrences are all reported") {
    val key = "aaa aba"
    val got = MultiPatternOps.automaton(key).countAll("aaaaa".getBytes("UTF-8"))
    assert(got(0) == 3, "aaa occurs at 3 overlapping positions in aaaaa")
    val got2 = MultiPatternOps.automaton(key).countAll("ababab".getBytes("UTF-8"))
    assert(got2(1) == 2, "aba occurs at 2 overlapping positions in ababab")
  }

  test("blocklist terms are borderless, so AC counts equal replace-based counts") {
    TextOps.BlocklistTerms.foreach { t =>
      (1 until t.length).foreach { k =>
        assert(t.take(k) != t.takeRight(k),
          s"term '$t' has a border of length $k — replace-count would diverge")
      }
    }
  }

  test("q_blocklist_scan: one row per term, hits bounded by corpus size") {
    val df = TextOps.qBlocklistScan(spark, sf).collect()
    assert(df.length == TextOps.BlocklistTerms.length)
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    df.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 0L && r.getAs[Long]("n_docs") <= nDocs)
      assert(r.getAs[Long]("total_hits") >= r.getAs[Long]("n_docs"))
    }
  }

  test("GIF synth/decode twin: LZW+palette roundtrip is pixel-lossless at every doc shape") {
    javax.imageio.ImageIO.setUseCache(false)
    (0L until 30L).foreach { id =>
      val (a, b, c) = (2 + (id % 9).toInt, 1 + (id % 6).toInt, (id % 11).toInt * 8)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MultimodalOps.makeGradGif(a, b, c)))
      (0 until 16).foreach { y =>
        (0 until 16).foreach { x =>
          assert((img.getRGB(x, y) & 0xff) == (a * x + b * y + c) % 256,
            s"pixel ($x,$y) of doc $id lost in the GIF roundtrip")
        }
      }
    }
  }

  test("q_hll_union_md5: merge dominance and inclusion-exclusion sanity") {
    val r = graft.engine.ScaleOps.qHllUnionMd5(spark, sf).head()
    val (ea, eb, eu) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"))
    // register-max merge can only raise the estimate of either slice
    assert(eu >= math.max(ea, eb) - 1e-9, s"union est $eu below max($ea, $eb)")
    assert(r.getAs[Double]("est_inter") >= 0.0)
    val (xa, xb, xu) = (r.getAs[Long]("n_exact_a"), r.getAs[Long]("n_exact_b"),
      r.getAs[Long]("n_exact_union"))
    assert(xu <= xa + xb && xu >= math.max(xa, xb))
    assert(r.getAs[Long]("n_exact_inter") == xa + xb - xu)
  }

  test("q_phrase_query: posting-join counts match a direct string scan per doc") {
    val got = TextOps.qPhraseQuery(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
    val want = docs.map { r =>
      val toks = r.getString(1).trim.split("\\s+")
      r.getLong(0) -> (0 until toks.length - 1)
        .count(i => toks(i) == "fast" && toks(i + 1) == "scan").toLong
    }.filter(_._2 > 0).toMap
    // top-50 of the sf0.001 fixture is the full positive set
    if (want.size <= 50) assert(got == want)
    else got.foreach { case (d, n) => assert(want(d) == n) }
  }

  test("q_join_shuffle_hash: the hint survives into the executed plan") {
    // the query itself REQUIRES ShuffledHashJoin (it throws otherwise);
    // this pins that the requirement is real and results are sane
    val rows = graft.engine.Relational.qJoinShuffleHash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_items") > 0L))
  }

  test("q_shapley_attribution: efficiency law and non-negativity") {
    import org.apache.spark.sql.functions._
    val rows = graft.engine.AnalyticsOps.qShapleyAttribution(spark, sf).collect()
    assert(rows.map(_.getAs[String]("channel")).toSeq == Seq("click", "signup", "view"))
    rows.foreach(r => assert(r.getAs[Long]("sixths") >= 0L,
      "v is monotone, so every Shapley value is non-negative"))
    // efficiency: sum of sixths == 6 * (v(N) - v(empty))
    val u = graft.engine.Tables.events(spark, sf).groupBy("user_id")
      .agg((max(when(col("event_type") === "click", 1L).otherwise(0L)) +
        max(when(col("event_type") === "view", 2L).otherwise(0L)) +
        max(when(col("event_type") === "signup", 4L).otherwise(0L))).as("mask"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .collect()
    val vN = u.map(_.getAs[Long]("conv")).sum
    val v0 = u.filter(_.getAs[Long]("mask") == 0L).map(_.getAs[Long]("conv")).sum
    assert(rows.map(_.getAs[Long]("sixths")).sum == 6L * (vN - v0),
      "Shapley values must exactly distribute v(N) - v(empty)")
  }

  test("q_merkle_diff: differing buckets are exactly those touched by the drift") {
    import org.apache.spark.sql.functions._
    val got = graft.engine.ScaleOps.qMerkleDiff(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[String]("kind")).toMap
    val keys = graft.engine.Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long")).collect().map(_.getLong(0))
    val delB = keys.filter(_ % 1009 == 0).map(_ % 256).toSet
    val updB = keys.filter(_ % 997 == 0).map(_ % 256).toSet
    assert(got.keySet == (delB ++ updB), s"diff buckets ${got.keySet} vs expected ${delB ++ updB}")
    got.foreach { case (b, kind) =>
      if (delB.contains(b)) assert(kind == "rowcount")
      else assert(kind == "content", s"update-only bucket $b must be a content diff")
    }
  }

  test("q_point_in_polygon: parity matches a brute-force ray cast, both classes present") {
    val rows = graft.engine.StatsOps.qPointInPolygon(spark, sf).collect()
    assert(rows.length == 2, "both inside and outside classes must materialize")
    val got = rows.map(r => r.getAs[Long]("inside") -> r.getAs[Long]("n_users")).toMap
    val P = graft.engine.StatsOps.PipPolygon
    def inside(px: Long, py: Long): Boolean = {
      var c = 0
      P.indices.foreach { i =>
        val (x1, y1) = P(i); val (x2, y2) = P((i + 1) % P.size)
        if ((y1 > py) != (y2 > py)) {
          val t = (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1)
          if ((y2 > y1 && t < 0) || (y2 < y1 && t > 0)) c += 1
        }
      }
      c % 2 == 1
    }
    val users = graft.engine.Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    val wantIn = users.count(u => inside((u * 131) % 1000, (u * 211) % 1000)).toLong
    assert(got(1L) == wantIn && got(0L) == users.length - wantIn)
  }

  test("q_collocation_g2: scores are non-negative and supported pairs only") {
    val rows = graft.engine.TextOps.qCollocationG2(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pair") >= 5L)
      assert(r.getAs[Double]("g2") >= 0.0, "G-squared is a deviance, never negative")
    }
  }

  test("unigram segmentation: hand-walked costs, Viterbi beats greedy where it must") {
    // "the"(7) + "table"(9) + "scan"(8) + 8 fallback chars (11 each) = 112
    val (mc1, gc1) = TextOps.unigramSegmentCosts("thetablescanqqqqqqqq")
    assert(mc1 == 7 + 9 + 8 + 8 * 11, s"got $mc1")
    assert(gc1 == mc1, "no overlap traps here, greedy finds the same split")
    // greedy trap: "batchescan..." greedy eats "batch"(9), pays e(11),
    // then "scan"(8) = 28; Viterbi can't do better here (b-a-t-c-h-e
    // singles are worse), so equal — but on "ascan": greedy eats "a"? no,
    // singles excluded from greedy: greedy: a(11)+scan(8)=19; Viterbi:
    // a(5)+scan(8)=13 — strictly better.
    val (mc2, gc2) = TextOps.unigramSegmentCosts("ascan")
    assert(mc2 == 5 + 8 && gc2 == 11 + 8, s"got $mc2/$gc2")
    assert(mc2 < gc2)
    // all-fallback string
    val (mc3, gc3) = TextOps.unigramSegmentCosts("zzzz")
    assert(mc3 == 44 && gc3 == 44)
  }

  test("q_unigram_segment: min_cost <= greedy_cost on every document") {
    val rows = TextOps.qUnigramSegment(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mc, gc) = (r.getAs[Long]("min_cost"), r.getAs[Long]("greedy_cost"))
      assert(mc <= gc, s"doc ${r.getLong(0)}: Viterbi $mc must not exceed greedy $gc")
      assert(mc >= TextOps.UnigramPrefixLen * 5 / 8 && gc <= TextOps.UnigramPrefixLen * 11,
        "costs bounded by cheapest-piece and all-fallback rates")
    }
  }

  test("q_randomized_response: md5 coins replay exactly, debias formula holds") {
    val r = graft.engine.CurationOps.qRandomizedResponse(spark, sf).head()
    val users = graft.engine.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("truth"))
      .collect().map(x => x.getLong(0) -> x.getLong(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    var nRep = 0L
    users.foreach { case (uid, truth) =>
      md.reset()
      val hex = md.digest(s"$uid:rr".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      val coin = java.lang.Long.parseLong(hex, 16) % 4
      nRep += (if (coin < 3) truth else 1L - truth)
    }
    assert(r.getAs[Long]("n_reported") == nRep, "coin replay must match")
    assert(r.getAs[Long]("n_users") == users.length.toLong)
    val est = math.floor((2.0 * nRep / users.length - 0.5) * 10000.0 + 0.5) / 10000.0
    assert(math.abs(r.getAs[Double]("est_rate") - est) < 1e-12)
  }

  test("q_ransac_line: one winner, consensus bounded by the day count") {
    val rows = graft.engine.MiningOps.qRansacLine(spark, sf).collect()
    assert(rows.length == 16)
    assert(rows.map(_.getAs[Long]("is_best")).sum == 1L, "exactly one best trial")
    val nDays = graft.engine.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate"))).distinct().count()
    val best = rows.filter(_.getAs[Long]("is_best") == 1L).head.getAs[Long]("n_inliers")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_inliers") >= 2L, "the 2 sample points are always inliers")
      assert(r.getAs[Long]("n_inliers") <= nDays)
      assert(r.getAs[Long]("n_inliers") <= best, "winner has the max consensus")
    }
  }

  test("q_permutation_test: p-value bounds and determinism") {
    val r1 = graft.engine.StatsOps.qPermutationTest(spark, sf).head()
    val r2 = graft.engine.StatsOps.qPermutationTest(spark, sf).head()
    assert(r1 == r2, "md5-seeded permutations must be run-to-run stable")
    assert(r1.getAs[Long]("n_perms") == 64L)
    val p = r1.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
    assert(r1.getAs[Long]("n_ge") <= 64L)
    assert(math.abs(p - math.floor((r1.getAs[Long]("n_ge") + 1) / 65.0 * 10000.0 + 0.5) / 10000.0) < 1e-12)
  }

  test("q_lsh_recall_audit: contingency bounds and tau monotonicity") {
    val rows = TextOps.qLshRecallAudit(spark, sf).collect()
    assert(rows.length == 4)
    var prevTrue = Long.MaxValue
    rows.foreach { r =>
      val (nt, nc, tp) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_cand"),
        r.getAs[Long]("tp"))
      assert(tp <= math.min(nt, nc), "true positives bounded by both margins")
      assert(nt <= prevTrue, "ground-truth pair count shrinks as tau rises")
      prevTrue = nt
      assert(r.getAs[Double]("recall") >= 0.0 && r.getAs[Double]("recall") <= 1.0)
      assert(r.getAs[Double]("precision") >= 0.0 && r.getAs[Double]("precision") <= 1.0)
    }
  }

  test("q_uplift_segments: arms partition users, uplift is grid-exact") {
    val rows = graft.engine.StatsOps.qUpliftSegments(spark, sf).collect()
    assert(rows.length == 3)
    val total = rows.map(r => r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl")).sum
    val nUsers = graft.engine.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(total == nUsers, "segments x arms must partition the user base")
    rows.foreach { r =>
      val (rt, rc) = (r.getAs[Double]("rate_treat"), r.getAs[Double]("rate_ctrl"))
      assert(rt >= 0.0 && rt <= 1.0 && rc >= 0.0 && rc <= 1.0)
      assert(math.abs(r.getAs[Double]("uplift") - (rt - rc)) < 1e-12,
        "uplift must be exactly the difference of the quantized rates")
    }
  }

  test("q_prefix_autocomplete: completions carry their prefix, ranks dense, freq ordered") {
    val rows = TextOps.qPrefixAutocomplete(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prefix")).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      sorted.foreach(r => assert(r.getAs[String]("completion").startsWith(p)))
      val freqs = sorted.map(_.getAs[Long]("freq"))
      assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_pq_adc_scan: top-10 ascending exact-integer distances, query excluded") {
    val rows = VectorOps.qPqAdcScan(spark, sf).collect()
    assert(rows.length == 10)
    val adcs = rows.map(_.getAs[Long]("adc_u"))
    assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b })
    assert(rows.forall(_.getAs[Long]("vec_id") != 0L))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("adc_dist") -
        r.getAs[Long]("adc_u").toDouble / 1e6) < 1e-12)
    }
  }
}
