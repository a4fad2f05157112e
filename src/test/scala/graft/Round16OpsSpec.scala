package graft

import graft.engine.{MiningOps, StatsOps, Tables}

/** Invariant checks for the round-16 additions — t-closeness and the
  * ALS half-step. The DuckDB differential at all three SFs is the
  * primary gate; these pin the algebraic laws the hash-compare can't
  * express. */
class Round16OpsSpec extends SparkSuite {

  test("q_tcloseness: classes match l-diversity's, emd is the quantized rational, gate is integral") {
    val t = StatsOps.qTcloseness(spark, sf).collect()
    assert(t.nonEmpty)
    val lDiv = StatsOps.qLDiversity(spark, sf).collect()
      .map(r => (r.getAs[Long]("nation"), r.getAs[Long]("bal_bucket")) ->
        r.getAs[Long]("n")).toMap
    assert(t.length == lDiv.size, "t-closeness must audit every QI class")
    t.foreach { r =>
      val key = (r.getAs[Long]("nation"), r.getAs[Long]("bal_bucket"))
      assert(lDiv(key) == r.getAs[Long]("n"), s"class size drifted for $key")
      val (num, den) = (r.getAs[Long]("emd_num"), r.getAs[Long]("emd_den"))
      assert(num >= 0L && den > 0L && num <= den,
        "total variation lives in [0, 1] as a rational")
      assert(r.getAs[Double]("emd") ==
        math.floor(num.toDouble * 10000.0 / den + 0.5) / 10000.0,
        "reported emd must be exactly the quantized rational")
      assert(r.getAs[Int]("t_close") == (if (num * 5L <= den) 1 else 0),
        "the t<=0.2 gate must be the integer cross-multiplied comparison")
    }
  }

  test("q_tcloseness: a uniform-mix class would pass, a one-segment class of size>n/5 fails") {
    // Structural: any class whose sensitive mix IS the global mix has
    // emd_num = 0 (every cross-multiplied term cancels); a class
    // concentrated on one segment has emd = 1 - g/N >= 0.2 whenever
    // that segment holds under 80% of the corpus. Checked on the
    // fixture: at least one class must fail t-closeness (segments are
    // near-uniform, so a small concentrated class always leaks).
    val t = StatsOps.qTcloseness(spark, sf).collect()
    assert(t.exists(_.getAs[Int]("t_close") == 0),
      "fixture has small concentrated classes; none failing means the distance collapsed")
  }

  test("q_als_step: solved numerators satisfy the ridge normal equations exactly") {
    val rows = MiningOps.qAlsStep(spark, sf).collect()
    assert(rows.nonEmpty)
    // Recompute the per-user Gram from the same ratings to cross-check
    // det/b against the closed-form solve: a11*w1n + a12*w2n == det*b1
    // and a12*w1n + a22*w2n == det*b2 hold as EXACT integer identities
    // (substitute the cofactor formulas). Verify via the emitted longs:
    // reconstruct a11, a22, a12, b1, b2 from det/w-num is undetermined,
    // so instead re-derive the Gram independently in-JVM.
    import org.apache.spark.sql.functions._
    val ratings = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("r"))
      .collect()
    def fac(p: Long, off: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(p.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(off - 1, off + 3), 16) % 5L - 2L
    }
    val gram = ratings.groupBy(_.getAs[Long]("c")).map { case (c, rs) =>
      val trip = rs.map(r =>
        (fac(r.getAs[Long]("p"), 1), fac(r.getAs[Long]("p"), 5),
          r.getAs[Long]("r")))
      val a11 = trip.map(t => t._1 * t._1).sum + 1L
      val a22 = trip.map(t => t._2 * t._2).sum + 1L
      val a12 = trip.map(t => t._1 * t._2).sum
      val b1 = trip.map(t => t._1 * t._3).sum
      val b2 = trip.map(t => t._2 * t._3).sum
      c -> (a11, a22, a12, b1, b2)
    }
    rows.foreach { r =>
      val (a11, a22, a12, b1, b2) = gram(r.getAs[Long]("custkey"))
      val det = r.getAs[Long]("det")
      val (w1n, w2n) = (r.getAs[Long]("w1_num"), r.getAs[Long]("w2_num"))
      assert(det == a11 * a22 - a12 * a12, "determinant drifted from the Gram")
      assert(det >= 1L, "ridge lambda=1 must keep the system positive definite")
      assert(a11 * w1n + a12 * w2n == det * b1, "normal equation 1 violated")
      assert(a12 * w1n + a22 * w2n == det * b2, "normal equation 2 violated")
    }
  }

  test("q_textrank: top-20 content words, integral fixed-point scores, deterministic") {
    val rows = graft.engine.TextOps.qTextrank(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[String]("word").length >= 4, "content-word filter leaked")
      val u = r.getAs[Long]("textrank_u")
      assert(u >= 150000L, "score floor is the (1-d) teleport mass")
      assert(r.getAs[Double]("textrank") == u.toDouble / 1e6)
      assert(r.getAs[Long]("strength") >= r.getAs[Long]("deg"),
        "edge weights are >= 1 so strength >= degree")
    }
    val scores = rows.map(_.getAs[Long]("textrank_u"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val again = graft.engine.TextOps.qTextrank(spark, sf).collect()
      .map(_.getAs[Long]("textrank_u"))
    assert(scores.toSeq == again.toSeq, "fixed-point sweeps must be run-stable")
  }

  test("q_holt_winters: in-JVM replay of the triple-smoothing recurrence matches") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(expr("CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)")).as("cents"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rs) =>
        t -> rs.sortBy(_.getAs[java.sql.Date]("day").toString)
          .map(_.getAs[Long]("cents").toDouble / 100.0)
      }
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    val rows = StatsOps.qHoltWinters(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = daily(r.getAs[String]("event_type"))
      assert(xs.length >= 15 && xs.length == r.getAs[Long]("n_days"))
      val w1 = xs.take(7).reduceLeft(_ + _)
      val w2 = xs.slice(7, 14).reduceLeft(_ + _)
      var lvl = w1 / 7.0; var trd = (w2 - w1) / 49.0
      val s = xs.take(7).map(_ - lvl).toBuffer
      var pos = 0
      for (i <- 7 until xs.length) {
        val v = xs(i); val sOld = s(pos)
        val lvl2 = 0.5 * (v - sOld) + 0.5 * (lvl + trd)
        val trd2 = 0.25 * (lvl2 - lvl) + 0.75 * trd
        s(pos) = 0.25 * (v - lvl2) + 0.75 * sOld
        lvl = lvl2; trd = trd2; pos = (pos + 1) % 7
      }
      assert(r.getAs[Double]("level") == r4(lvl), "level drifted from the replay")
      assert(r.getAs[Double]("trend") == r4(trd), "trend drifted from the replay")
      (1 to 7).foreach { k =>
        assert(r.getAs[Double](s"s$k") == r4(s(k - 1)), s"seasonal slot $k drifted")
      }
      assert(r.getAs[Double]("forecast_1d") == r4(lvl + trd + s(pos)),
        "forecast must be level + trend + next seasonal slot")
    }
  }

  test("hilbert generator: order-4 walk is a bijection with unit-step adjacency") {
    import org.apache.spark.sql.functions._
    // A dense 16x16 grid through the SAME generated SQL the query and
    // oracle share: d must be a bijection of 0..255 and every
    // consecutive pair of cells must be grid neighbors (L1 distance
    // exactly 1) — the property that DEFINES a Hilbert curve and that
    // z-order provably lacks.
    val grid = spark.range(256)
      .selectExpr("CAST(id % 16 AS BIGINT) AS x0",
        "CAST(id DIV 16 AS BIGINT) AS y0", "CAST(0 AS BIGINT) AS d0",
        "CAST(id % 16 AS BIGINT) AS gx", "CAST(id DIV 16 AS BIGINT) AS gy")
    val walked = graft.engine.ScaleOps.hilbertApply(grid, 4)
      .select(col("d4").cast("long"), col("gx"), col("gy"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(walked.map(_._1).sorted.toSeq == (0L until 256L).toSeq,
      "order-4 Hilbert index must be a bijection of 0..255")
    val byD = walked.sortBy(_._1)
    byD.zip(byD.tail).foreach { case ((_, x1, y1), (d, x2, y2)) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1,
        s"step into d=$d jumps more than one cell: ($x1,$y1)->($x2,$y2)")
    }
  }

  test("q_hilbert_layout: hilbert dominates zorder on every locality metric") {
    val rows = graft.engine.ScaleOps.qHilbertLayout(spark, sf).collect()
      .map(r => r.getAs[String]("curve") -> r).toMap
    val (h, z) = (rows("hilbert"), rows("zorder"))
    assert(h.getAs[Long]("n_cells") == z.getAs[Long]("n_cells"))
    assert(h.getAs[Long]("total_jump") < z.getAs[Long]("total_jump"),
      "hilbert must have strictly less total curve jump than morton")
    assert(h.getAs[Long]("max_jump") <= z.getAs[Long]("max_jump"))
    assert(h.getAs[Double]("unit_step_share") > z.getAs[Double]("unit_step_share"))
    assert(h.getAs[Long]("sum_bbox_area") < z.getAs[Long]("sum_bbox_area"),
      "unaligned-range bboxes must be tighter under hilbert")
  }

  test("q_rle_audit: run counts bracketed, blocks shared, cardinality orders ratios") {
    val rows = graft.engine.ScaleOps.qRleAudit(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(rows.size == 5)
    val blocks = rows.values.map(_.getAs[Long]("n_blocks")).toSet
    assert(blocks.size == 1, "every column sees the same physical blocks")
    rows.values.foreach { r =>
      val (nr, nb, runs) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_blocks"),
        r.getAs[Long]("n_runs"))
      assert(runs >= nb && runs <= nr,
        "each block starts a run; a run needs at least one row")
    }
    assert(rows("l_returnflag").getAs[Double]("rle_ratio") <
      rows("l_quantity").getAs[Double]("rle_ratio"),
      "a 3-value flag must RLE-compress better than a ~50-value measure")
  }

  test("q_assoc_rules: directional pairs share lift, confidence bounded by support algebra") {
    val rows = graft.engine.RelationalExt.qAssocRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, na, nc) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_ante"),
        r.getAs[Long]("n_cons"))
      assert(n >= 3L, "support threshold must hold")
      assert(n <= na && n <= nc, "joint support cannot exceed a marginal")
      val conf = r.getAs[Double]("confidence")
      assert(conf == math.floor(n.toDouble * 10000.0 / na + 0.5) / 10000.0)
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
    // A->B and B->A derive from the same unordered pair: if both made
    // the top-40, their lifts are the identical quantized rational.
    rows.groupBy(r => {
      val (a, b) = (r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"))
      (math.min(a, b), math.max(a, b))
    }).values.filter(_.length == 2).foreach { pair =>
      assert(pair(0).getAs[Double]("lift") == pair(1).getAs[Double]("lift"),
        "lift is symmetric in the rule direction")
    }
  }

  test("q_front_coding: in-JVM replay of the blocked prefix layout matches exactly") {
    import org.apache.spark.sql.functions._
    val vocab = graft.engine.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select("w").distinct().collect().map(_.getString(0))
    def cpl(a: String, b: String): Long =
      (1 to 30).count(k => a.take(k) == b.take(k)).toLong
    val expected = vocab.groupBy(_.substring(0, 1)).map { case (letter, ws) =>
      val sorted = ws.sorted
      var (plain, front, shared) = (0L, 0L, 0L)
      sorted.zipWithIndex.foreach { case (w, i) =>
        plain += w.length + 1
        val c = if (i == 0) 0L else cpl(sorted(i - 1), w)
        shared += c
        front += (if (i % 16 == 0) w.length + 1L else w.length - c + 2L)
      }
      letter -> (sorted.length.toLong, plain, front, shared)
    }
    val rows = graft.engine.TextOps.qFrontCoding(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, p, f, sh) = expected(r.getAs[String]("letter"))
      assert(r.getAs[Long]("n_words") == n)
      assert(r.getAs[Long]("plain_bytes") == p, "plain cost drifted")
      assert(r.getAs[Long]("front_bytes") == f, "front-coded cost drifted")
      assert(r.getAs[Long]("shared_chars") == sh, "prefix sum drifted")
    }
  }

  test("q_kruskal_wallis: doubled rank sums obey N(N+1) and H replays in-JVM") {
    import org.apache.spark.sql.functions._
    // independent in-JVM replay from the raw orders table
    val raw = Tables.orders(spark, sf).select(
      year(col("o_orderdate")).cast("int").as("yr"),
      col("o_orderpriority").as("grp"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val expected = raw.groupBy(_._1).flatMap { case (yr, rows) =>
      val n = rows.length.toLong
      // doubled average rank per value from the sorted tie histogram
      val hist = rows.groupBy(_._3).map { case (c, g) => c -> g.length.toLong }
      val sortedVals = hist.keys.toArray.sorted
      var cum = 0L
      val d2 = scala.collection.mutable.Map[Long, Long]()
      sortedVals.foreach { c =>
        d2(c) = 2L * cum + hist(c) + 1L; cum += hist(c)
      }
      val byGrp = rows.groupBy(_._2).map { case (g, rs) =>
        g -> (rs.map(r => d2(r._3)).sum, rs.length.toLong)
      }
      val sumD = byGrp.values.map(_._1).sum
      assert(sumD == n * (n + 1L), s"yr $yr: doubled rank sums must total N(N+1)")
      val tsum = hist.values.map(t => t * t * t - t).sum
      if (n < 50L || tsum.toDouble >= n.toDouble * n * n - n) None
      else {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val sumterm = prios.map { p =>
          byGrp.get(p).filter(_._2 > 0L)
            .map { case (dg, ng) => dg.toDouble * dg / (4.0 * ng) }
            .getOrElse(0.0)
        }.reduceLeft(_ + _)
        val nd = n.toDouble
        val h = math.floor((12.0 * sumterm / nd / (nd + 1.0) - 3.0 * (nd + 1.0)) /
          (1.0 - tsum.toDouble / (nd * n * n - n)) * 10000.0 + 0.5) / 10000.0
        val k = prios.count(p => byGrp.get(p).exists(_._2 > 0L)).toLong
        Some(yr -> (n, k, tsum, h))
      }
    }.toMap
    val rows = MiningOps.qKruskalWallis(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, k, tsum, h) = expected(r.getAs[Int]("yr"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("k_groups") == k)
      assert(r.getAs[Long]("tsum") == tsum, "tie correction drifted")
      assert(r.getAs[Double]("h") == h, "H statistic drifted from the replay")
      assert(r.getAs[Double]("h") >= 0.0, "H is a scaled variance, never negative")
    }
  }

  test("q_soundex_blocking: generated SQL matches reference soundex; merging only coarsens") {
    import org.apache.spark.sql.functions._
    def refSoundex(w: String): String = {
      def code(c: Char): Char = c match {
        case 'b' | 'f' | 'p' | 'v' => '1'
        case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => '2'
        case 'd' | 't' => '3'
        case 'l' => '4'
        case 'm' | 'n' => '5'
        case 'r' => '6'
        case _ => '0'
      }
      val sb = new StringBuilder
      var prev = code(w.head)
      w.tail.foreach { c =>
        val k = code(c)
        if (k != '0' && k != prev) sb += k
        if (c != 'h' && c != 'w') prev = k
      }
      (w.head.toUpper + sb.result().padTo(3, '0').toString).take(4)
    }
    // classic algorithm fixtures: h/w transparency, vowel reset, first-letter collapse
    assert(refSoundex("robert") == "R163" && refSoundex("rupert") == "R163")
    assert(refSoundex("ashcraft") == "A261", "h-transparency must merge s/c")
    assert(refSoundex("tymczak") == "T522", "vowel reset must re-emit")
    assert(refSoundex("pfister") == "P236", "first-letter code collapses the f")
    // the staged generated-SQL soundex must equal the streaming reference
    var tok = Tables.part(spark, sf)
      .select(split(col("p_name"), " ").getItem(0).as("w"))
      .filter(col("w").rlike("^[a-z]{1,12}$")).distinct()
    (1 to 12).foreach(j => tok = tok.withColumn(s"c$j",
      expr(s"(CASE WHEN substr(w, $j, 1) IN ('b', 'f', 'p', 'v') THEN '1'" +
        s" WHEN substr(w, $j, 1) IN ('c', 'g', 'j', 'k', 'q', 's', 'x', 'z') THEN '2'" +
        s" WHEN substr(w, $j, 1) IN ('d', 't') THEN '3'" +
        s" WHEN substr(w, $j, 1) = 'l' THEN '4'" +
        s" WHEN substr(w, $j, 1) IN ('m', 'n') THEN '5'" +
        s" WHEN substr(w, $j, 1) = 'r' THEN '6' ELSE '0' END)")))
    // assemble exactly as the query does, via the shared generator
    // (the same sxAssemble instance both the Spark plan and the oracle
    // SQL embed — no fragile string-parsing of the oracle text)
    val asm = MiningOps.sxAssemble("w", 12)
    tok.withColumn("sx", expr(asm)).collect().foreach { r =>
      val (w, sx) = (r.getAs[String]("w"), r.getAs[String]("sx"))
      assert(sx == refSoundex(w), s"generated soundex('$w') = $sx != ${refSoundex(w)}")
    }
    val rows = MiningOps.qSoundexBlocking(spark, sf).collect()
      .map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("n_blocks"), r.getAs[Long]("max_block"),
          r.getAs[Long]("cand_pairs"), r.getAs[Long]("n_rows"))).toMap
    val (e, p) = (rows("exact"), rows("soundex"))
    assert(e._4 == p._4, "both schemes block the identical row set")
    assert(p._1 <= e._1, "phonetic merging can only reduce block count")
    assert(p._2 >= e._2 && p._3 >= e._3,
      "coarser blocks mean a larger worst block and candidate budget")
  }

  test("q_cochran_q: in-JVM replay matches; Q invariant to all-one blocks") {
    import org.apache.spark.sql.functions._
    val treatments = Seq("view", "click", "purchase")
    // replay Q from (mon, user, day, typ) cells with the engines' exact tree
    def qOf(cells: Seq[(String, Long, String, String)]): Map[String, (Long, Long, Double)] =
      cells.groupBy(_._1).flatMap { case (mon, rows) =>
        val g = treatments.map(t => rows.count(_._4 == t).toLong)
        val ls = rows.groupBy(r => (r._2, r._3)).values.map(_.length.toLong)
        val den = 3L * ls.sum - ls.map(l => l * l).sum
        if (den <= 0L) None else {
          val sq = g.map(x => x.toDouble * x).reduceLeft(_ + _)
          val tot = g.sum
          val num = 3.0 * sq - tot.toDouble * tot
          val q = math.floor(2.0 * num / den * 10000.0 + 0.5) / 10000.0
          Some(mon -> (ls.size.toLong, den, q))
        }
      }
    val cells = Tables.events(spark, sf)
      .filter(col("event_type").isin(treatments: _*))
      .select(date_format(col("ts"), "yyyy-MM").as("mon"),
        col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("event_type").as("typ"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq
    val expected = qOf(cells)
    val rows = MiningOps.qCochranQ(spark, sf).collect()
    assert(rows.length == expected.size && rows.nonEmpty)
    rows.foreach { r =>
      val (nu, den, q) = expected(r.getAs[String]("mon"))
      assert(r.getAs[Long]("n_blocks") == nu)
      assert(r.getAs[Long]("den") == den, "exact-long denominator drifted")
      assert(r.getAs[Double]("q_stat") == q, "Q drifted from the replay")
      assert(r.getAs[Double]("q_stat") >= 0.0)
    }
    // invariance: users who did ALL k treatments shift every G_j
    // equally and contribute 0 to the denominator — synthetic
    // all-one blocks must leave every month's Q bit-identical
    val mon0 = cells.head._1
    val synth = (1 to 7).flatMap(i =>
      treatments.map(t => (mon0, -i.toLong, s"$mon0-01", t)))
    val augmented = qOf(cells ++ synth)
    expected.foreach { case (mon, (_, den, q)) =>
      assert(augmented(mon)._2 == den && augmented(mon)._3 == q,
        s"all-one blocks must not move Q (month $mon)")
    }
  }

  test("q_mcnemar: in-JVM replay of detectors and corrected chi-square") {
    val docs = Tables.documents(spark, sf)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      var (b, c, nEn) = (0L, 0L, 0L)
      rows.foreach { case (_, lang, text) =>
        val y = lang == "en"
        val pa = text.toLowerCase.contains(" the ")
        val pb = text.getBytes("UTF-8").length ==
          text.codePointCount(0, text.length)
        if (y) nEn += 1
        if (pa == y && pb != y) b += 1
        if (pa != y && pb == y) c += 1
      }
      val chi = if (math.abs(b - c) <= 1L || b + c == 0L) 0.0
        else math.floor((math.abs(b - c) - 1L).toDouble * (math.abs(b - c) - 1L) /
          (b + c) * 10000.0 + 0.5) / 10000.0
      src -> (rows.length.toLong, nEn, b, c, chi)
    }
    val rows = MiningOps.qMcnemar(spark, sf).collect()
    assert(rows.length == expected.size && rows.nonEmpty)
    rows.foreach { r =>
      val (n, nEn, b, c, chi) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_en") == nEn, "label count drifted")
      assert(r.getAs[Long]("b") == b && r.getAs[Long]("c") == c,
        "discordant-pair counts drifted from the replayed detectors")
      assert(r.getAs[Double]("chi2_cc") == chi, "chi-square drifted")
    }
  }

  test("q_als_step: covers exactly the customers with ordered lineitems") {
    import org.apache.spark.sql.functions._
    val n = MiningOps.qAlsStep(spark, sf).count()
    val expected = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_custkey").distinct().count()
    assert(n == expected, "one solved row per rated user, no drops, no dups")
  }
}
