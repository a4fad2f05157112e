package graft

import org.apache.spark.sql.functions._

/** Spot-checks of the relational inventory at sf0.001 (the DuckDB
  * differential at sf0.01 is the primary gate — these catch plan-shape
  * regressions early and document invariants). */
class RelationalSpec extends SparkSuite {
  import graft.engine.Relational._

  test("every SparkEntry query runs and q-with-oracle keys line up") {
    val qs = SparkEntry.queries
    val missingOracle = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missingOracle.isEmpty, s"oracles without queries: $missingOracle")
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("README query/oracle counts match SparkEntry (drift guard)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = "(\\d+) queries, (\\d+) DuckDB oracles".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states query/oracle counts")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)} queries; SparkEntry has ${SparkEntry.queries.size}")
    assert(m.get.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.get.group(2)} oracles; SparkEntry has ${SparkEntry.oracleSql.size}")
    // Second README occurrence (Correctness section): "(N oracles)".
    val m2 = "\\((\\d+) oracles\\) in DuckDB".r.findFirstMatchIn(readme)
    assert(m2.isDefined, "README Correctness section no longer states the oracle count")
    assert(m2.get.group(1).toInt == SparkEntry.oracleSql.size,
      s"README Correctness section says ${m2.get.group(1)} oracles; " +
        s"SparkEntry has ${SparkEntry.oracleSql.size}")
  }

  test("twin contract: the no-oracle key set is exactly the documented 5 (drift guard)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val documented = Set("q_agg_approx_distinct", "q_hll_sketch",
      "q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram_jaccard")
    assert(noOracle == documented,
      s"no-oracle keys drifted from the README twin table: $noOracle")
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    documented.foreach { k =>
      assert(readme.contains(s"`$k`"), s"README twin table must list $k")
    }
    // every twin named in the table must exist AND carry an oracle
    Seq("q_hll_md5", "q_dedup_minhash_md5", "q_dedup_simhash_md5",
      "q_minhash_jaccard_est").foreach { t =>
      assert(SparkEntry.oracleSql.contains(t), s"twin $t must be oracled")
    }
  }

  test("SURVEY.md current-totals line matches SparkEntry (drift guard)") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    // The LAST "current totals X queries / Y oracles" line is the live one.
    val ms = "current totals (\\d+) queries / (\\d+) oracles".r
      .findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty, "SURVEY.md no longer states current totals")
    val last = ms.last
    assert(last.group(1).toInt == SparkEntry.queries.size,
      s"SURVEY says ${last.group(1)} queries; SparkEntry has ${SparkEntry.queries.size}")
    assert(last.group(2).toInt == SparkEntry.oracleSql.size,
      s"SURVEY says ${last.group(2)} oracles; SparkEntry has ${SparkEntry.oracleSql.size}")
  }

  test("every SURVEY.md §2c declared key is implemented") {
    val declared = Seq(
      "q_scan_project", "q_filter_predicate", "q_limit_topn",
      "q_join_broadcast", "q_join_smj", "q_join_semi_anti",
      "q_agg_hash", "q_agg_distinct", "q_agg_rollup",
      "q_window_rank", "q_window_frame", "q_setops", "q_scalar_funcs",
      "q_json_infer", "q_kafka_meta", "q_type_promotion",
      "q_dedup_exact", "q_dedup_minhash", "q_text_stats",
      "q_vector_topk", "q_stream_tumbling", "q_stream_session_ttl",
      "q_buffer_eviction", "q_csv_roundtrip")
    val missing = declared.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"§2c keys missing from SparkEntry.queries: $missing")
  }

  test("unsigned widening map preserves value ranges (§1.3)") {
    import graft.engine.SchemaRules
    import org.apache.spark.sql.types._
    assert(SchemaRules.unsignedWidening("uint8") == ShortType)    // 255 fits
    assert(SchemaRules.unsignedWidening("uint16") == IntegerType) // 65535 fits
    assert(SchemaRules.unsignedWidening("uint32") == LongType)
    assert(SchemaRules.unsignedWidening("uint64") == DecimalType(20, 0)) // 2^64-1 has 20 digits
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_agg_hash groups cover the full lineitem rowcount") {
    val li = graft.engine.Tables.lineitem(spark, sf).count()
    val agg = qAggHash(spark, sf)
    assert(agg.agg(sum("count_order")).head().getLong(0) == li)
  }

  test("semi + anti partition customers exactly") {
    val c = graft.engine.Tables.customer(spark, sf).count()
    val parts = qJoinSemiAnti(spark, sf)
    assert(parts.agg(sum("n")).head().getLong(0) == c)
  }

  test("top-N is the global maximum prefix") {
    val topn = qLimitTopN(spark, sf).collect()
    val globalMax = graft.engine.Tables.orders(spark, sf)
      .agg(max("o_totalprice")).head().getDouble(0)
    assert(topn.head.getDouble(2) == globalMax)
    val prices = topn.map(_.getDouble(2))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("rollup emits per-group, subtotal and grand-total rows") {
    val r = qAggRollup(spark, sf)
    assert(r.filter(col("rf") === "ALL" && col("ls") === "ALL").count() == 1)
    val grand = r.filter(col("rf") === "ALL" && col("ls") === "ALL")
      .head().getLong(3)
    assert(grand == graft.engine.Tables.lineitem(spark, sf).count())
  }

  test("grouping sets: each set's counts cover the table") {
    val li = graft.engine.Tables.lineitem(spark, sf).count()
    val gs = qGroupingSets(spark, sf).collect()
    Seq("by_returnflag", "by_linestatus").foreach { dim =>
      val n = gs.filter(_.getString(0) == dim).map(_.getLong(3)).sum
      assert(n == li, s"$dim counts should sum to the full rowcount")
    }
  }

  test("full outer join covers both dangling sides") {
    val out = qJoinOuter(spark, sf)
    // left-dangling: positive-balance customers with no qualifying
    // orders (n_orders = 0); right-dangling: owners of qualifying
    // orders whose customer row was filtered out (segment = UNKNOWN)
    assert(out.filter(col("n_orders") === 0).count() > 0)
    assert(out.filter(col("segment") === "UNKNOWN").count() > 0)
    val custs = graft.engine.Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 0).count()
    assert(out.count() > custs)
  }

  test("hash sample is deterministic and ~1/8") {
    val a = qSampleHash(spark, sf).count()
    val b = qSampleHash(spark, sf).count()
    val total = graft.engine.Tables.lineitem(spark, sf).count()
    assert(a == b, "hash sample must be reproducible")
    assert(a > total / 16 && a < total / 4, s"sample $a of $total should be ~1/8")
  }

  test("scalar subquery avg matches direct aggregate") {
    val direct = graft.engine.Tables.orders(spark, sf)
      .agg(round(avg("o_totalprice"), 2)).head().getDouble(0)
    val viaQuery = qScalarSubquery(spark, sf).head().getDouble(2)
    assert(viaQuery == direct)
  }

  test("histogram buckets tile the value range without overlap") {
    val h = qHistogram(spark, sf).collect()
    h.foreach { r =>
      val bucket = r.getLong(0); val lo = r.getDouble(2); val hi = r.getDouble(3)
      assert(lo >= bucket * 25000.0 - 0.01 && hi < (bucket + 1) * 25000.0 + 0.01)
    }
    assert(h.map(_.getLong(1)).sum == graft.engine.Tables.orders(spark, sf).count())
  }

  test("broadcast join plan actually broadcasts the dimensions") {
    val plan = qJoinBroadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = qFilterPredicate(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [Or("), s"expected pushed Or filter in:\n$plan")
  }

  test("scalar subquery plans as a 1-row broadcast, not a shuffle") {
    val plan = qScalarSubquery(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected the aggregate broadcast in:\n${plan.take(1200)}")
  }

  test("grouping sets plan uses one Expand + one aggregate, not two scans") {
    val plan = qGroupingSets(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets should plan via Expand")
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      "grouping sets must read lineitem exactly once")
  }

  test("histogram aggregates partially before the shuffle") {
    val plan = qHistogram(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected hash aggregate in:\n${plan.take(800)}")
  }

  test("scan projection prunes columns at the reader") {
    val plan = qScanProject(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("l_comment") && !plan.contains("l_shipdate"),
      "projection should prune unused columns")
  }

  test("EXISTS / NOT EXISTS decorrelate to semi + anti joins") {
    val plan = qExistsSubquery(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a left-semi join in:\n${plan.take(1200)}")
    assert(plan.contains("LeftAnti"), s"expected a left-anti join in:\n${plan.take(1200)}")
  }

  test("unpivot plans as Expand (no self-union, single scan)") {
    val plan = qUnpivot(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "unpivot should plan via Expand")
    assert("FileScan parquet".r.findAllIn(plan).length == 1,
      "unpivot must read lineitem exactly once")
  }

  test("topk aggregator plans partial aggregation (bounded buffers before the shuffle)") {
    val plan = qTopkAgg(spark, sf).queryExecution.executedPlan.toString
    val aggNodes = "(?i)aggregate\\(.*topkbyscore".r.findAllIn(plan).length
    assert(plan.toLowerCase.contains("partial_topkbyscore") ||
      "(?i)objecthashaggregate|sortaggregate".r.findAllIn(plan).length >= 2,
      s"expected a partial+final aggregate pair, got:\n${plan.take(2000)}")
    // result parity with the window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(round(col("o_totalprice"), 2).desc, col("o_orderkey"))
    val viaWindow = graft.engine.Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"),
        col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    assert(qTopkAgg(spark, sf).exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(qTopkAgg(spark, sf)).isEmpty)
  }

  test("hll sketch estimates land within 5% of exact; union-merge covers the whole table") {
    val rows = qHllSketch(spark, sf).collect()
    rows.foreach { r =>
      val est = r.getLong(1).toDouble; val exact = r.getLong(2).toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"${r.getString(0)}: estimate $est vs exact $exact drifted >5%")
    }
    assert(rows.map(_.getString(0)).contains("ALL(merged)"))
  }

  test("ntile quartiles are balanced within each nation") {
    val rows = qWindowNtile(spark, sf)
      .groupBy("c_nationkey", "quartile").count().collect()
    val byNation = rows.groupBy(_.get(0).toString)
    byNation.foreach { case (_, qs) =>
      val counts = qs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1,
        s"ntile buckets must differ by at most 1 row, got ${counts.mkString(",")}")
    }
  }
}
