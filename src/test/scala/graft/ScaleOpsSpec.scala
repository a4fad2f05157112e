package graft

import graft.engine.{ScaleOps, Tables}
import org.apache.spark.sql.functions._

/** Plan-shape proofs for the scale machinery: salting preserves join
  * semantics; bucketing eliminates the join shuffle. */
class ScaleOpsSpec extends SparkSuite {

  test("salted join returns exactly the plain join's result set") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    val salted = ScaleOps.saltedJoin(
        li, "l_orderkey", col("l_orderkey") * 1000 + col("l_linenumber"),
        o, "o_orderkey", nSalts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salting splits a hot key across reducers") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber")
    val salted = li.withColumn("__salt",
      pmod(xxhash64(col("l_orderkey") * 1000 + col("l_linenumber")), lit(8L)).cast("int"))
    // the discriminator spreads every multi-row key over >1 salt value
    // aggregate property (individual keys can collide on the
    // discriminator when the fixture duplicates (orderkey,linenumber)):
    // multi-row keys must spread over ~2+ salts on average
    val spread = salted.groupBy("l_orderkey")
      .agg(countDistinct("__salt").as("salts"), count(lit(1)).as("rows"))
      .filter(col("rows") >= 4)
    val avgSpread = spread.agg(avg("salts")).head().getDouble(0)
    assert(avgSpread >= 2.0, s"hot keys must average >=2 salts, got $avgSpread")
  }

  test("salted aggregate equals the direct groupBy exactly") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(sum("value").as("total"), count(lit(1)).as("n"))
    val salted = ScaleOps.saltedAggregate(
      ev, "event_type", "value", col("event_id"), nSalts = 16)
    // counts are exact; totals agree to fp-reassociation tolerance
    val joined = direct.alias("d").join(salted.alias("s"), "event_type")
      .select(col("d.n") === col("s.n"),
        abs(col("d.total") - col("s.total")) < 1e-6)
      .collect()
    assert(joined.nonEmpty && joined.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("same-bucketed tables join with zero exchanges (co-located join)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    ScaleOps.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", s"$dir/o", nBuckets = 8, key = "o_orderkey")
    ScaleOps.writeBucketed(
      Tables.lineitem(spark, sf).select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", s"$dir/l", nBuckets = 8, key = "o_orderkey")
    val joined = ScaleOps.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n${plan.take(1500)}")
    assert(joined.count() == Tables.lineitem(spark, sf).count())
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim filter") {
    // the 100 TB shape: a selective filter on one join side injects a
    // bloom filter (InjectRuntimeFilter) that drops non-joining fact
    // rows BEFORE the shuffle — shuffle bytes scale with the filtered
    // join size, not the fact table. Thresholds lowered to fire at
    // fixture scale; broadcast disabled so the shuffle join path
    // (where the filter matters) is what's planned.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n${optimized.take(2000)}")
      assert(j.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("qBucketJoin plans the fact-fact edge without a join-key exchange") {
    val plan = ScaleOps.qBucketJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"merge hint over bucketed tables must pick SMJ:\n${plan.take(1500)}")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"co-bucketed join must not re-shuffle its key:\n${plan.take(1500)}")
  }

  test("bloom pre-join: zero false negatives, bounded false-positive rate") {
    val r = ScaleOps.qBloomJoin(spark, sf).collect()
    assert(r.length == 1)
    val (total, cand, nTrue, fp) =
      (r.head.getLong(0), r.head.getLong(1), r.head.getLong(2), r.head.getLong(3))
    // a bloom filter NEVER drops a true member: candidates ⊇ true set
    assert(cand >= nTrue, s"false negatives: $cand candidates < $nTrue true")
    assert(cand - fp == nTrue, s"candidate arithmetic: $r")
    // m=1008, k=2, n=100 inserts → theoretical fp ≈ (1-e^(-200/1008))² ≈ 3.2%
    assert(fp.toDouble / (total - nTrue) < 0.10,
      s"fp rate out of band: $fp / ${total - nTrue}")
  }

  test("count-min estimates are upper bounds and exact counts are right") {
    val rows = ScaleOps.qCountMin(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CMS must never undercount: $r")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // exact side must agree with a direct count for the heaviest user
    val top = rows.head
    val direct = Tables.events(spark, sf)
      .filter(col("user_id") === top.getLong(0)).count()
    assert(top.getLong(1) == direct)
  }
}
