package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H-shaped queries driven through `spark.sql` over temp views —
  * the SQL-interface surface of the engine (every other query in the
  * inventory is DataFrame-DSL; these prove the same tables and
  * semantics hold through the parser/analyzer path a SQL client
  * uses). Date predicates are adapted to the fixture's 1995-2001
  * span; orders has no o_shippriority so Q3 drops that column.
  *
  * Scale notes: Q1 is the canonical partial-agg rollup (map-side
  * combine over 6 columns, 4-group output); Q3 joins the filtered
  * fact to two filtered dims and top-10s via TakeOrderedAndProject;
  * Q6 is a pure scan-filter-agg (predicate pushdown visible in the
  * scan's PushedFilters). */
object TpchOps {

  private def view(s: SparkSession, d: String, name: String): Unit =
    (name match {
      case "lineitem" => Tables.lineitem(s, d)
      case "orders"   => Tables.orders(s, d)
      case "customer" => Tables.customer(s, d)
      case "supplier" => Tables.supplier(s, d)
      case "part"     => Tables.part(s, d)
      case "nation"   => Tables.nation(s, d)
      case "region"   => Tables.region(s, d)
    }).createOrReplaceTempView(s"tpch_$name")

  /** TPC-H Q1: pricing summary report. */
  def qTpchQ1(s: SparkSession, d: String): DataFrame = {
    view(s, d, "lineitem")
    // revenue-style sums in exact integer units (see Tables money helpers):
    // the float sums land systematically on the ROUND(.,2) half-boundary
    s.sql("""
      SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
             CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0     AS sum_disc_price,
             CAST((_s6 + 5000) DIV 10000 AS DOUBLE) / 100.0 AS sum_charge,
             avg_qty, avg_price, avg_disc, count_order
      FROM (
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT)  AS sum_qty,
               ROUND(SUM(l_extendedprice), 2)   AS sum_base_price,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS _s6,
               ROUND(AVG(l_quantity), 4)      AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4)      AS avg_disc,
               CAST(COUNT(*) AS BIGINT)       AS count_order
        FROM tpch_lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus) t
      ORDER BY l_returnflag, l_linestatus""")
  }

  /** TPC-H Q3: shipping-priority revenue top-10 (sans shippriority). */
  def qTpchQ3(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer").foreach(view(s, d, _))
    s.sql("""
      SELECT l_orderkey,
             CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue,
             order_date
      FROM (
        SELECT l_orderkey,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
               DATE_FORMAT(o_orderdate, 'yyyy-MM-dd') AS order_date
        FROM tpch_customer
        JOIN tpch_orders   ON c_custkey = o_custkey
        JOIN tpch_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, DATE_FORMAT(o_orderdate, 'yyyy-MM-dd')) t
      ORDER BY revenue DESC, order_date, l_orderkey
      LIMIT 10""")
  }

  /** TPC-H Q6: forecasting revenue change (scan-filter-agg). */
  def qTpchQ6(s: SparkSession, d: String): DataFrame = {
    view(s, d, "lineitem")
    s.sql("""
      SELECT CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue, n_lines
      FROM (
        SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * CAST(ROUND(l_discount*100) AS BIGINT)) AS _s4,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM tpch_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24) t""")
  }

  /** TPC-H Q4 (adapted): order-priority checking. The fixture has no
    * l_commitdate/l_receiptdate, so "late" is re-expressed as a line
    * shipped more than 60 days after the order date — same plan shape
    * as the spec query: a date-windowed scan of orders LEFT SEMI
    * joined (EXISTS) to lineitem on orderkey with a cross-table date
    * predicate, then a tiny groupBy on priority. The semi join
    * shuffles both sides on orderkey once; the aggregate is 5 groups,
    * map-side combined. */
  def qTpchQ4(s: SparkSession, d: String): DataFrame = {
    Seq("orders", "lineitem").foreach(view(s, d, _))
    s.sql("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM tpch_orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        AND EXISTS (SELECT 1 FROM tpch_lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** TPC-H Q7: volume shipping between two nations, revenue by
    * supplier-nation/customer-nation/year. The two nation lookups are
    * 25-row broadcasts; the fact-side joins (lineitem-orders-customer,
    * lineitem-supplier) shuffle on their keys once each; the output
    * group space is 2 directions x years, so the final aggregate is
    * map-side combined down to a handful of rows. */
  def qTpchQ7(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation")
      .foreach(view(s, d, _))
    s.sql("""
      SELECT supp_nation, cust_nation, l_year,
             CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue, n_items
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM tpch_supplier
        JOIN tpch_lineitem ON s_suppkey = l_suppkey
        JOIN tpch_orders   ON o_orderkey = l_orderkey
        JOIN tpch_customer ON c_custkey = o_custkey
        JOIN tpch_nation n1 ON s_nationkey = n1.n_nationkey
        JOIN tpch_nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
            OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                             AND TIMESTAMP '1997-12-31 00:00:00'
        GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l_shipdate) AS BIGINT)) t
      ORDER BY supp_nation, cust_nation, l_year""")
  }

  /** TPC-H Q8: national market share — the share of AMERICA-region
    * PROMO-part revenue supplied by NATION_1, per order year. Both
    * the numerator and denominator are exact integer 1e-4-dollar
    * units, so the final double division is bit-identical across
    * engines. Seven joins; nation/region are broadcast dims, the
    * three fact joins shuffle once each. */
  def qTpchQ8(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part").foreach(view(s, d, _))
    s.sql("""
      SELECT o_year, ROUND(CAST(nat_rev AS DOUBLE) / all_rev, 6) AS mkt_share, n_items
      FROM (
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               SUM(CASE WHEN n2.n_name = 'NATION_1'
                   THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                   ELSE 0 END) AS nat_rev,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS all_rev,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM tpch_part
        JOIN tpch_lineitem ON p_partkey = l_partkey
        JOIN tpch_supplier ON s_suppkey = l_suppkey
        JOIN tpch_orders   ON l_orderkey = o_orderkey
        JOIN tpch_customer ON o_custkey = c_custkey
        JOIN tpch_nation n1 ON c_nationkey = n1.n_nationkey
        JOIN tpch_region   ON n1.n_regionkey = r_regionkey
        JOIN tpch_nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1998-12-31 00:00:00'
        GROUP BY CAST(YEAR(o_orderdate) AS BIGINT)) t
      ORDER BY o_year""")
  }

  /** TPC-H Q9 (adapted): product-line revenue by supplier nation and
    * order year for widget parts. The fixture has no partsupp, so
    * profit degrades to discounted revenue — the join topology
    * (part filter -> lineitem -> supplier -> orders -> nation) and the
    * nation x year rollup are the point. p_name LIKE '%widget%' cannot
    * push to parquet as an equality but prunes before the fact join. */
  def qTpchQ9(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "supplier", "nation", "part")
      .foreach(view(s, d, _))
    s.sql("""
      SELECT nation, o_year,
             CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue, n_items
      FROM (
        SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM tpch_part
        JOIN tpch_lineitem ON p_partkey = l_partkey
        JOIN tpch_supplier ON s_suppkey = l_suppkey
        JOIN tpch_orders   ON o_orderkey = l_orderkey
        JOIN tpch_nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY n_name, CAST(YEAR(o_orderdate) AS BIGINT)) t
      ORDER BY nation, o_year DESC""")
  }

  /** TPC-H Q10: returned-item reporting — top 20 customers by revenue
    * lost to returns in a quarter. TakeOrderedAndProject keeps the
    * top-k distributed; ties on the rounded revenue are broken by
    * custkey so the LIMIT edge is deterministic across engines. */
  def qTpchQ10(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "nation").foreach(view(s, d, _))
    s.sql("""
      SELECT c_custkey, c_name,
             CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue,
             c_acctbal, n_name
      FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4
        FROM tpch_customer
        JOIN tpch_orders   ON c_custkey = o_custkey
        JOIN tpch_lineitem ON l_orderkey = o_orderkey
        JOIN tpch_nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name) t
      ORDER BY _s4 DESC, c_custkey
      LIMIT 20""")
  }

  /** TPC-H Q13 (adapted): customer order-count distribution. The
    * original excludes orders by a comment pattern; the fixture has no
    * o_comment, so '5-LOW' priority stands in. LEFT JOIN keeps
    * zero-order customers (count 0 bucket); two aggregates, the
    * second over a distribution-sized (few-dozen-row) input. */
  def qTpchQ13(s: SparkSession, d: String): DataFrame = {
    Seq("orders", "customer").foreach(view(s, d, _))
    s.sql("""
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM tpch_customer
        LEFT JOIN tpch_orders ON c_custkey = o_custkey
                             AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey) t
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""")
  }

  /** TPC-H Q14: promotion effect — PROMO parts' share of one month's
    * revenue. Single-row output; numerator and denominator are exact
    * integer units so the percentage is engine-exact. */
  def qTpchQ14(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part").foreach(view(s, d, _))
    s.sql("""
      SELECT ROUND(100.0 * CAST(promo AS DOUBLE) / total, 4) AS promo_revenue,
             n_lines
      FROM (
        SELECT SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                   ELSE 0 END) AS promo,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM tpch_lineitem
        JOIN tpch_part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00') t""")
  }

  /** TPC-H Q15: top supplier — suppliers whose quarterly revenue
    * equals the maximum. Revenue is an exact integer, so the
    * max-equality predicate has no float boundary; the revenue CTE
    * is supplier-count-sized and its MAX is a 1-row scalar subquery
    * (broadcast back, not a driver collect). */
  def qTpchQ15(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "supplier").foreach(view(s, d, _))
    s.sql("""
      WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total
        FROM tpch_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name,
             CAST((total + 50) DIV 100 AS DOUBLE) / 100.0 AS total_revenue
      FROM tpch_supplier
      JOIN (
        -- scalar MAX decorrelated to an empty-frame window over the
        -- supplier-count-sized rev table: the subquery form re-inlined
        -- the quarterly lineitem aggregate a second time
        SELECT *, MAX(total) OVER () AS mx FROM rev) r2
        ON s_suppkey = supplier_no
      WHERE total = mx
      ORDER BY s_suppkey""")
  }

  /** TPC-H Q17: small-quantity-order revenue for one brand. The
    * correlated "20% of this part's average quantity" subquery is
    * re-expressed as a per-part average aggregate joined back on
    * partkey — the same two-pass shape Spark's decorrelator would
    * produce, written explicitly so both engines run the identical
    * plan. l_quantity is integer-valued in the fixture, so the
    * average (exact integer sum / count) and the 0.2x threshold are
    * bit-identical across engines. */
  def qTpchQ17(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part").foreach(view(s, d, _))
    s.sql("""
      SELECT ROUND(CAST(_s AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly, n_lines
      FROM (
        SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS _s,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM tpch_lineitem
        JOIN tpch_part ON p_partkey = l_partkey
        JOIN (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
              FROM tpch_lineitem GROUP BY l_partkey) a ON pk = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < 0.2 * avg_qty) t""")
  }

  /** TPC-H Q18: large-volume customers — orders whose total quantity
    * exceeds 300. The HAVING aggregate runs on lineitem alone
    * (one shuffle on orderkey, map-side combined), shrinking the fact
    * side to a handful of orderkeys before the customer/orders joins. */
  def qTpchQ18(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer").foreach(view(s, d, _))
    s.sql("""
      SELECT c_name, c_custkey, o_orderkey,
             DATE_FORMAT(o_orderdate, 'yyyy-MM-dd') AS order_date,
             o_totalprice, sum_qty
      FROM tpch_customer
      JOIN tpch_orders ON c_custkey = o_custkey
      JOIN (SELECT l_orderkey AS lok, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
            FROM tpch_lineitem GROUP BY l_orderkey
            HAVING SUM(l_quantity) > 300) big ON o_orderkey = lok
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""")
  }

  /** TPC-H Q19: discounted revenue across three brand/size/quantity
    * branches OR-ed together — the disjunctive-predicate workout. The
    * part join is on partkey with the disjunction evaluated post-join;
    * single-row exact-integer output. */
  def qTpchQ19(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part").foreach(view(s, d, _))
    s.sql("""
      SELECT CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue, n_lines
      FROM (
        SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM tpch_lineitem
        JOIN tpch_part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)) t""")
  }

  /** TPC-H Q22 (adapted): dormant high-balance customers by nation.
    * The fixture has no c_phone (no country code) and every customer
    * has at least one order, so the anti-join is against RECENT
    * orders (none since 2000-01-01) and grouping is by nation. The
    * above-average threshold is computed in exact integer cents, so
    * the comparison has no cross-engine float boundary. */
  def qTpchQ22(s: SparkSession, d: String): DataFrame = {
    Seq("orders", "customer", "nation").foreach(view(s, d, _))
    s.sql("""
      SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(cb) AS DOUBLE) / 100.0 AS totacctbal
      FROM (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal*100) AS BIGINT) AS cb
        FROM tpch_customer) c
      JOIN tpch_nation ON c_nationkey = n_nationkey
      WHERE cb > (SELECT AVG(CAST(ROUND(c_acctbal*100) AS BIGINT))
                  FROM tpch_customer WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM tpch_orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      GROUP BY n_name
      ORDER BY n_name""")
  }

  /** TPC-H Q5: local-supplier regional revenue — customer and
    * supplier constrained to the SAME nation, six tables, the
    * canonical join-order workout (adapted: one year window over the
    * fixture's date span; revenue via exact integer units). */
  def qTpchQ5(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region")
      .foreach(view(s, d, _))
    s.sql("""
      SELECT n_name, CAST((_s4 + 50) DIV 100 AS DOUBLE) / 100.0 AS revenue, n_items
      FROM (
        SELECT n_name,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM tpch_customer
        JOIN tpch_orders   ON c_custkey = o_custkey
        JOIN tpch_lineitem ON l_orderkey = o_orderkey
        JOIN tpch_supplier ON l_suppkey = s_suppkey
                          AND c_nationkey = s_nationkey
        JOIN tpch_nation   ON c_nationkey = n_nationkey
        JOIN tpch_region   ON n_regionkey = r_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name) t
      ORDER BY revenue DESC, n_name""")
  }

  /** TPC-H Q2 (adapted): minimum-cost supplier. The fixture has no
    * partsupp, so the part-supplier catalog is DERIVED from lineitem:
    * a (partkey, suppkey) pair's cost is the minimum unit price it
    * ever shipped at, in exact integer cents (price-cents DIV
    * quantity — quantities are integral in the fixture; integer
    * floor-division is identical across engines for positive
    * operands). The correlated min-cost subquery, the 4-table dim
    * chain and the acctbal-desc top-100 all survive the adaptation.
    * Scale: the catalog is one hash-agg over lineitem (map-side
    * combined, |parts|x|supps| output); the region-restricted min is
    * a second small agg; dims broadcast. */
  def qTpchQ2(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "supplier", "part", "nation", "region")
      .foreach(view(s, d, _))
    s.sql("""
      WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   DIV CAST(l_quantity AS BIGINT)) AS cost_c
        FROM tpch_lineitem GROUP BY l_partkey, l_suppkey),
      eu AS (
        SELECT partkey, suppkey, cost_c, s_name, s_acctbal, n_name
        FROM ps JOIN tpch_supplier ON suppkey = s_suppkey
        JOIN tpch_nation ON s_nationkey = n_nationkey
        JOIN tpch_region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
      -- the correlated MIN decorrelated to a partition window: Spark
      -- INLINES a CTE referenced twice, so the subquery form computed
      -- the whole lineitem catalog aggregate a second time (18 parquet
      -- scans in the before-plan); MIN(cost_c) OVER the partkey
      -- partition is the identical per-part minimum over the same eu
      -- set, computed once (guide 2.4: remove the duplicated subtree)
      eu2 AS (
        SELECT *, MIN(cost_c) OVER (PARTITION BY partkey) AS min_c FROM eu)
      SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
             p_partkey, p_brand,
             CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
      FROM tpch_part JOIN eu2 ON p_partkey = partkey
      WHERE p_size BETWEEN 10 AND 20
        AND cost_c = min_c
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""")
  }

  /** TPC-H Q11 (adapted): important part values. Without partsupp,
    * a part's "stock value" for one nation's suppliers is the exact
    * 1e-4-dollar-unit revenue its lines contributed. The
    * global-threshold HAVING subquery is kept PURELY INTEGER
    * (value*10000 > total) so the cut has no cross-engine float
    * boundary. Scale: one fact-side agg keyed by partkey after a
    * broadcastable supplier/nation filter; the threshold is a scalar
    * re-agg of the (bounded, |parts|-sized) value table. */
  def qTpchQ11(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "supplier", "nation").foreach(view(s, d, _))
    s.sql("""
      WITH val AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS v
        FROM tpch_lineitem
        JOIN tpch_supplier ON l_suppkey = s_suppkey
        JOIN tpch_nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_7')
        GROUP BY l_partkey)
      SELECT partkey, part_value FROM (
        -- scalar-subquery threshold decorrelated to an empty-frame
        -- window: the CTE-inlined form computed the fact aggregate
        -- twice; the window total is over the same (|parts|-sized,
        -- bounded) val table, computed once
        SELECT partkey, CAST((v + 50) DIV 100 AS DOUBLE) / 100.0 AS part_value,
               v, SUM(v) OVER () AS tot
        FROM val)
      WHERE v * 10000 > tot
      ORDER BY part_value DESC, partkey""")
  }

  /** TPC-H Q12 (adapted): shipping-mode priority split. The fixture
    * has no l_shipmode/receiptdate, so the mode bucket is
    * l_linestatus and "late" is shipped >30 days after order date.
    * The CASE-conditional double count over the orders-lineitem join
    * — the query's point — is intact. Scale: one orderkey-keyed
    * shuffle join, 2-group map-side-combined agg. */
  def qTpchQ12(s: SparkSession, d: String): DataFrame = {
    Seq("orders", "lineitem").foreach(view(s, d, _))
    s.sql("""
      SELECT l_linestatus AS ship_class,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM tpch_orders JOIN tpch_lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate >  o_orderdate + INTERVAL 30 DAYS
      GROUP BY l_linestatus
      ORDER BY l_linestatus""")
  }

  /** TPC-H Q16 (adapted): supplier count by part descriptor. The
    * supplier-part relation comes from lineitem; the excluded-
    * supplier NOT IN subquery (complaints in spec) becomes negative
    * account balance. COUNT(DISTINCT supp) per (brand, type, size)
    * with an anti-join — the spec's shape. Scale: the distinct-agg
    * shuffles (partkey-derived) pairs once; the NOT IN list is a
    * 100-row broadcast null-aware anti join. */
  def qTpchQ16(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "part", "supplier").foreach(view(s, d, _))
    s.sql("""
      SELECT p_brand, p_type, p_size,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM tpch_part JOIN tpch_lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#13'
        AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM tpch_supplier
                              WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  }

  /** TPC-H Q20 (adapted): suppliers with a dominant part share —
    * suppliers who shipped MORE THAN HALF of some part's total 1997
    * quantity (spec: availqty > half of shipped; same
    * per-part-threshold correlated structure), restricted to parts
    * with at least 5 competing suppliers so dominance is
    * non-trivial. The share test is pure integer (2*qty > total). Scale: the shipped table is one
    * (part, supp) agg over a year-pruned scan; the per-part total
    * reuses it with a second partkey agg; supplier dims broadcast. */
  def qTpchQ20(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "supplier", "nation").foreach(view(s, d, _))
    s.sql("""
      WITH shipped AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               CAST(SUM(l_quantity) AS BIGINT) AS qty
        FROM tpch_lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey)
      SELECT s_name, n_name, ROUND(s_acctbal, 2) AS s_acctbal
      FROM tpch_supplier JOIN tpch_nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (
        -- both correlated aggregates decorrelated to ONE partkey
        -- window pass: the subquery form re-inlined (and re-scanned)
        -- the shipped aggregate per correlated reference (10 parquet
        -- scans in the before-plan); same per-part total and supplier
        -- count over the same shipped set
        SELECT suppkey FROM (
          SELECT suppkey, qty,
                 SUM(qty)  OVER (PARTITION BY partkey) AS tot,
                 COUNT(*)  OVER (PARTITION BY partkey) AS nsupp
          FROM shipped) a
        WHERE qty * 2 > tot AND nsupp >= 5)
      ORDER BY s_name""")
  }

  /** TPC-H Q21 (adapted): suppliers who kept orders waiting. Without
    * commit/receipt dates, "waiting" is a line shipped >30 days
    * after its order date on a finalized ('F') order; the spec's
    * EXISTS (another supplier on the order) + NOT EXISTS (no other
    * supplier shipped later) pair — the multi-way semi/anti-join
    * workout — is preserved, with the nation filter dropped (100
    * suppliers total). Scale: three orderkey-keyed joins of the same
    * fact (self-semi/anti), all co-partitioned on one shuffle key;
    * the final agg is |suppliers|-sized, top-20 via
    * TakeOrderedAndProject. */
  def qTpchQ21(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "supplier").foreach(view(s, d, _))
    // r16 note: the Q2/Q20-style decorrelation WAS attempted (EXISTS
    // <=> per-order distinct-supplier count >= 2; NOT EXISTS <=>
    // l1.ship >= max ship of the order's OTHER suppliers, via a
    // per-(order, supplier) MAX aggregate + top-with-tie-count
    // windows on one REPARTITION(l_orderkey) exchange). It was
    // value-identical (oracle PASS x3 SFs) but MEASURED SLOWER:
    // JobProfile wall 1.58 -> 3.47 s, summed task time 1.24 -> 10.3 s
    // at sf0.1 — the planner already turns both correlated probes
    // into broadcast semi/anti hash joins with ZERO shuffles of the
    // fact, while the rewrite forces an exchange plus four windows.
    // The canonical form stays; at cluster scale all three fact
    // probes co-partition on the one l_orderkey shuffle key.
    s.sql("""
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM tpch_supplier
      JOIN tpch_lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN tpch_orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAYS
        AND EXISTS (SELECT 1 FROM tpch_lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM tpch_lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20""")
  }
}
