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
}
