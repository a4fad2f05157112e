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
    }).createOrReplaceTempView(s"tpch_$name")

  /** TPC-H Q1: pricing summary report. */
  def qTpchQ1(s: SparkSession, d: String): DataFrame = {
    view(s, d, "lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(l_quantity) AS BIGINT)                   AS sum_qty,
             ROUND(SUM(l_extendedprice), 2)                    AS sum_base_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             ROUND(AVG(l_quantity), 4)      AS avg_qty,
             ROUND(AVG(l_extendedprice), 4) AS avg_price,
             ROUND(AVG(l_discount), 4)      AS avg_disc,
             CAST(COUNT(*) AS BIGINT)       AS count_order
      FROM tpch_lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  }

  /** TPC-H Q3: shipping-priority revenue top-10 (sans shippriority). */
  def qTpchQ3(s: SparkSession, d: String): DataFrame = {
    Seq("lineitem", "orders", "customer").foreach(view(s, d, _))
    s.sql("""
      SELECT l_orderkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             DATE_FORMAT(o_orderdate, 'yyyy-MM-dd') AS order_date
      FROM tpch_customer
      JOIN tpch_orders   ON c_custkey = o_custkey
      JOIN tpch_lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
      GROUP BY l_orderkey, DATE_FORMAT(o_orderdate, 'yyyy-MM-dd')
      ORDER BY revenue DESC, order_date, l_orderkey
      LIMIT 10""")
  }

  /** TPC-H Q6: forecasting revenue change (scan-filter-agg). */
  def qTpchQ6(s: SparkSession, d: String): DataFrame = {
    view(s, d, "lineitem")
    s.sql("""
      SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM tpch_lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24""")
  }
}
