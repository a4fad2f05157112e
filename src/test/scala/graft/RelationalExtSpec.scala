package graft

import graft.engine.{RelationalExt, Tables}
import org.apache.spark.sql.functions._

/** Semantic + plan checks for the second relational module. */
class RelationalExtSpec extends SparkSuite {

  test("multi-distinct plans a single Expand, not one job per distinct") {
    val df = RelationalExt.qMultiDistinct(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("Expand"), "multi-distinct must plan via Expand")
    df.collect().foreach { r =>
      assert(r.getLong(1) <= r.getLong(4), "distinct custkeys bounded by rows")
      assert(r.getLong(2) <= 5L, "only 5 priorities exist")
    }
  }

  test("copurchase pairs are canonical and support-ordered") {
    val rows = RelationalExt.qCopurchase(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    val ns = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("nested struct navigation agrees with flat aggregation") {
    val nested = RelationalExt.qNestedStruct(spark, sf)
    val flat = Tables.orders(spark, sf).groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n"), min("o_orderkey").as("fk"),
        max("o_orderkey").as("lk"), round(sum("o_totalprice"), 2).as("tot"))
    val joined = nested.join(flat, "custkey")
      .filter(col("n_orders") =!= col("n") ||
        col("first_orderkey") =!= col("fk") ||
        col("last_orderkey") =!= col("lk") ||
        abs(col("arr_total") - col("tot")) > 0.011)
    assert(joined.isEmpty, s"mismatches: ${joined.take(3).mkString(";")}")
  }

  test("weighted median splits the quantity mass at >= half per flag") {
    val li = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    RelationalExt.qWeightedMedian(spark, sf).collect().foreach { r =>
      val (flag, m) = (r.getString(0), r.getDouble(2))
      val xs = li(flag)
      val tot = xs.map(_._3).sum
      val below = xs.filter(_._2 < m).map(_._3).sum
      val atOrBelow = xs.filter(_._2 <= m).map(_._3).sum
      assert(below < tot / 2.0 + 1e-6, s"$flag: too much mass below $m")
      assert(atOrBelow >= tot / 2.0 - 1e-6, s"$flag: median $m too low")
    }
  }
}
