package graft

import graft.engine.{StatsOps, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for the round-5 statistics operators — each pins
  * the mathematical property the DuckDB oracle only replays, not
  * proves (bounds, dominance, brute-force equivalence). */
class StatsOpsSpec extends SparkSuite {

  test("gini coefficients land in [0, 1) and cover every segment") {
    val rows = StatsOps.qGini(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"gini out of range: $r")
    }
  }

  test("skyline rows are pairwise non-dominated") {
    val sky = StatsOps.qSkyline(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    for (a <- sky; b <- sky if a != b)
      assert(!(b._1 <= a._1 && b._2 > a._2),
        s"$b dominates $a inside the skyline")
    // price must be non-decreasing along the date axis by construction
    assert(sky.sortBy(_._1).map(_._2).toSeq.sliding(2).forall {
      case Seq(x, y) => y >= x
      case _         => true
    })
  }

  test("moving median matches a brute-force frame median on a sample") {
    val med = StatsOps.qMovingMedian(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3)))
      .groupBy(_._1)
    ev.values.take(20).foreach { seq =>
      val s = seq.sortBy(e => (e._3.getTime, e._2))
      s.indices.foreach { i =>
        val frame = s.slice(math.max(0, i - 4), i + 1).map(_._4).sorted
        val m =
          if (frame.length % 2 == 1) frame(frame.length / 2)
          else (frame(frame.length / 2 - 1) + frame(frame.length / 2)) / 2.0
        val got = med(s(i)._2)
        assert(math.abs(got - BigDecimal(m).setScale(3,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"median mismatch at event ${s(i)._2}: $got vs $m")
      }
    }
  }

  test("welch t-test matches a two-pass reference computation") {
    val row = StatsOps.qTtest(spark, sf).head()
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    def stats(t: String) = {
      val xs = vals.filter(_._1 == t).map(_._2)
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      (xs.length.toLong, m, v)
    }
    val (n1, m1, v1) = stats("purchase")
    val (n2, m2, v2) = stats("click")
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(math.abs(row.getDouble(3) - t) < 1e-3, s"t ${row.getDouble(3)} vs $t")
  }

  test("rfm buckets are 1..4, the segment digits decompose, and buckets follow the histogram-boundary rule") {
    val rows = StatsOps.qRfm(spark, sf).collect()
    rows.foreach { r =>
      val (rr, f, m, seg) = (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
      assert((1L to 4L).contains(rr) && (1L to 4L).contains(f) &&
        (1L to 4L).contains(m))
      assert(seg == rr * 100 + f * 10 + m)
    }
    // Since the dimension-window migration, quartiles come from exact
    // ⌈n·k/4⌉ value-histogram boundaries and VALUE TIES SHARE A BUCKET
    // (no ±1 ntile balance law anymore). Replay the cross-multiplied
    // rule in-process and require exact agreement per dimension.
    def tiles(vals: Array[Long]): Map[Long, Long] = {
      val n = vals.length.toLong
      val hist = vals.groupBy(identity).view.mapValues(_.length).toSeq.sortBy(_._1)
      val bounds = Array.fill(3)(Long.MaxValue)
      var cum = 0L
      hist.foreach { case (v, c) =>
        cum += c
        (1 to 3).foreach { k =>
          if (4L * cum >= n * k && bounds(k - 1) == Long.MaxValue) bounds(k - 1) = v
        }
      }
      vals.distinct.map(v => v -> (1L + bounds.count(v > _))).toMap
    }
    val rec = tiles(rows.map(_.getLong(1)))
    val frq = tiles(rows.map(_.getLong(2)))
    rows.foreach { r =>
      assert(r.getLong(4) == 5L - rec(r.getLong(1)),
        s"recency bucket mismatch at days=${r.getLong(1)}")
      assert(r.getLong(5) == frq(r.getLong(2)),
        s"frequency bucket mismatch at freq=${r.getLong(2)}")
    }
  }

  test("cooccur covers every unordered type pair with positive lift") {
    val rows = StatsOps.qCooccur(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) event types
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getDouble(3) > 0.0)
    }
  }
}
