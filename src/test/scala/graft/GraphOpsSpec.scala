package graft

import org.apache.spark.sql.functions._
import graft.engine.GraphOps

/** CCF star-contraction components: planted-topology cases the
  * differential can't isolate (the fixture graph is whatever minhash
  * finds), plus the equivalence gate against the min-label
  * implementation on real candidate edges. */
class GraphOpsSpec extends SparkSuite {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.ccfComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, ring, star, disjoint pairs all collapse to min labels") {
    // a 6-node chain — worst case for propagation, log rounds for CCF
    assert(comps(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L))
    // ring + separate star + isolated pair
    val got = comps(Seq((10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (20L, 22L), (20L, 23L), (30L, 31L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("edge direction and duplicates don't matter") {
    val a = comps(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (2L, 3L)))
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain converges in O(log d) rounds (within maxRounds=8)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val labels = GraphOps.ccfComponents(chain.toDF("a", "b"), maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 201 && labels.values.forall(_ == 0L))
  }

  test("CCF equals min-label propagation on the minhash candidate graph") {
    val ccf = GraphOps.qComponentsCcf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val prop = graft.engine.TextOps.qDedupCluster(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ccf == prop)
  }
}
