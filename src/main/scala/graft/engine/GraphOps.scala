package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components via CCF (Kardeş et al. 2014,
  * "CCF: Fast and scalable connected component computation in
  * MapReduce") — the literature-standard upgrade path the min-label
  * propagation in TextOps.clusterLabels documents for billion-edge
  * graphs. Min-label propagation needs O(diameter) rounds; CCF's
  * iterate step rewires every node DIRECTLY to the round's local
  * minimum (emitting (neighbor, min) for every neighbor), which
  * contracts long chains at doubling speed — O(log d) rounds in
  * practice. Each round is two shuffles (a min-per-key aggregate and
  * a dedup), nothing per-node is ever collected, and convergence is
  * an O(1) driver check on the monotone pair count + label sum.
  *
  * The reference has no graph surface at all; this is engine
  * infrastructure for the dedup-clustering family (near-dup
  * components at corpus scale). */
object GraphOps {

  /** Connected components of an undirected edge list.
    *
    * @param edges two long columns (endpoints); direction ignored.
    * @return (node, comp) — every node that appears in an edge,
    *         labeled with the MINIMUM node id of its component (the
    *         same labeling clusterLabels produces).
    */
  def ccfComponents(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    // CCF state: candidate pairs (k, v) meaning "k and v are in the
    // same component", both directions present.
    var pairs = edges.select(ca.as("k"), cb.as("v"))
      .union(edges.select(cb.as("k"), ca.as("v")))
      .filter(col("k") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var round = 0
    var done = pairs.isEmpty
    var prev = stateSignature(pairs)
    while (!done && round < maxRounds) {
      // CCF-Iterate maps every pair BOTH ways each round (the swap is
      // what lets a component minimum flow back out through nodes
      // that only appear on the v side), then per key k takes the
      // neighbor minimum m and — when m < k — emits (k, m) plus a
      // rewire (v, m) for each OTHER neighbor v: the star-contract
      // step. No per-key list is ever materialized; the rewire IS
      // the adjacency join.
      // One exchange computes the per-key minimum (window min over
      // the k partition ≡ the old min-aggregate joined back — the
      // join shuffled adj a second time), and the star-contract's two
      // output rows explode from each input row map-side instead of
      // union-ing two references to a checkpointed intermediate: each
      // round is now one window exchange + one dedup exchange + one
      // materialization (was: aggregate + join + two checkpoints).
      val adj = pairs.union(pairs.select(col("v").as("k"), col("k").as("v")))
      val next = adj
        .withColumn("m", min("v").over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")))
        .filter(col("m") < col("k"))
        .select(explode(array(
          struct(when(col("v") === col("m"), col("k")).otherwise(col("v"))
            .as("k"), col("m").as("v")),
          struct(col("k").as("k"), col("m").as("v")))).as("p"))
        .select(col("p.k").as("k"), col("p.v").as("v"))
        .filter(col("k") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      val sig = stateSignature(next)
      done = sig == prev
      prev = sig
      pairs = next
      round += 1
    }
    // fixpoint: every pair is (node, component-min); nodes that ARE
    // the minimum appear only on the v side — union them back.
    pairs.select(col("k").as("node"), col("v").as("comp"))
      .union(pairs.select(col("v").as("node"), col("v").as("comp")))
      .groupBy("node").agg(min("comp").as("comp"))
  }

  /** O(1)-driver convergence signature: (pair count, Σk, Σv). Labels
    * shrink monotonically and the pair set stabilizes at the star
    * fixpoint, which is idempotent under the iterate step — so an
    * unchanged signature ends the loop without a set-compare join.
    * (A false-positive would need a different set with identical
    * count AND both endpoint sums, and even then the star fixpoint
    * reached one round later is the same; maxRounds bounds the
    * loop regardless.) */
  private def stateSignature(pairs: DataFrame): (Long, Long, Long) = {
    val r = pairs.agg(count(lit(1)), sum("k"), sum("v")).first()
    def nz(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    (r.getLong(0), nz(1), nz(2))
  }

  /** The dedup-cluster query re-run on CCF: same minhash candidate
    * edges, same (node → min-id component, cluster size) output, same
    * recursive-CTE oracle as q_dedup_cluster — a differential gate
    * proving the O(log d) algorithm agrees with the O(d) one. */
  def qComponentsCcf(s: SparkSession, d: String): DataFrame = {
    val pairs = TextOps.md5MinhashPairs(s, d)
    val labels = ccfComponents(
      pairs.select(col("da").as("a"), col("db").as("b")))
    // Component-count-sized table — unbounded at scale, no broadcast
    // hint (AQE decides at runtime); same rationale as qDedupCluster.
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "comp")
      .select(col("node").as("doc_id"), col("comp"), col("cluster_size"))
      .orderBy("doc_id")
  }
}
