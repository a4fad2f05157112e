package graft

import graft.engine.VectorOps

/** Round-19 additions: the clustered-fixture beam-search ANN key —
  * the favorable-regime half of the graph-ANN trade curve whose
  * worst-case half q_ann_beam already pins. */
class Round19OpsSpec extends SparkSuite {

  test("q_ann_beam_clustered: mean recall@5 >= 0.8 at a bounded scan fraction") {
    val rows = VectorOps.qAnnBeamClustered(spark, sf).collect()
    assert(rows.length == 8, "one report row per query (vec_id < 8)")
    val recalls = rows.map(_.getAs[Double]("recall"))
    val scans = rows.map(_.getAs[Double]("scan_frac"))
    val meanRecall = recalls.sum / recalls.length
    // The favorable-regime claim: on embeddings with REAL local
    // structure (~25-member planted clusters, within-cluster cos ~0.97)
    // the SAME beam dial that honestly measures ~0.3 recall on the
    // unstructured fixture (q_ann_beam) recovers >= 0.8 of the exact
    // top-5 — while touching a small corpus fraction (observed: 1.0
    // recall at ~4% scanned).
    assert(meanRecall >= 0.8,
      s"favorable-regime mean recall@5 was $meanRecall (< 0.8): " +
        recalls.mkString(","))
    assert(scans.forall(_ <= 0.2),
      s"scan fraction must stay bounded (<= 20% of corpus): " +
        scans.mkString(","))
    // the report carries the corpus size so (recall, scan_frac) is
    // readable as a trade point
    assert(rows.forall(_.getAs[Long]("n_corpus") > 0L))
  }
}
