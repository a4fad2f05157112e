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

  test("q_stream_ann_ingest: planted near-copies match their originals, unrelated vectors never do") {
    val rows = VectorOps.qStreamAnnIngest(spark, sf).collect()
    val planted = rows.filter(_.getAs[Long]("probe_id") % 4 == 1)
    val own = rows.filter(_.getAs[Long]("probe_id") % 4 == 3)
    assert(planted.nonEmpty && own.nonEmpty)
    // at <=1000-micro-unit jitter the multiprobe index catches every
    // planted near-dup AND attributes it to the right original
    val matched = planted.filter(_.getAs[String]("status") == "matched")
    assert(matched.length == planted.length,
      s"planted recall ${matched.length}/${planted.length}")
    assert(matched.forall(r =>
      r.getAs[Long]("best_id") == r.getAs[Long]("probe_id") - 1),
      "a matched probe must point at its planted original")
    assert(matched.forall(_.getAs[Long]("best_cos_micro") >= 999000L))
    // genuinely-new vectors never cross the 0.95 threshold — best
    // in-bucket cosine stays far below it (sign-LSH bucket mates are
    // positively correlated, so ~0.3 is expected; 0.95 is not)
    assert(own.forall(_.getAs[String]("status") == "new"),
      "no false admission blocks")
    assert(own.forall(_.getAs[Long]("best_cos_micro") < 950000L))
  }
}
