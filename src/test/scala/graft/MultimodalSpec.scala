package graft

import graft.engine.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal plumbing: the decode is a documented stub, so these
  * tests pin the PLUMBING contracts — schema, determinism, fan-out
  * shape, feature-vector shape — not codec behavior. */
class MultimodalSpec extends SparkSuite {

  test("asset table carries binary payloads with typed metadata") {
    val a = MultimodalOps.assetTable(spark, sf)
    assert(a.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(a.select("mime").distinct().count() == 3)
  }

  test("decode is deterministic and preserves row count") {
    val assets = MultimodalOps.assetTable(spark, sf)
    val d1 = MultimodalOps.decodeAssets(assets).collect().sortBy(_.asset_id)
    val d2 = MultimodalOps.decodeAssets(assets).collect().sortBy(_.asset_id)
    assert(d1.length == assets.count())
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(a => a.width >= 160 && a.height >= 120 && a.byte_len > 0))
  }

  test("feature extraction emits fixed-dim float vectors (ANN-compatible shape)") {
    val f = MultimodalOps.extractFeatures(MultimodalOps.assetTable(spark, sf), dim = 16)
    val lens = f.select(size(col("features"))).distinct().collect()
    assert(lens.length == 1 && lens.head.getInt(0) == 16)
  }

  test("frame sampling fans out video assets by duration, no shuffle of payloads") {
    val assets = MultimodalOps.assetTable(spark, sf)
    val frames = MultimodalOps.sampleFrames(assets, everyMs = 10000)
    val videos = MultimodalOps.decodeAssets(assets).toDF()
      .filter(col("mime") === "video/mp4")
    // every video contributes duration/10s + 1 frames
    val expected = videos
      .select(sum((col("duration_ms") / 10000).cast("long") + 1)).head().getLong(0)
    assert(frames.count() == expected)
    assert(frames.filter(col("ts_ms") > col("frame_no") * 10000).count() == 0)
  }

  test("resize rewrites dimensions and keeps binary contract") {
    val assets = MultimodalOps.assetTable(spark, sf)
    val r = MultimodalOps.resizeAssets(
      MultimodalOps.decodeAssets(assets), assets, 64, 48)
    assert(r.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val dims = r.select("width", "height").distinct().collect()
    assert(dims.length == 1 && dims.head.getInt(0) == 64)
  }

  test("stats query aggregates only scalars per mime") {
    val m = MultimodalOps.qMultimodalMeta(spark, sf).collect()
    assert(m.length == 3)
    assert(m.map(_.getLong(1)).sum == graft.engine.Tables.documents(spark, sf).count())
  }

  test("media embed: top-k is deterministic, bounded, sorted by cosine") {
    val a = MultimodalOps.qMediaEmbed(spark, sf).collect()
    val b = MultimodalOps.qMediaEmbed(spark, sf).collect()
    assert(a.sameElements(b), "stub features must make the result deterministic")
    assert(a.length == 10)
    val sims = a.map(_.getDouble(1))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }
}
