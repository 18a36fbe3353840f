package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MultimodalOps

/** Multimodal binary-column plumbing (decode step stubbed — see
  * MultimodalOps.decodeStub). */
class MultimodalSpec extends AnyFunSuite with LocalSparkSuite {

  private lazy val assets = MultimodalOps.assets(spark, sfDir)

  test("assets carry opaque payloads + typed metadata") {
    val a = assets.filter(col("asset_id") === 0).head()
    assert(a.modality === "image") // 0 % 3
    assert(a.payload.nonEmpty && a.meta_width === 64 && a.meta_rate === 16000)
    assert(assets.select("modality").distinct().count() === 3)
  }

  test("feature extraction: fixed 8-dim vectors, histogram sums to 1") {
    val f = MultimodalOps.extractFeatures(assets)
    assert(f.count() === 500)
    f.take(20).foreach { r =>
      assert(r.features.length === 8)
      assert(math.abs(r.features.sum - 1.0f) < 1e-3)
      assert(r.n_bytes > 0)
    }
  }

  test("feature extraction is deterministic across partitionings") {
    val a = MultimodalOps.extractFeatures(assets).collect()
      .sortBy(_.asset_id).map(x => (x.asset_id, x.features.toSeq))
    val b = MultimodalOps.extractFeatures(assets.repartition(7)).collect()
      .sortBy(_.asset_id).map(x => (x.asset_id, x.features.toSeq))
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling bounds output per asset") {
    val frames = MultimodalOps.sampleFrames(assets)
    val maxPerAsset = frames.groupBy("asset_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxPerAsset <= 8)
    assert(frames.filter(length(col("frame_bytes")) > 16).count() === 0)
  }

  test("resize decimates every payload to a bounded fixed width") {
    val resized = MultimodalOps.resize(assets, target = 32).collect()
    assert(resized.nonEmpty)
    resized.foreach { case (_, bytes) => assert(bytes.length <= 32) }
    // deterministic: same input → same bytes
    val again = MultimodalOps.resize(assets, target = 32).collect()
    assert(resized.map(_._2.toSeq).toSeq === again.map(_._2.toSeq).toSeq)
  }

  test("resize never fabricates bytes for an empty payload") {
    import spark.implicits._
    val empty = Seq(MultimodalOps.Asset(1L, "image", Array.empty[Byte], 64, 16000)).toDS()
    val out = MultimodalOps.resize(empty, target = 32).collect()
    assert(out.head._2.isEmpty)
  }
}
