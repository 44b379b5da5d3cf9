package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps

/** Multimodal plumbing: the batch feature-extraction stub must be
  * deterministic and partition-invariant (one "model init" per partition
  * must not change values), and metadata resize must bound the longest
  * side while preserving aspect ordering. */
class MultimodalSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("extractFeatures is deterministic and partition-invariant") {
    def run(parts: Int) =
      MultimodalOps.extractFeatures(MultimodalOps.binarize(docs).repartition(parts))
        .collect().map(f => f.doc_id -> f.feature).toMap
    val f2 = run(2)
    val f8 = run(8)
    assert(f2 == f8, "features must not depend on partitioning")
    assert(f2.nonEmpty && f2.values.forall(_.size == 8))
    assert(f2.values.forall(_.forall(v => v >= -0.5f && v <= 0.5f)))
  }

  test("resizeMeta bounds the longest side at maxDim and preserves aspect order") {
    val out = MultimodalOps.resizeMeta(
      MultimodalOps.decodeMeta(MultimodalOps.binarize(docs)), 32L)
      .select("width", "height", "out_w", "out_h").collect()
    out.foreach { r =>
      val (w, h, ow, oh) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ow <= 32 && oh <= 32)
      if (w > 0 && h > 0) {
        assert(math.max(ow, oh) == 32, s"longest side must hit maxDim: $r")
        assert((w >= h) == (ow >= oh), s"aspect order flipped: $r")
      }
    }
  }

  test("sampleFrames emits every 4th index, never beyond n_frames") {
    val rows = MultimodalOps.sampleFrames(
      MultimodalOps.decodeMeta(MultimodalOps.binarize(docs)), 4)
      .select(col("n_frames"), col("frame_idxs")).collect()
    rows.foreach { r =>
      val n = r.getLong(0)
      val idxs = r.getSeq[Long](1)
      assert(idxs == (0L until n by 4L))
    }
  }
}
