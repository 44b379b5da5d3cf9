package graft.operators

import org.apache.spark.sql.Dataset

import graft.model.Turn

/** Streaming exact deduplication — the reference's redelivery dedup
  * (`/root/reference/src/reflow/internal/worker.py:158-175`: drop events
  * already seen per producer) as a first-class stream operator. Spark keeps
  * one state row per key; `withEventTimeBound` uses
  * dropDuplicatesWithinWatermark so the dedup state is EVICTED once the
  * watermark passes — bounded state at 10^12-turn scale, at the cost of
  * only deduplicating within the watermark horizon (exactly the reference's
  * guarantee: its dedup window is the redelivery window, not all history).
  */
object StreamingDedup {

  /** Unbounded exact dedup on the event identity (conv_id, turn_idx). */
  def exact(turns: Dataset[Turn]): Dataset[Turn] =
    turns.dropDuplicates("conv_id", "turn_idx")

  /** Watermark-bounded dedup: state for a key is dropped once the watermark
    * passes its event time + delay. */
  def withEventTimeBound(turns: Dataset[Turn], watermarkDelay: String): Dataset[Turn] =
    turns.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
}
