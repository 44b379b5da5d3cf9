package graft.state

import scala.reflect.ClassTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Turn

/** A per-conversation ordered-state automaton: the engine's native form of
  * the reference's stateful EventTransformer
  * (`/root/reference/src/reflow/__init__.py:109-130` +
  * `internal/worker.py:260-285`), with the reference's arity convention —
  * one input turn yields 0 (filter) / 1 (map) / N (split) outputs —
  * upgraded to keyed, checkpointed state.
  *
  * The contract: `onTurn` is invoked exactly once per turn, per `conv_id`,
  * in strictly increasing `turn_idx` order ("stable turn ordering",
  * BASELINE.json.input_hint), regardless of arrival order across
  * micro-batches. `onComplete` fires when the conversation is known to be
  * finished (watermark passed its last seen event time plus the idle gap).
  */
trait TurnAutomaton[S, O] extends Serializable {
  def initial: S
  def onTurn(state: S, turn: Turn): (S, Seq[O])
  def onComplete(state: S): Seq[O] = Seq.empty
}

object AutomatonRunner {

  /** Rows with this conv_id are watermark-drivers only (see runStreaming). */
  val SentinelConvId = "__eos__"

  /** Batch execution: group, sort per key, fold. One conversation's turns
    * are materialized per task (bounded: conversations are short relative
    * to partitions; hot keys are the streaming path's problem — see
    * `flatMapSortedGroups` note below). */
  def runBatch[S, O: Encoder](turns: Dataset[Turn], a: TurnAutomaton[S, O]): Dataset[O] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id).flatMapGroups { (_: String, it: Iterator[Turn]) =>
      val sorted = it.toArray.sortInPlaceBy(_.turn_idx)
      var s = a.initial
      val out = Vector.newBuilder[O]
      var i = 0
      while (i < sorted.length) {
        val (s2, os) = a.onTurn(s, sorted(i))
        s = s2; out ++= os; i += 1
      }
      out ++= a.onComplete(s)
      out.result().iterator
    }
  }

  /** Checkpointed streaming state carried per conv_id.
    *
    * `buffered` holds turns that arrived ahead of the event-time frontier
    * (out-of-order arrivals across micro-batches); they are released into
    * `onTurn` in `turn_idx` order once the watermark passes their `ts` —
    * at that point no earlier-`ts` (hence, by per-conversation ts
    * monotonicity, earlier-`turn_idx`) turn can still arrive without being
    * late-dropped by Spark itself. `seenIdx` makes redelivery idempotent
    * (the reference's `last_event_seen` dedup, `worker.py:158-175`).
    */
  final case class ConvState[S](
      s: S,
      buffered: List[Turn],
      maxEmittedIdx: Int,
      maxSeenTs: Long)

  /** Streaming execution on flatMapGroupsWithState + EventTimeTimeout.
    *
    * Kryo-encodes the state (arbitrary user S) — the state store holds it
    * as bytes, which is exactly how RocksDB state works at scale.
    *
    * @param idleGapMs a conversation with no new turns for this long past
    *                  the watermark is completed and its state evicted —
    *                  the quiesce semantics of the reference
    *                  (`cluster.py:51-89`) per key instead of per job.
    */
  def runStreaming[S, O: Encoder](
      turns: Dataset[Turn],
      a: TurnAutomaton[S, O],
      watermarkDelay: String = "10 minutes",
      idleGapMs: Long = 30 * 60 * 1000L): Dataset[O] = {
    import turns.sparkSession.implicits._
    implicit val stateEnc: Encoder[ConvState[S]] = Encoders.kryo[ConvState[S]]

    turns
      .withWatermark("ts", watermarkDelay)
      // end-of-stream sentinel rows only exist to push the watermark past
      // all real data (finite-stream drain, the reference's quiesce); they
      // never reach user state
      .filter(_.conv_id != AutomatonRunner.SentinelConvId)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, newTurns: Iterator[Turn], gs: GroupState[ConvState[S]]) =>
          val st0 =
            if (gs.exists) gs.get
            else ConvState(a.initial, Nil, -1, Long.MinValue)

          if (gs.hasTimedOut) {
            // conversation idle past the gap: flush any stragglers in order,
            // then complete and evict state.
            var s = st0.s
            val out = Vector.newBuilder[O]
            st0.buffered.sortBy(_.turn_idx).foreach { t =>
              val (s2, os) = a.onTurn(s, t); s = s2; out ++= os
            }
            out ++= a.onComplete(s)
            gs.remove()
            out.result().iterator
          } else {
            val wm = gs.getCurrentWatermarkMs()
            // dedup redelivered turns (idempotence under replay), then buffer
            val fresh = newTurns.filter(t => t.turn_idx > st0.maxEmittedIdx &&
              !st0.buffered.exists(_.turn_idx == t.turn_idx)).toList
            var buf = st0.buffered ++ fresh
            var maxTs = st0.maxSeenTs
            fresh.foreach(t => maxTs = math.max(maxTs, t.ts.getTime))
            // release the frontier-safe prefix in turn_idx order
            val (ready, hold) = buf.sortBy(_.turn_idx).partition(_.ts.getTime <= wm)
            var s = st0.s
            var maxIdx = st0.maxEmittedIdx
            val out = Vector.newBuilder[O]
            ready.foreach { t =>
              val (s2, os) = a.onTurn(s, t)
              s = s2; out ++= os; maxIdx = math.max(maxIdx, t.turn_idx)
            }
            gs.update(ConvState(s, hold, maxIdx, maxTs))
            // evict when the watermark passes last activity + idle gap
            if (maxTs != Long.MinValue) gs.setTimeoutTimestamp(maxTs + idleGapMs)
            out.result().iterator
          }
      }
  }
}
