package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The engine's contract event type, per `BASELINE.json.input_hint`:
  * one turn of a multi-turn conversation / agent transcript.
  *
  * The reference framework (`/root/reference/src/reflow/typedefs.py:3-6`)
  * leaves events untyped; Spark is schema-first, so the rebuild fixes the
  * event type to the transcripts row and every pipeline is a typed
  * `Dataset[Turn]`.
  *
  * @param conv_id  conversation key — the routing/state key (plays the role
  *                 of the reference's `KeyBasedRoutingPolicy` key,
  *                 `src/reflow/internal/worker.py:28-34`)
  * @param turn_idx 0-based position within the conversation; the stable
  *                 ordering axis (plays the role of the per-producer
  *                 `sequence_num`, `src/reflow/internal/__init__.py:20-25`)
  * @param role     user | assistant | tool | system
  * @param text     turn content; per-turn text equality vs the reference
  *                 oracle is the row invariant
  * @param tool     tool name for role='tool' turns, else ""
  * @param ts       event time; the watermark column
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

object Turn {
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)
  ))
}

/** A turn classified by a stateless handler (the reference's
  * `categorize_temp`, `examples/temp_monitor_flow.py:94-103`, re-expressed
  * over transcript turns). */
case class LabeledTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    temp: Double,
    status: String)

/** Output of the user-turn x tool-turn stream-stream join. */
case class ToolPair(
    conv_id: String,
    user_turn_idx: Int,
    tool_turn_idx: Int,
    tool: String,
    user_ts: Timestamp,
    tool_ts: Timestamp,
    lag_sec: Long)
