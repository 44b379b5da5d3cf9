package graft.join

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{ToolPair, Turn}

/** Fan-in operators. The reference HAS no join — `FlowStage` trees are
  * fan-out only (`/root/reference/src/reflow/__init__.py:43,105-106`);
  * correlating two event kinds requires keying both through one stateful
  * transformer. The north rule makes the stateful stream-stream join a
  * native operator of this engine instead.
  */
object StreamJoins {

  /** Stream-stream (or batch) equi-join of user turns vs tool-call turns on
    * `conv_id` with an event-time range: a tool turn matches a user turn
    * when it fires within [user.ts, user.ts + within].
    *
    * Streaming: both sides carry watermarks and the range condition bounds
    * state retention on both sides (Spark evicts join state once the
    * watermark passes the range) — without the time bound the join state
    * would grow forever at 10^12-turn scale.
    *
    * Batch: the same plan is a plain equi-join on conv_id + range filter;
    * Catalyst executes it as SMJ with the range as a post-join predicate,
    * and conv_id bucketing of the table keeps the shuffle narrow.
    */
  def userToolPairs(turns: Dataset[Turn], within: String = "5 minutes",
                    watermark: Option[String] = None): Dataset[ToolPair] = {
    import turns.sparkSession.implicits._
    def side(role: String, prefix: String) = {
      val f = turns.filter(col("role") === role)
      val w = watermark.fold(f)(d => f.withWatermark("ts", d))
      w.select(
        col("conv_id").as(s"${prefix}_conv_id"),
        col("turn_idx").as(s"${prefix}_turn_idx"),
        col("tool").as(s"${prefix}_tool"),
        col("ts").as(s"${prefix}_ts"))
    }
    val users = side("user", "u")
    val tools = side("tool", "t")
    users.join(tools,
        col("u_conv_id") === col("t_conv_id") &&
        col("t_ts") >= col("u_ts") &&
        col("t_ts") <= col("u_ts") + expr(s"INTERVAL $within"))
      .select(
        col("u_conv_id").as("conv_id"),
        col("u_turn_idx").as("user_turn_idx"),
        col("t_turn_idx").as("tool_turn_idx"),
        col("t_tool").as("tool"),
        col("u_ts").as("user_ts"),
        col("t_ts").as("tool_ts"),
        ((unix_timestamp(col("t_ts")) - unix_timestamp(col("u_ts")))).as("lag_sec"))
      .as[ToolPair]
  }

  /** Stream-static enrichment join: attach a static dimension (e.g. a tool
    * registry) to a live stream. The static side is broadcast — each
    * micro-batch joins against executor-local state, NO stream-side shuffle
    * and no streaming state at all (unlike stream-stream joins), which is
    * why enrichment against reference data is free at any stream rate.
    * Works identically on a batch Dataset (same plan, same broadcast). */
  def enrichWithStatic(turns: Dataset[Turn], dim: DataFrame,
                       dimKey: String = "tool"): DataFrame =
    turns.toDF().join(broadcast(dim), Seq(dimKey), "left")

  /** AS-OF join (batch): attach to every tool turn the LATEST user turn at
    * or before it in the same conversation.
    *
    * Not built into Spark; rather than an O(U x T) range join + argmax, we
    * use the union-and-carry-forward pattern: tag both sides, union, and a
    * single per-conversation ordered window carries the last user turn
    * forward — ONE shuffle + sort per conversation, linear in rows, which
    * is the plan that survives 100x scale-up (an equivalent SQL windowed
    * formulation exists for the DuckDB oracle).
    */
  def asOfUserForTool(turns: Dataset[Turn]): DataFrame = {
    val tagged = turns.toDF()
      .filter(col("role").isin("user", "tool"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"), col("ts"),
        when(col("role") === "user", col("turn_idx")).as("u_idx"),
        when(col("role") === "user", col("ts")).as("u_ts"))
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_user_idx", last(col("u_idx"), ignoreNulls = true).over(w))
      .withColumn("asof_user_ts", last(col("u_ts"), ignoreNulls = true).over(w))
      .filter(col("role") === "tool" && col("asof_user_idx").isNotNull)
      .select(col("conv_id"), col("turn_idx").as("tool_turn_idx"), col("tool"),
        col("asof_user_idx").cast("int").as("user_turn_idx"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("asof_user_ts"))).as("lag_sec"))
  }
}
