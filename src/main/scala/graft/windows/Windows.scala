package graft.windows

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Turn

/** Event-time window stages over transcripts. The reference has NO time
  * axis (SURVEY.md §2.2) — these are the north-rule's required window
  * operators built on Spark's native event-time machinery, keyed by
  * `conv_id` with a watermark on `ts`. All three produce partial+final
  * aggregation automatically (Catalyst HashAggregate pairs), i.e. the
  * map-side combine that keeps the shuffle narrow at 10^12-turn scale.
  */
object Windows {

  /** Tumbling window: per conv_id x fixed bucket turn/tool counts. */
  def tumbling(turns: Dataset[Turn], width: String = "10 minutes",
               watermark: Option[String] = None): DataFrame =
    withWm(turns, watermark)
      .groupBy(window(col("ts"), width).as("win"), col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "tool", 1).otherwise(0)).as("n_tool"),
        min(col("turn_idx")).as("first_idx"),
        max(col("turn_idx")).as("last_idx"))

  /** Sliding window: overlapping buckets (width/slide). */
  def sliding(turns: Dataset[Turn], width: String = "10 minutes",
              slide: String = "5 minutes",
              watermark: Option[String] = None): DataFrame =
    withWm(turns, watermark)
      .groupBy(window(col("ts"), width, slide).as("win"), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))

  /** Session window: activity bursts separated by `gap` of silence. */
  def session(turns: Dataset[Turn], gap: String = "30 minutes",
              watermark: Option[String] = None): DataFrame =
    withWm(turns, watermark)
      .groupBy(session_window(col("ts"), gap).as("win"), col("conv_id"))
      .agg(
        count(lit(1)).as("n_turns"),
        min(col("turn_idx")).as("first_idx"),
        max(col("turn_idx")).as("last_idx"))

  private def withWm(turns: Dataset[Turn], wm: Option[String]): Dataset[Turn] =
    wm.fold(turns)(d => turns.withWatermark("ts", d))
}
