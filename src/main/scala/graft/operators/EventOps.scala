package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CEP operators in batch form over a generic keyed event stream
  * (`events(event_id, ts, user_id, event_type, value, props)`). These are
  * the relational duals of the streaming operators in `graft.state` /
  * `graft.windows` / `graft.join` — same semantics, expressed in pure
  * Catalyst so the DuckDB oracle can replay them. The streaming forms are
  * exercised by the ScalaTest suites; these batch forms are the
  * driver-verified ones.
  *
  * Scale notes: every operator here is one shuffle (hash by key or window
  * group) + map-side partial aggregation; window-function operators sort
  * within partitions only. Nothing collects to the driver.
  */
object EventOps {

  private def byUserTime = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** Tumbling event-time window (width seconds), per event_type. */
  def tumbling(events: DataFrame, widthSec: Int = 600): DataFrame =
    events
      .groupBy(window(col("ts"), s"$widthSec seconds")("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))

  /** Sliding event-time window (width/slide seconds), per event_type. */
  def sliding(events: DataFrame, widthSec: Int = 600, slideSec: Int = 300): DataFrame =
    events
      .groupBy(window(col("ts"), s"$widthSec seconds", s"$slideSec seconds")("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Session windows per user (gap seconds): start = first event, end =
    * last event + gap — Spark `session_window` semantics. */
  def session(events: DataFrame, gapSec: Int = 1800): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapSec seconds").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw")("start").as("session_start"),
        col("sw")("end").as("session_end"), col("n_events"))

  /** Threshold classification (the reference's `categorize_temp`,
    * `/root/reference/examples/temp_monitor_flow.py:94-103`, over `value`). */
  def classify(value: Column): Column =
    when(value < 50.0, "LOW").when(value > 150.0, "HIGH").otherwise("MID")

  /** Change detection (the reference's `ChangeDetector`,
    * `examples/temp_monitor_flow.py:77-92`): emit only rows whose class
    * differs from the previous row's class for the same key; first row of a
    * key always emitted. Relational dual of the keyed automaton: lag(). */
  def changeDetect(events: DataFrame): DataFrame = {
    val st = classify(col("value"))
    events
      .withColumn("status", st)
      .withColumn("prev_status", lag("status", 1).over(byUserTime))
      .filter(col("prev_status").isNull || col("prev_status") =!= col("status"))
      .select(col("user_id"), col("event_id"), col("status"))
  }

  /** AS-OF join: attach to every `rightType` event the latest `leftType`
    * event of the same user at-or-before it. Union + carry-forward window:
    * ONE shuffle+sort, linear — no O(n^2) range join at scale. */
  def asOf(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val t = events.filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") === leftType, col("event_id")).as("l_id"),
        when(col("event_type") === leftType, col("ts")).as("l_ts"))
    t.withColumn("asof_id", last("l_id", ignoreNulls = true).over(
        byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("asof_ts", last("l_ts", ignoreNulls = true).over(
        byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("event_type") === rightType && col("asof_id").isNotNull)
      .select(col("user_id"), col("event_id").as("right_id"),
        col("asof_id").as("left_id"),
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("asof_ts").cast("timestamp"))).as("lag_us"))
  }

  /** Interval/range join: pairs of events of one user within `windowSec`
    * after each anchor event. Equi-join on the key + range predicate —
    * Catalyst plans SMJ on user_id; the time bound keeps streaming state
    * finite in the streaming twin (StreamJoins.userToolPairs). */
  def rangePairs(events: DataFrame, anchorType: String, followType: String,
                 windowSec: Int = 300): DataFrame = {
    val a = events.filter(col("event_type") === anchorType)
      .select(col("user_id"), col("event_id").as("anchor_id"), col("ts").as("a_ts"))
    val f = events.filter(col("event_type") === followType)
      .select(col("user_id").as("f_user_id"), col("event_id").as("follow_id"),
        col("ts").as("f_ts"))
    a.join(f, col("user_id") === col("f_user_id") &&
        col("f_ts") >= col("a_ts") &&
        col("f_ts") <= col("a_ts") + expr(s"INTERVAL $windowSec seconds"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Sequence-pattern count: occurrences of `firstType` immediately followed
    * by `thenType` for the same user in event-time order (a 2-state CEP
    * automaton's relational dual). */
  def patternCount(events: DataFrame, firstType: String, thenType: String): DataFrame =
    events
      .withColumn("prev_type", lag("event_type", 1).over(byUserTime))
      .filter(col("prev_type") === firstType && col("event_type") === thenType)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
}
