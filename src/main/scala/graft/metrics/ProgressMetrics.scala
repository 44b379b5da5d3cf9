package graft.metrics

import org.apache.spark.sql.streaming.StreamingQuery

/** StreamingQueryProgress -> throughput / latency summary (the metrics leg
  * of the north rule: per-partition lineage lives in each progress event's
  * sources[].startOffset/endOffset; we summarize rates + trigger p99). */
object ProgressMetrics {

  final case class Summary(
      nTriggers: Int,
      inputRows: Long,
      outputRows: Long,
      wallSec: Double,
      turnsPerSec: Double,
      /** input rows / sum(triggerExecution) over BULK triggers (those
        * carrying >= 5% of the largest trigger's rows): the steady
        * ingest regime, excluding startup warmup and the final
        * drain/eviction sweeps (both still included in wallSec) */
      steadyTurnsPerSec: Double,
      p50TriggerMs: Double,
      p99TriggerMs: Double)

  def percentile(xs: Seq[Double], p: Double): Double =
    if (xs.isEmpty) Double.NaN
    else {
      val s = xs.sorted
      s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
    }

  def summarize(q: StreamingQuery, wallSec: Double): Summary = {
    val ps = q.recentProgress.toSeq
    val trig = ps.map(_.durationMs.getOrDefault("triggerExecution", 0L).toDouble)
      .filter(_ > 0)
    val in = ps.map(_.numInputRows).sum
    val out = ps.map(p => Option(p.sink).map(_.numOutputRows).getOrElse(0L))
      .filter(_ > 0).sum
    val maxIn = if (ps.isEmpty) 0L else ps.map(_.numInputRows).max
    val dataBatches = ps.filter(_.numInputRows >= 0.05 * maxIn && maxIn > 0)
    val dataSec = dataBatches
      .map(_.durationMs.getOrDefault("triggerExecution", 0L).longValue()).sum / 1000.0
    Summary(ps.length, in, out, wallSec,
      if (wallSec > 0) in / wallSec else 0.0,
      if (dataSec > 0) dataBatches.map(_.numInputRows).sum / dataSec else 0.0,
      percentile(trig, 0.50), percentile(trig, 0.99))
  }
}
