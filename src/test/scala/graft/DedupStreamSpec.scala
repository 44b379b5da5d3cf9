package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.Turn
import graft.operators.StreamingDedup

/** Streaming exact-dedup semantics: redelivered events are invisible
  * downstream (reference delivery contract §2.3-2). */
class DedupStreamSpec extends SparkSpec {

  private def ts(min: Long): Timestamp = new Timestamp((min + 60) * 60000L)
  private def t(c: String, i: Int, min: Long): Turn =
    Turn(c, i, "user", s"u$i", "", ts(min))

  test("duplicates within the watermark horizon are dropped across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Turn]
    val q = StreamingDedup.withEventTimeBound(ms.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    try {
      ms.addData(t("d1", 0, 0), t("d1", 1, 5), t("d1", 0, 0)) // dup in-batch
      q.processAllAvailable()
      ms.addData(t("d1", 1, 5), t("d1", 2, 10)) // redelivery across batches
      q.processAllAvailable()
      val got = spark.table("dedup").as[Turn].collect()
      assert(got.map(_.turn_idx).sorted.toSeq == Seq(0, 1, 2))
    } finally q.stop()
  }

  test("batch exact dedup keeps one row per (conv_id, turn_idx)") {
    import spark.implicits._
    val in = Seq(t("d2", 0, 0), t("d2", 0, 0), t("d2", 1, 5)).toDS()
    assert(StreamingDedup.exact(in).count() == 2)
  }

  test("automaton: a within-batch duplicate fires onTurn exactly once") {
    // Regression: two copies of one turn_idx in the SAME micro-batch — the
    // first is processed (contiguous), a naive walk buffers the second and
    // re-processes it when the watermark later releases the buffer.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    object Echo extends graft.state.TurnAutomaton[Int, (String, Int)] {
      def initial: Int = 0
      def onTurn(s: Int, turn: Turn): (Int, Seq[(String, Int)]) =
        (s + 1, Seq((turn.conv_id, turn.turn_idx)))
    }
    val ms = MemoryStream[Turn]
    val q = graft.state.AutomatonRunner
      .runStreaming(ms.toDS(), Echo, watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("dupwalk").outputMode("append").start()
    try {
      ms.addData(t("a", 0, 0), t("a", 1, 5), t("a", 1, 5)) // dup idx 1 in-batch
      q.processAllAvailable()
      // push the watermark far past idx 1 so any buffered copy is released
      ms.addData(t("a", 2, 120))
      q.processAllAvailable()
      val got = spark.table("dupwalk").as[(String, Int)].collect().toSeq
      assert(got.sorted == Seq(("a", 0), ("a", 1), ("a", 2)), s"got $got")
    } finally q.stop()
  }
}
